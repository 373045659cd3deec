"""Incremental (batch-vs-corpus) dedup: the planted arriving copies
must be caught, and pairs must be strictly cross-side."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_northstar import (
    INC_BOUNDARY,
    PLANT_OFFSET,
    dedup_incremental_lsh,
)


def test_incremental_dedup_catches_planted_and_stays_cross_side(
        spark, sf_smoke):
    out = dedup_incremental_lsh(spark, sf_smoke).cache()
    # every planted copy (exact dup of an existing doc) is found at 1.0
    hits = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    for k in range(3):
        assert hits.get((k, k + PLANT_OFFSET)) == 1.0
    # strictly existing x incoming
    assert out.filter((F.col("doc_a") >= INC_BOUNDARY)
                      | (F.col("doc_b") < INC_BOUNDARY)).count() == 0
