"""Invariant tests for affinity / temporal-join / weighted-sample
queries (oracle parity runs via test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_affinity import (
    MINSUP,
    copurchase_pagerank,
    market_basket_lift,
)
from travel_data_pipeline_spark.queries_curation import weighted_sample_docs
from travel_data_pipeline_spark.queries_timeseries import temporal_tier_join
from travel_data_pipeline_spark.sources.readers import load_table


def test_market_basket_invariants(spark, sf_smoke):
    mb = market_basket_lift(spark, sf_smoke)
    assert mb.filter(F.col("pair_cnt") < MINSUP).count() == 0
    assert mb.filter(F.col("part_a") >= F.col("part_b")).count() == 0
    assert mb.filter(F.col("lift") <= 0).count() == 0
    # pair support can never exceed either item's support
    assert mb.filter((F.col("pair_cnt") > F.col("cnt_a"))
                     | (F.col("pair_cnt") > F.col("cnt_b"))).count() == 0


def test_pagerank_mass_conserved(spark, sf_smoke):
    """With an undirected (hence dangling-free) graph, total PageRank
    mass stays 1 through every power iteration."""
    pr = copurchase_pagerank(spark, sf_smoke)
    total = pr.agg(F.sum("pagerank")).first()[0]
    n = pr.count()
    assert n > 0
    assert abs(total - 1.0) < 1e-3 + n * 5e-7   # round(,6) slack per row
    assert pr.filter(F.col("pagerank") <= 0).count() == 0


def test_temporal_join_is_total(spark, sf_smoke):
    """Every lineitem row falls in exactly one SCD2 validity range of
    its part, so the joined row count equals the fact row count."""
    out = temporal_tier_join(spark, sf_smoke)
    joined = out.agg(F.sum("n_items")).first()[0]
    facts = load_table(spark, sf_smoke, "lineitem").count()
    assert joined == facts


def test_weighted_sample_contract(spark, sf_smoke):
    ws = weighted_sample_docs(spark, sf_smoke)
    per_lang = ws.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per_lang)
    assert ws.filter((F.col("rn") < 1) | (F.col("rn") > 5)).count() == 0
    # rerun-stable: the sample is a pure function of the data
    again = weighted_sample_docs(spark, sf_smoke)
    assert ws.exceptAll(again).count() == 0
    assert again.exceptAll(ws).count() == 0
