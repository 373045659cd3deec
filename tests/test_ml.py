"""Unit tests for operators/ml.py and queries_ml.py beyond the
oracle differential (which tests/test_oracle.py already runs for
every registered query)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from travel_data_pipeline_spark.operators import ml
from travel_data_pipeline_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", ml.as_double_vec(F.col("embedding")).alias("v"))


def test_kmeans_partitions_all_points(spark, emb):
    n = emb.count()
    assigned = ml.kmeans(emb, k=8, iterations=3)
    rows = assigned.select("vec_id", "cid").collect()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n  # exactly one cluster per point
    assert {r.cid for r in rows} <= set(range(8))


def test_kmeans_objective_decreases(spark, emb):
    """More Lloyd iterations never increase the within-cluster SSE."""
    def sse(iters: int) -> float:
        a = ml.kmeans(emb, k=8, iterations=iters)
        return a.agg(F.sum(F.col("d") * F.col("d"))).first()[0]

    s1, s3 = sse(1), sse(3)
    assert s3 <= s1 + 1e-6


def test_kmeans_assignment_is_nearest_centroid(spark, emb):
    """Every point's recorded dist equals the true min distance to the
    final centroid set (argmin correctness, not just convergence)."""
    cent = ml.kmeans_init(emb, 8)
    for _ in range(2):
        assigned = ml.kmeans_assign(emb, cent)
        cent = ml.kmeans_update(assigned)
    final = ml.kmeans_assign(emb, cent)
    centroids = {r.cid: r.cv for r in cent.collect()}
    for row in final.limit(50).collect():
        dists = {cid: math.sqrt(sum((x - y) ** 2 for x, y in zip(row.v, cv)))
                 for cid, cv in centroids.items()}
        best = min(dists.values())
        assert abs(row.d - best) < 1e-9


def test_quantize_roundtrip_error_bound(spark, emb):
    """Symmetric int8: no clipping by construction (scale = max|x|/127)
    and per-element reconstruction error <= scale/2."""
    scale, q, n_clipped, err = ml.quantize_int8(F.col("v"))
    out = emb.select(scale.alias("s"), n_clipped.alias("c"), err.alias("e"))
    bad = out.filter((F.col("c") != 0) | (F.col("e") > F.col("s") / 2)).count()
    assert bad == 0


def test_chunks_cover_every_token(spark, sf_smoke):
    """Chunk windows (40/stride 30) must cover all n tokens: the last
    start position is within 40 of the end, and consecutive starts
    overlap by 10."""
    from travel_data_pipeline_spark.queries_ml import doc_chunks_overlap

    chunks = doc_chunks_overlap(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents")
    from travel_data_pipeline_spark.operators.text import token_array

    n_tok = docs.select("doc_id", F.size(token_array(F.col("text"))).alias("n"))
    per_doc = (chunks.groupBy("doc_id")
               .agg(F.max("chunk_idx").alias("last_idx"),
                    F.sum("n_chunk_tokens").alias("sum_tokens"))
               .join(n_tok, "doc_id"))
    # last chunk starts at last_idx*30 + 1 and must reach the end: n <= start+39
    uncovered = per_doc.filter(
        F.col("n") > F.col("last_idx") * 30 + 40).count()
    assert uncovered == 0
    # total chunk tokens >= n (overlap duplicates some)
    short = per_doc.filter(F.col("sum_tokens") < F.col("n")).count()
    assert short == 0


def test_pca_matches_numpy(spark, sf_smoke):
    """Grouped applyInPandas PCA must equal numpy run directly on the
    same per-label vectors."""
    import numpy as np

    from travel_data_pipeline_spark.queries_ml import pca_embeddings_by_label

    out = {r.label: r for r in
           pca_embeddings_by_label(spark, sf_smoke).collect()}
    emb = load_table(spark, sf_smoke, "embeddings").select(
        "label", ml.as_double_vec(F.col("embedding")).alias("v")).collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(r.v)
    assert set(out) == set(by_label)
    for label, vecs in by_label.items():
        x = np.vstack(vecs)
        vals, vecs_m = np.linalg.eigh(np.cov(x, rowvar=False, bias=False))
        assert out[label].n_vecs == len(vecs)
        assert abs(out[label].top_eigenvalue - round(vals[-1], 6)) < 1e-6
        assert abs(out[label].explained_ratio
                   - round(vals[-1] / vals.sum(), 6)) < 1e-6
