"""Property tests for retrieval (BM25/RRF), Z-order keys, and RFM —
the oracle differential in test_oracle.py covers value parity; these
check the operator-level contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_search import bm25_scores
from travel_data_pipeline_spark.queries_stats import (
    rfm_customer_segments,
    zorder_interleaved_key,
)
from travel_data_pipeline_spark.operators.text import token_array
from travel_data_pipeline_spark.sources.readers import load_table


def test_bm25_scores_only_matching_docs(spark, sf_smoke):
    """Every scored doc contains >= 1 query term; every doc containing
    the rare term 'dup' is scored; scores are positive."""
    docs = load_table(spark, sf_smoke, "documents")
    scored = bm25_scores(spark, sf_smoke)
    has_dup = (docs.select("doc_id",
                           F.array_contains(token_array(F.col("text")),
                                            "dup").alias("h"))
               .filter("h"))
    n_dup = has_dup.count()
    assert n_dup > 0
    joined = has_dup.join(scored, "doc_id")
    assert joined.count() == n_dup
    assert scored.filter(F.col("bm25") <= 0).count() == 0
    assert scored.filter(F.col("n_terms") < 1).count() == 0


def test_bm25_rare_term_outscores_common(spark, sf_smoke):
    """A doc matching the rare discriminative term ('dup', df~5%)
    should outrank the median doc that matches only ubiquitous terms
    — the core BM25 idf property."""
    docs = load_table(spark, sf_smoke, "documents")
    scored = bm25_scores(spark, sf_smoke)
    dup_ids = (docs.filter(F.array_contains(token_array(F.col("text")),
                                            "dup"))
               .select("doc_id"))
    dup_mean = (scored.join(dup_ids, "doc_id")
                .agg(F.avg("bm25")).first()[0])
    rest_mean = (scored.join(dup_ids, "doc_id", "left_anti")
                 .agg(F.avg("bm25")).first()[0])
    assert dup_mean > rest_mean


def test_zorder_key_is_invertible(spark, sf_smoke):
    """De-interleaving the Morton key recovers (xk, yk) exactly."""
    rows = zorder_interleaved_key(spark, sf_smoke).limit(200).collect()
    assert rows
    for r in rows:
        x = y = 0
        for b in range(16):
            x |= ((r.zkey >> (2 * b)) & 1) << b
            y |= ((r.zkey >> (2 * b + 1)) & 1) << b
        assert (x, y) == (r.xk, r.yk), r


def test_rfm_scores_bounded_and_complete(spark, sf_smoke):
    """Every customer with an order appears once; all scores in 1..5;
    each quintile of the monetary dimension is non-empty."""
    o = load_table(spark, sf_smoke, "orders")
    rfm = rfm_customer_segments(spark, sf_smoke)
    assert rfm.count() == o.select("o_custkey").distinct().count()
    bad = rfm.filter(~F.col("r_score").between(1, 5)
                     | ~F.col("f_score").between(1, 5)
                     | ~F.col("m_score").between(1, 5)).count()
    assert bad == 0
    m_scores = {r.m_score for r in rfm.select("m_score").distinct().collect()}
    assert m_scores == {1, 2, 3, 4, 5}


def test_ivf_topk_assignments_seam_identical(spark, sf_smoke):
    """ivf_topk(assignments=prebuilt) must return EXACTLY the rows of
    the internal-build path (the dedup pairs= seam contract)."""
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.operators import similarity as S
    from travel_data_pipeline_spark.sources.readers import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    cents = (emb.filter(F.col("vec_id") % 17 == 0)
             .select(F.col("vec_id").alias("centroid_id"), "embedding")
             .limit(8).localCheckpoint(eager=True))
    queries = (emb.limit(5)
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .localCheckpoint(eager=True))
    own = S.ivf_topk(emb, cents, queries, k=5, n_probe=2).collect()
    pre = S.assign_clusters(emb, cents).localCheckpoint(eager=True)
    injected = S.ivf_topk(emb, cents, queries, k=5, n_probe=2,
                          assignments=pre).collect()
    assert sorted(map(tuple, own)) == sorted(map(tuple, injected))
    assert len(own) > 0
