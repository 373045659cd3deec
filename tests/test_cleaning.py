"""Invariant tests for queries_cleaning (boilerplate removal +
bigram-LM perplexity). Oracle parity is covered by test_oracle.py's
registry parametrization; these check the semantics themselves."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_cleaning import (
    DF_DROP,
    bigram_lm_perplexity,
    boilerplate_line_removal,
)


@pytest.fixture(scope="module")
def cleaned(spark, sf_smoke):
    return boilerplate_line_removal(spark, sf_smoke).cache()


def test_boilerplate_accounting(cleaned):
    """clean_text token count equals the reported n_tokens_clean, and
    dropped + kept lines account for every line."""
    bad = cleaned.filter(
        F.size(F.when(F.col("clean_text") == "", F.array())
               .otherwise(F.split("clean_text", " ")))
        != F.col("n_tokens_clean")).count()
    assert bad == 0
    assert cleaned.filter(F.col("n_dropped") > F.col("n_lines")).count() == 0


def test_boilerplate_drops_only_frequent_lines(spark, sf_smoke, cleaned):
    """Every surviving line must have df < DF_DROP: re-chunk the
    cleaned text and check no kept 3-token line is corpus-frequent.

    Chunk alignment is preserved for fully-kept docs, so restrict the
    check to docs with n_dropped == 0 (alignment shifts after drops)."""
    intact = cleaned.filter(F.col("n_dropped") == 0)
    words = F.split("clean_text", " ")
    n_chunks = F.ceil(F.size(words) / F.lit(3.0)).cast("int")
    lines = intact.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(words, i * 3 + 1, 3), " "))
        ).alias("line"))
    freq = (lines.groupBy("line")
            .agg(F.countDistinct("doc_id").alias("df")))
    # df among intact docs is a lower bound on corpus df; lines kept in
    # EVERY doc they appear in must be under the threshold corpus-wide
    # only if the full corpus agrees — recompute corpus df directly.
    from travel_data_pipeline_spark.sources.readers import load_table
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    w2 = F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    nc2 = F.ceil(F.size(w2) / F.lit(3.0)).cast("int")
    corpus_lines = docs.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(0), nc2 - 1),
            lambda i: F.array_join(F.slice(w2, i * 3 + 1, 3), " "))
        ).alias("line"))
    corpus_df = (corpus_lines.groupBy("line")
                 .agg(F.countDistinct("doc_id").alias("cdf")))
    offenders = (freq.join(corpus_df, "line")
                 .filter(F.col("cdf") >= DF_DROP).count())
    assert offenders == 0


def test_perplexity_bounds(spark, sf_smoke):
    """Perplexity under add-one bigram smoothing is > 1 and bounded by
    ctx_max + V (the worst case for an unseen bigram)."""
    ppl = bigram_lm_perplexity(spark, sf_smoke)
    rows = ppl.agg(F.min("ppl"), F.max("ppl"), F.count("*")).first()
    assert rows[2] > 0
    assert rows[0] > 1.0
    # V + max context count is a hard ceiling on 1/p for any bigram
    from travel_data_pipeline_spark.sources.readers import load_table
    docs = load_table(spark, sf_smoke, "documents")
    words = F.split(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
    v = docs.select(F.explode(words).alias("w")).agg(
        F.countDistinct("w")).first()[0]
    max_ctx = (docs.select(F.explode(words).alias("w"))
               .groupBy("w").count().agg(F.max("count")).first()[0])
    assert rows[1] <= max_ctx + v


def test_perplexity_repeated_text_is_lower(spark):
    """A degenerate repeated-token doc must score (much) lower than a
    shuffled-vocabulary doc under the same corpus model — the signal
    CCNet buckets on."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta"[: 40 + (i % 7)])
         for i in range(20)]
        + [(100, "spam " * 30), (101, "alpha beta gamma delta " * 8)],
        "doc_id long, text string")
    import tempfile
    import os
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r["ppl"]
               for r in bigram_lm_perplexity(None or docs.sparkSession, d)
               .collect()}
    assert out[100] < out[101] < max(out[i] for i in range(20))
    assert not math.isnan(out[100])
