"""Invariant tests for queries_sketches (Bloom prefilter, count-min
sketch, banded interval joins). Oracle parity runs in test_oracle.py;
these check the sketch/banding guarantees directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_sketches import (
    bloom_candidate_stats,
    cms_heavy_hitters,
    interval_overlap_join,
)


def test_bloom_candidates_superset_and_tight(spark, sf_smoke):
    """The Bloom gate must pass every true match (no false negatives)
    and stay close to the true set (bounded false-positive rate)."""
    row = bloom_candidate_stats(spark, sf_smoke).first()
    assert row.candidates >= row.true_rows          # superset
    assert row.candidates <= row.total
    # fp rate among true negatives under 2% at this m/n load factor
    negatives = row.total - row.true_rows
    if negatives:
        fp_rate = (row.candidates - row.true_rows) / negatives
        assert fp_rate < 0.02, fp_rate


def test_cms_one_sided_error(spark, sf_smoke):
    """CMS estimates never undercount, and min-over-rows keeps the
    overcount below the classic e*N/w bound with room to spare."""
    rows = cms_heavy_hitters(spark, sf_smoke).collect()
    assert len(rows) == 20
    n = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").count()
    for r in rows:
        assert r.est_cnt >= r.exact_cnt
        assert r.overcount == r.est_cnt - r.exact_cnt
        assert r.overcount <= 2.72 * n / 256 + 1


def test_interval_banding_equals_theta_join(spark, sf_smoke):
    """The hour-bucket banding must produce exactly the naive theta
    join's pairs (computed here without banding)."""
    from travel_data_pipeline_spark.operators.windows import sessionize
    from travel_data_pipeline_spark.sources.readers import load_table

    out = interval_overlap_join(spark, sf_smoke)
    assert out.filter((F.col("overlap_secs") < 1)
                      | (F.col("overlap_secs") > 3600)).count() == 0

    ev = load_table(spark, sf_smoke, "events")
    sessions = (sessionize(ev.select("user_id", "ts"), "user_id", "ts")
                .select("user_id", "session_seq",
                        F.col("session_start").cast("long").alias("s_start"),
                        F.col("session_end").cast("long").alias("s_end")))
    hourly = (ev.groupBy(F.date_trunc("hour", "ts").cast("long").alias("h"))
              .agg(F.count("*").alias("c")))
    bounds = hourly.agg(F.count("*").alias("n_hours"),
                        F.sum("c").alias("total"))
    busy = (hourly.crossJoin(F.broadcast(bounds))
            .filter(F.col("c") * F.col("n_hours") * 100
                    > F.col("total") * 115).select("h"))
    theta = (sessions.join(busy, (F.col("s_start") < F.col("h") + 3600)
                           & (F.col("s_end") > F.col("h")))
             .select("user_id", "session_seq", F.col("h").alias("hour_epoch")))
    banded = out.select("user_id", "session_seq", "hour_epoch")
    assert banded.exceptAll(theta).count() == 0
    assert theta.exceptAll(banded).count() == 0
