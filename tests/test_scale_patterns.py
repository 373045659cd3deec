"""Scale-pattern demonstrations: AQE skew-join splitting and the
Python UDTF surface (SURVEY.md §2.9's row-expanding shape).

These pin behaviors that only matter at cluster scale but must be
provably wired locally: a skewed join partition gets split by AQE, and
the sanctioned UDF surfaces work end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def restore_confs(spark):
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"]
    saved = {k: spark.conf.get(k) for k in keys}
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, restore_confs):
    """One hot key holding ~90% of rows: AQE's skew-join must split the
    oversized partition (final adaptive plan carries the skew marker).
    This is the runtime answer to SURVEY.md §4's low-cardinality-key
    risk when salting isn't applied."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id"))
         .alias("key"),
        F.col("id").alias("payload"))
    right = spark.range(1000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("rv"))
    # collect THIS DataFrame (df.count() would spawn a separate
    # execution and leave this one's adaptive plan unfinalized)
    joined = left.join(right, "key").groupBy().count()
    assert joined.collect()[0]["count"] == 180_100
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "SortMergeJoin(skew=true)" in final_plan, final_plan


def test_salted_join_equals_plain_join(spark, restore_confs):
    """Explicit salt-and-replicate join is row-identical to the plain
    join on skewed data, and its plan hash-partitions on (key, salt) —
    each hot key spread over B reducers."""
    from travel_data_pipeline_spark.operators.joins import salted_join

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    left = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(3)).otherwise(F.col("id"))
         .alias("key"),
        F.col("id").alias("payload"))
    right = spark.range(500).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("rv"))

    plain = left.join(right, "key")
    salted = salted_join(left, right, "key", salt_buckets=8)
    assert salted.count() == plain.count()
    p_sum = plain.agg(F.sum("payload"), F.sum("rv")).first()
    s_sum = salted.agg(F.sum("payload"), F.sum("rv")).first()
    assert tuple(p_sum) == tuple(s_sum)

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_skew_routed_join_salts_on_zipf_head(spark, restore_confs):
    """The probe routes a zipf-headed key to the salted arm (plan
    carries _salt), a uniform key to the plain arm, and a sub-minimum
    probe sample refuses to salt; result rows match the plain join on
    every route (the adoption measurement is tools/stress_skew.py)."""
    from travel_data_pipeline_spark.operators.joins import (
        skew_routed_join,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # ~90% of rows on key 3 — far above the 5% head-share threshold
    left = spark.range(500_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(3)).otherwise(F.col("id"))
         .alias("key"),
        F.col("id").alias("payload"))
    right = spark.range(500).select(
        F.col("id").alias("key"), (F.col("id") * 7).alias("rv"))

    route: dict = {}
    routed = skew_routed_join(left, right, "key", salt_buckets=8,
                              route_out=route)
    assert route["route"] == "salted", route
    assert route["head_share_est"] > 0.5
    plain = left.join(right, "key")
    assert routed.count() == plain.count()
    assert (tuple(routed.agg(F.sum("payload"), F.sum("rv")).first())
            == tuple(plain.agg(F.sum("payload"), F.sum("rv")).first()))
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan

    # uniform key -> plain route, no _salt in the plan
    uleft = spark.range(500_000).select(
        (F.col("id") % 500).alias("key"), F.col("id").alias("payload"))
    route = {}
    uplain = skew_routed_join(uleft, right, "key", route_out=route)
    assert route["route"] == "plain", route
    assert route["head_share_est"] < 0.05
    assert "_salt" not in (
        uplain._jdf.queryExecution().executedPlan().toString())

    # tiny input: the 0.1% probe sees < min_probe_rows -> plain even
    # though every sampled row may share one key
    tiny = spark.range(2_000).select(
        F.lit(1).alias("key"), F.col("id").alias("payload"))
    route = {}
    skew_routed_join(tiny, right, "key", route_out=route)
    assert route["route"] == "plain", route


def test_python_udtf_surface(spark):
    """Spark 4 Python UDTF — the row-expanding shape the reference's
    extract_flight_info has (_archive/flight_price_preprocessing.py:3-49).
    The engine solves that one with explode (X20, zero Python); this
    pins that the UDTF escape hatch works when semantics ever demand it.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                if tok:
                    yield i, tok

    rows = Tokenize(lit("big data on spark")).collect()
    assert [(r.pos, r.token) for r in rows] == [
        (0, "big"), (1, "data"), (2, "on"), (3, "spark")]


def test_basket_cap_bounds_pair_expansion(spark):
    """market_basket's pair expansion is quadratic in basket size; the
    MAX_BASKET cap must bound one pathological 1k-item order to
    MAX_BASKET*(MAX_BASKET-1)/2 pairs instead of ~500k, while leaving
    normal (< cap) baskets untouched."""
    from travel_data_pipeline_spark.queries_affinity import (
        MAX_BASKET, _pair_counts)

    pathological = spark.range(1000).select(
        F.lit(1).alias("l_orderkey"), F.col("id").alias("l_partkey"))
    normal = spark.range(5).select(
        (F.col("id") % 3 + 2).alias("l_orderkey"),
        F.col("id").alias("l_partkey"))
    items = pathological.unionAll(normal)

    # support threshold 1 view: count raw pairs before the MINSUP filter
    # by duplicating every basket into two orders (pair_cnt == 2 >= MINSUP)
    twice = items.unionAll(items.withColumn(
        "l_orderkey", F.col("l_orderkey") + 100))
    pairs = _pair_counts(twice.distinct())
    from_pathological = pairs.filter(F.col("part_a") < 1000).count()
    cap_pairs = MAX_BASKET * (MAX_BASKET - 1) // 2
    assert from_pathological <= cap_pairs, (
        f"pathological basket emitted {from_pathological} pairs; "
        f"cap should bound it at {cap_pairs}")
    assert from_pathological == cap_pairs  # cap keeps first 64 by partkey
