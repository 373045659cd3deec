"""Bucketing — the co-located-join scale pattern (pyspark_guide.md
Partitioning): writing both join sides bucketed by the join key lets
later joins run with ZERO exchange on the bucketed sides. At 100 TB
this converts the nightly fact-fact join from a full shuffle into a
local zip of sorted buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from travel_data_pipeline_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def restore_confs(spark):
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.sources.bucketing.autoBucketedScan.enabled"]
    saved = {k: spark.conf.get(k) for k in keys}
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, tmp_path, restore_confs):
    li = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(tmp_path / "li")).saveAsTable("li_bucketed"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(tmp_path / "o")).saveAsTable("o_bucketed"))

    # force the shuffle-wanting join shape (at toy SF the dim would
    # broadcast, which hides the property under test)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    lb = spark.table("li_bucketed")
    ob = spark.table("o_bucketed")
    joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"]) \
               .select("l_orderkey", "o_totalprice", "l_extendedprice")
    plan = _plan(joined)
    shuffles = sum(1 for line in plan.splitlines() if "- Exchange (" in line)
    assert shuffles == 0, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    assert "SortMergeJoin" in plan

    expect = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    assert joined.count() == expect
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucket_pruning_on_key_filter(spark, sf_smoke, tmp_path, restore_confs):
    li = load_table(spark, sf_smoke, "lineitem")
    spark.sql("DROP TABLE IF EXISTS li_bucketed2")
    (li.write.bucketBy(8, "l_orderkey")
       .option("path", str(tmp_path / "li2")).saveAsTable("li_bucketed2"))
    # autoBucketedScan turns bucketed reading off when "not beneficial";
    # force it on so the point lookup prunes to one bucket
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    lb = spark.table("li_bucketed2")
    plan = _plan(lb.filter(F.col("l_orderkey") == 42))
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    spark.sql("DROP TABLE IF EXISTS li_bucketed2")
