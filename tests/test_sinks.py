"""Sink round-trip tests (K1/K3/K4/K5/K6 batch spellings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark import schemas
from travel_data_pipeline_spark.sources import sinks
from travel_data_pipeline_spark.sources.readers import load_table


def test_event_hub_payload_roundtrip(spark, sf_smoke):
    e = load_table(spark, sf_smoke, "events")
    payload = sinks.event_hub_payload(e)
    parsed = payload.select(
        F.from_json("value", schemas.EVENTS).alias("e")).select("e.*")
    assert parsed.count() == e.count()
    assert parsed.filter(F.col("event_id").isNull()).count() == 0


def test_write_json_roundtrip(spark, sf_smoke, tmp_path):
    r = load_table(spark, sf_smoke, "region")
    out = str(tmp_path / "json-sink")
    sinks.write_json(r, out, timestamp_suffix="20240101", coalesce_to=1)
    back = spark.read.json(out + "-20240101")
    assert back.count() == r.count()


def test_write_csv_roundtrip(spark, sf_smoke, tmp_path):
    n = load_table(spark, sf_smoke, "nation")
    out = str(tmp_path / "csv-sink")
    sinks.write_csv(n, out)
    back = spark.read.csv(out, header=True, inferSchema=True)
    assert back.count() == n.count()
    assert set(back.columns) == set(n.columns)


def test_write_table_partitioned(spark, sf_smoke, tmp_path):
    o = load_table(spark, sf_smoke, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM"))
    spark.sql("DROP TABLE IF EXISTS orders_by_month")
    sinks.write_table(o, "orders_by_month", partition_by=["order_month"],
                      path=str(tmp_path / "tbl"))
    back = spark.table("orders_by_month")
    assert back.count() == o.count()
    # partition pruning visible in the plan
    plan = back.filter(F.col("order_month") == "1997-01") \
               ._jdf.queryExecution().executedPlan().toString()
    assert "order_month" in plan
    spark.sql("DROP TABLE IF EXISTS orders_by_month")


def test_write_bronze_append(spark, sf_smoke, tmp_path):
    e = load_table(spark, sf_smoke, "events")
    out = str(tmp_path / "bronze")
    sinks.write_bronze(e, out)
    sinks.write_bronze(e, out)
    assert spark.read.parquet(out).count() == 2 * e.count()


def test_write_curated_dataset_layout(spark, sf_smoke, tmp_path):
    """Partitioned+sorted curated write: hive dirs per (split, lang),
    one file per partition, rows inside each file sorted by doc_id,
    lossless round trip."""
    import os

    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.queries_curation import (
        split_train_valid_test,
    )
    from travel_data_pipeline_spark.sources.readers import load_table
    from travel_data_pipeline_spark.sources.sinks import write_curated_dataset

    docs = load_table(spark, sf_smoke, "documents")
    split = split_train_valid_test(spark, sf_smoke).select("doc_id", "split")
    curated = docs.join(split, "doc_id")
    out = str(tmp_path / "curated")
    write_curated_dataset(curated, out)

    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=valid", "split=test"}
    back = spark.read.parquet(out)
    assert back.count() == curated.count()
    # one data file per (split, lang) leaf
    for split_dir in dirs:
        for lang_dir in os.listdir(os.path.join(out, split_dir)):
            leaf = os.path.join(out, split_dir, lang_dir)
            files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
            assert len(files) == 1, (leaf, files)
            pdf = spark.read.parquet(leaf).select("doc_id").toPandas()
            ids = pdf["doc_id"].tolist()
            assert ids == sorted(ids)
