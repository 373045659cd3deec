"""Ingest-robustness tests: F3 malformed-row handling via PERMISSIVE
corrupt-record ingest, CSV/JSON-dim typed readers, J8 null audit."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from travel_data_pipeline_spark import schemas
from travel_data_pipeline_spark.operators.joins import broadcast_left, null_audit
from travel_data_pipeline_spark.sources import readers


def test_permissive_json_ingest_flags_corrupt_rows(spark, tmp_path):
    """F3 — the reference skips HTML rows with missing cells and logs
    (exchage_rate_crawler.py:190-197); the engine lands them in
    _corrupt_record instead of silently dropping."""
    p = tmp_path / "raw.jsonl"
    p.write_text("\n".join([
        '{"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7,'
        ' "event_type": "view", "value": 1.5, "props": "{}"}',
        'not json at all',
        '{"event_id": 2, "ts": "2024-01-01T01:00:00", "user_id": 8,'
        ' "event_type": "click", "value": 2.0, "props": "{}"}',
    ]))
    # Spark disallows querying only the corrupt-record column of a raw
    # scan — cache first (documented in read_json_events)
    df = readers.read_json_events(spark, str(p), schemas.EVENTS).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert bad.first()._corrupt_record == "not json at all"


def test_csv_reader_with_schema(spark, tmp_path):
    p = tmp_path / "dim.csv"
    p.write_text("code,name\nUSA,United States\nJPN,Japan\n")
    schema = T.StructType([
        T.StructField("code", T.StringType()),
        T.StructField("name", T.StringType()),
    ])
    df = readers.read_csv(spark, str(p), schema)
    assert df.count() == 2
    assert df.schema == schema


def test_json_dim_reader_multiline(spark, tmp_path):
    p = tmp_path / "master.json"
    p.write_text("""[
      {"country_code_3": "USA", "country_code_2": "US",
       "country_name_eng": "United States", "country_name_kor": "미국",
       "currency_code": "USD", "is_euro_zone": false,
       "google_trend_keyword_kor": "미국 여행"},
      {"country_code_3": "DEU", "country_code_2": "DE",
       "country_name_eng": "Germany", "country_name_kor": "독일",
       "currency_code": "EUR", "is_euro_zone": true,
       "google_trend_keyword_kor": null}
    ]""")
    df = readers.read_json_dim(spark, str(p), schemas.COUNTRY_MASTER)
    rows = {r.country_code_3: r for r in df.collect()}
    assert rows["DEU"].is_euro_zone is True
    assert rows["DEU"].google_trend_keyword_kor is None


def test_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across landed batches: a later batch adds a
    column; mergeSchema unifies, old rows read NULL. At 100 TB, raw
    layers accrete columns over months — this is the contract that
    keeps old partitions readable."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string") \
         .write.mode("append").parquet(p)
    spark.createDataFrame([(2, "b", 9.5)],
                          "id long, name string, score double") \
         .write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
    assert set(merged.columns) == {"id", "name", "score"}


def test_null_audit_surfaces_uncovered_rows(spark, sf_smoke):
    """J8 — rows the dimension fails to cover stay queryable instead of
    being silently inner-joined away."""
    e = readers.load_table(spark, sf_smoke, "events")
    # a deliberately partial dim: only even custkeys
    c = (readers.load_table(spark, sf_smoke, "customer")
         .filter(F.col("c_custkey") % 2 == 0)
         .select(F.col("c_custkey").alias("user_id"), "c_name"))
    joined = broadcast_left(e, c, "user_id", "left")
    audit = null_audit(joined, "c_name")
    covered = joined.filter(F.col("c_name").isNotNull())
    assert audit.count() + covered.count() == e.count()
    assert audit.count() > 0
    # every audited row has an odd (uncovered) user_id
    assert audit.filter(F.col("user_id") % 2 == 0).count() == 0
