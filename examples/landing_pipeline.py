"""End-to-end demo starting at the reference's entry points: land the
raw layer (S1–S3, offline), bronze-passthrough it, then run the same
score plans the registered queries pin — no network, no fixtures in
the engine path.

    land (JSONL)  ->  bronze (parquet, K6)  ->  silver/gold (scores)

Run: python examples/landing_pipeline.py [work_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(work_dir: str = "/tmp/tdp-landing") -> None:
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark import fixtures as FX
    from travel_data_pipeline_spark.plans.exchange import (
        exchange_scores_from,
        monthly_map_from,
    )
    from travel_data_pipeline_spark.plans.trends import trend_scores_from
    from travel_data_pipeline_spark.queries_dims import (
        load_alias_dim,
        load_master_dim,
    )
    from travel_data_pipeline_spark.queries_domain import flatten_flights
    from travel_data_pipeline_spark.session import get_spark
    from travel_data_pipeline_spark.sources import landing

    raw = os.path.join(work_dir, "raw")
    bronze = os.path.join(work_dir, "bronze")
    gold = os.path.join(work_dir, "gold")

    # 1. land the raw layer (the crawlers' output shape, offline)
    cells_p = landing.land_exchange_cells(os.path.join(raw, "exchange_cells.jsonl"))
    trends_p = landing.land_trends_rows(os.path.join(raw, "trends_rows.jsonl"))
    flights_p = landing.land_flight_offers(os.path.join(raw, "flight_offers.jsonl"))
    print("landed:", *(os.path.basename(p) for p in (cells_p, trends_p, flights_p)))

    spark = get_spark("landing-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # 2. bronze: schema'd scan of raw -> parquet passthrough (K6)
    bronzed = {}
    for name, df in {
        "exchange_cells": landing.read_exchange_cells_raw(spark, cells_p),
        "trends_rows": landing.read_trends_raw(spark, trends_p),
        "flight_offers": landing.read_flight_offers_raw(spark, flights_p),
    }.items():
        path = os.path.join(bronze, name)
        df.write.mode("overwrite").parquet(path)
        bronzed[name] = spark.read.parquet(path)
        print(f"bronze/{name}: {bronzed[name].count()} rows")

    # 3. gold: the SAME plan cores the oracle-paired queries use, fed
    # from bronze + the real 59/739-row reference dims
    master = load_master_dim(spark).withColumnRenamed("country_key", "_k")
    alias_dim = load_alias_dim(spark)
    outputs = {
        "exchange_scores": exchange_scores_from(
            bronzed["exchange_cells"],
            master.select("country_code_3", "country_code_2",
                          "country_name_eng", "country_name_kor",
                          "currency_code", "is_euro_zone")),
        "exchange_monthly": monthly_map_from(
            bronzed["exchange_cells"],
            master.select("country_code_3", "currency_code")),
        "trend_scores": trend_scores_from(
            bronzed["trends_rows"],
            alias_dim.select("alias", "korean_name", "english_name",
                             "country_code_3", "country_code_2")),
        "flight_segments": flatten_flights(bronzed["flight_offers"]),
    }
    for name, df in outputs.items():
        path = os.path.join(gold, name)
        df.write.mode("overwrite").parquet(path)
        print(f"gold/{name}: {spark.read.parquet(path).count()} rows -> {path}")

    print("\nexchange sample (EUR fan-out through the real master):")
    (outputs["exchange_scores"].filter(F.col("currency_code") == "EUR")
     .select("country_code_3", "currency_code", "exchange_rate_score")
     .orderBy("country_code_3").show(20, truncate=False))


if __name__ == "__main__":
    main(*sys.argv[1:])
