"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]``; the configs below are the ones that
also matter on a 1000-executor cluster reading 100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast conversion) — SURVEY.md §4's one real scale risk is skewed /
  low-cardinality keys, which AQE's skew handling plus the two-stage
  aggregation pattern in operators/aggregates.py addresses.
- ``spark.sql.session.timeZone=UTC`` — all fixture timestamps are
  timezone-naive UTC (FIXTURES.md "Oracle notes"); pinning the session
  keeps Spark and the DuckDB oracle byte-identical on time values.
- Arrow enabled for the (rare, clearly-marked) Pandas-UDF paths.
- shuffle partitions sized by env; on a real cluster this is set to
  ~2-3x total cores and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "travel-data-pipeline-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local core count (default ``*``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus)
        except ValueError:
            shuffle_partitions = os.cpu_count() or 8

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata writes events.ts as TIMESTAMP(NANOS); Spark has
        # no nanos timestamp — read as long, readers floor to micros
        # (matching DuckDB's nanos->micros truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Settings the driver-supplied session may lack but correctness needs.

    The driver constructs its own SparkSession for ``__spark_entry__``;
    we only force the session timezone (value-hash parity with DuckDB's
    UTC-naive timestamps) and the nanos-as-long parquet flag (events.ts
    is TIMESTAMP(NANOS), unreadable by Spark otherwise), leaving
    everything else to its config.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # older/newer Spark without the legacy knob
    return spark
