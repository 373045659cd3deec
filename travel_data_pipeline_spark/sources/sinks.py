"""Sinks — SURVEY.md §2.1 (K1-K6).

Batch spellings of every sink the reference writes to; the streaming
spellings live in streaming/jobs.py. Delta is not on this container's
classpath, so K5 falls back to parquet saveAsTable semantics behind an
import-try (swap to format('delta') when available).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_hub_payload(df: DataFrame) -> DataFrame:
    """K1 — Event Hub/Kafka-shaped payload: one JSON string per row
    (to_json(struct(*)); exchange_rate_trigger.py:45-52). Feed this to
    ``.write.format('kafka')`` (broker absent here) or a text sink."""
    return df.select(F.to_json(F.struct("*")).alias("value"))


def write_json(df: DataFrame, path: str, timestamp_suffix: str | None = None,
               coalesce_to: int | None = None) -> None:
    """K3 — local JSON dump (timestamped filename overwrite-by-name,
    exchange_rate_trigger.py:57-69). coalesce_to=1 mirrors the
    reference's single-file output; leave None at scale."""
    out = df if coalesce_to is None else df.coalesce(coalesce_to)
    target = f"{path}-{timestamp_suffix}" if timestamp_suffix else path
    out.write.mode("overwrite").json(target)


def write_csv(df: DataFrame, path: str) -> None:
    """K4 — CSV upload to object store (_archive/function_app.py:191-206)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_table(df: DataFrame, name: str, partition_by: list[str] | None = None,
                path: str | None = None) -> None:
    """K5 — Delta + catalog sink (README.md:86-87 [prose-only]).

    Tries Delta first; falls back to parquet saveAsTable. Partition by
    crawl-date/period columns so time predicates prune (SURVEY.md §4
    polish item (d))."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if path:
        writer = writer.option("path", path)
    try:
        writer.format("delta").saveAsTable(name)
    except Exception:
        writer.format("parquet").saveAsTable(name)


def write_bronze(df: DataFrame, path: str) -> None:
    """K6 — raw-layer passthrough landing (medallion bronze): append-only
    parquet, no transform (streaming twin: jobs.bronze_passthrough)."""
    df.write.mode("append").parquet(path)


def write_curated_dataset(df: DataFrame, path: str,
                          partition_cols: tuple[str, ...] = ("split", "lang"),
                          sort_col: str = "doc_id") -> None:
    """Training-data write path: hive-partition by (split, lang) and
    sort rows within each file by ``sort_col`` so parquet zone maps
    (row-group min/max) prune id-range reads.

    The repartition on the partition columns routes each output
    partition to ONE task — one file per (split, lang) instead of
    tasks x partitions small files (the classic small-files failure).
    At 100 TB the same shape holds with repartition(N, cols) for N
    files per partition, or repartitionByRange(sort_col) inside hot
    partitions; sortWithinPartitions is a per-task sort, never a
    global one."""
    (df.repartition(*[F.col(c) for c in partition_cols])
       .sortWithinPartitions(sort_col)
       .write.mode("overwrite")
       .partitionBy(*partition_cols)
       .parquet(path))
