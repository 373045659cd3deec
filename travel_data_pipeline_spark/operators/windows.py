"""Window / ordered operators — SURVEY.md §2.5 (W1-W4) + the ranking
family the reference lacks but the engine exposes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# W2 — top-k per group (_archive/flight_avg_merge.py:67-74: sort by price
# asc + drop_duplicates keep='first' == row_number()==1).
# ---------------------------------------------------------------------------

def topk_per_group(df: DataFrame, part_keys: Sequence[str],
                   order_by: Sequence[Column], k: int = 1,
                   rank_col: str = "rn") -> DataFrame:
    """The canonical Spark top-k-per-group. ``order_by`` must be a total
    order (include tie-break keys) or results are nondeterministic.

    Scale note: one shuffle on part_keys; for k=1 prefer
    ``max_by``/``min_by`` (no sort) when only one payload column is
    needed — this generic form keeps the whole row.
    """
    w = Window.partitionBy(*part_keys).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


# ---------------------------------------------------------------------------
# W1 — trailing observation windows (rolling form).
# google_trends_crawler.py:71-72 — last-15 vs previous-15 rows.
# ---------------------------------------------------------------------------

def rolling_mean(df: DataFrame, part_keys: Sequence[str], ts: str, value: str,
                 n: int, alias: str = "rolling_mean") -> DataFrame:
    w = (Window.partitionBy(*part_keys).orderBy(F.col(ts))
         .rowsBetween(-(n - 1), 0))
    return df.withColumn(alias, F.avg(value).over(w))


# ---------------------------------------------------------------------------
# W4 — unpivot (wide -> long), the engine-side form of the per-keyword
# column loop over the wide pytrends frame (google_trends_crawler.py:77-124).
# ---------------------------------------------------------------------------

def unpivot(df: DataFrame, id_cols: Sequence[str], value_cols: Sequence[str],
            var_name: str = "key", value_name: str = "value") -> DataFrame:
    """Built on DataFrame.unpivot (Spark >= 3.4) — melts to long form."""
    return df.unpivot(list(id_cols), list(value_cols), var_name, value_name)


# ---------------------------------------------------------------------------
# Ranking family (absent in reference; capability matrix §2.5) —
# lead/lag/rank/dense_rank/ntile over explicit windows.
# ---------------------------------------------------------------------------

def with_sequence_stats(df: DataFrame, part_keys: Sequence[str], order_col: str,
                        value: str) -> DataFrame:
    w = Window.partitionBy(*part_keys).orderBy(F.col(order_col))
    return (df
            .withColumn("prev_value", F.lag(value).over(w))
            .withColumn("next_value", F.lead(value).over(w))
            .withColumn("rnk", F.rank().over(
                Window.partitionBy(*part_keys).orderBy(F.col(value).desc()))))


# ---------------------------------------------------------------------------
# Batch sessionization — lag(ts) + cumulative sum on gap > threshold
# (streaming twin: session_window in streaming/jobs.py).
# ---------------------------------------------------------------------------

def sessionize(df: DataFrame, key: str, ts: str,
               gap_minutes: int = 30) -> DataFrame:
    """Assign session ids per key; emits one row per session with start,
    end, and event count. Matches Structured Streaming's
    session_window(start=min(ts), end=max(ts)+gap) semantics."""
    w = Window.partitionBy(key).orderBy(F.col(ts))
    # Exact microsecond integer comparison: cast('long') would floor to whole
    # seconds and disagree with a fractional-precision oracle for true gaps
    # within ~1s of the threshold.
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)
    micros = F.unix_micros(F.col(ts))
    flagged = df.withColumn(
        "_new_session",
        F.when(micros - F.lag(micros).over(w) > gap_us,
               F.lit(1)).otherwise(F.lit(0)))
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (sessions.groupBy(key, "session_seq")
            .agg(F.min(ts).alias("session_start"),
                 (F.max(ts) + F.expr(f"INTERVAL {gap_minutes * 60} SECONDS"))
                  .alias("session_end"),
                 F.count("*").alias("n_events")))
