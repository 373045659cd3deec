"""Aggregation operators — SURVEY.md §2.4 (A1-A6) + scale patterns.

Oracle-parity note (used across the engine): double-precision sums are
order-dependent, and Spark's partial aggregation order differs from
DuckDB's. Money-like columns therefore aggregate through
``DECIMAL(18,2)`` — exact, associative, order-independent — and cast
back to double at the end. ``dec_sum``/``dec_avg`` encapsulate this;
the matching DuckDB SQL spelling is in their docstrings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dec_sum(c: Column | str, alias: str) -> Column:
    """Order-independent SUM of a 2-dp money column.

    DuckDB oracle: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast("decimal(18,2)")).cast("double").alias(alias)


def dec_avg(c: Column | str, alias: str) -> Column:
    """Order-independent AVG of a 2-dp money column.

    DuckDB oracle:
    ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(col.cast("decimal(18,2)")).cast("double")
            / F.count(col)).alias(alias)


# ---------------------------------------------------------------------------
# A1 — windowed means: recent-N vs prior-N over an ordered series
# google_trends_crawler.py:71-72, 83-92 (iloc[-15:] / iloc[-30:-15]).
# ---------------------------------------------------------------------------

def recent_vs_prior_mean(df: DataFrame, keys: Sequence[str], ts: str, value: str,
                         recent_days: int = 15, prior_days: int = 15) -> DataFrame:
    """Conditional aggregation over time bounds derived from max(ts).

    One shuffle (groupBy keys); the window bounds come from a global
    max(ts) broadcast as a scalar subquery-style cross join — at 100 TB
    this is one extra reduce, not a per-row window sort.
    """
    bounds = df.agg(F.max(ts).alias("_max_ts")).select(
        "_max_ts",
        F.date_sub(F.col("_max_ts"), recent_days).alias("_recent_lo"),
        F.date_sub(F.col("_max_ts"), recent_days + prior_days).alias("_prior_lo"),
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    v, t = F.col(value), F.col(ts)
    return (with_bounds.groupBy(*keys).agg(
        F.avg(F.when(t > F.col("_recent_lo"), v)).alias("recent_mean"),
        F.avg(F.when((t > F.col("_prior_lo")) & (t <= F.col("_recent_lo")), v))
         .alias("prior_mean"),
    ))


# ---------------------------------------------------------------------------
# A2 — last value per key ("current interest", google_trends_crawler.py:94).
# ---------------------------------------------------------------------------

def last_value_per_key(df: DataFrame, keys: Sequence[str], ts: str,
                       value: str, alias: str = "last_value") -> DataFrame:
    """max_by(value, ts): a single hash aggregate — no window sort."""
    return df.groupBy(*keys).agg(F.max_by(value, ts).alias(alias))


# ---------------------------------------------------------------------------
# A3/A4 — grouped mean / min / max (_archive/flight_avg_merge.py:30-55).
# ---------------------------------------------------------------------------

def grouped_stats(df: DataFrame, keys: Sequence[str], value: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        dec_avg(value, "avg_price"),
        F.min(value).alias("min_price"),
        F.max(value).alias("max_price"),
        F.count(value).alias("n"),
    )


# ---------------------------------------------------------------------------
# A5 — accumulate-by-key pivot-merge (exchage_rate_crawler.py:386-426):
# fold rate passes into one wide record per key, incl. the monthly map.
# ---------------------------------------------------------------------------

def pivot_rates(rates: DataFrame, key: str = "currency_code",
                rate_col: str = "standard_rate",
                rate_types: Sequence[str] = ("realtime", "daily_avg", "yearly_avg"),
                ) -> DataFrame:
    """Wide record per currency: one column per scalar rate_type plus a
    MapType 'YYYYMM' -> rate column for the monthly passes (X21).

    groupBy().pivot(values=...) with explicit values — no extra pass to
    discover pivot keys, and partial aggregation stays map-side.
    """
    scalar = (rates.filter(F.col("rate_type").isin(*rate_types))
              .groupBy(key)
              .pivot("rate_type", list(rate_types))
              .agg(F.first(rate_col)))
    monthly = (rates.filter(F.col("rate_type") == "monthly_avg")
               .groupBy(key)
               .agg(F.map_from_entries(
                   F.sort_array(F.collect_list(F.struct(F.col("period"),
                                                        F.col(rate_col)))))
                    .alias("monthly_avg_rates")))
    return scalar.join(monthly, key, "full")


def explode_monthly_map(wide: DataFrame, key: str = "currency_code") -> DataFrame:
    """Long form of the A5 monthly map — the oracle-friendly spelling
    (SURVEY.md §7 hard part (c))."""
    return wide.select(key, F.explode("monthly_avg_rates").alias("period", "rate"))


# ---------------------------------------------------------------------------
# Scale pattern — two-stage aggregation for low-cardinality / skewed keys
# (SURVEY.md §4 physical note 3: 59-739 distinct keys at 100 TB would
# otherwise funnel into 59-739 reducers).
# ---------------------------------------------------------------------------

def salted_sum(df: DataFrame, keys: Sequence[str], value: str,
               alias: str, salt_buckets: int = 64) -> DataFrame:
    """SUM by key via (key, salt) partials then final merge.

    Stage 1 shuffles on (key, salt) — parallelism = |keys| x buckets;
    stage 2 merges |keys| x buckets tiny partials. Decimal accumulation
    keeps the result bit-equal to the unsalted plan.
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = (salted.groupBy(*keys, "_salt")
               .agg(F.sum(F.col(value).cast("decimal(18,2)")).alias("_partial")))
    return (partial.groupBy(*keys)
            .agg(F.sum("_partial").cast("double").alias(alias)))
