"""Round-16 candidate queries (written in round 11).

- setops_halfwindow_pairs: closes the LAST unexercised capability
  class SURVEY.md §2.6 names (VERDICT r10 #4) — ``intersect`` /
  ``except`` / ``exceptAll`` / ``intersectAll`` over the (user,
  event_type) pairs of the event window's two halves, read out as
  per-type retention/loss/bag-imbalance counts.  The reference never
  needs set ops (its _archive merge is concat-only), so this is a
  capability-matrix closure on the engine side, same as the r09 cube
  ceiling.

Float discipline: all outputs are exact integer counts — no rounding
needed anywhere (registry.py docstring authoritative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Set operations over the half-window split (§2.6 closure).
#
# A = (user_id, event_type) rows from days 0-14, B = days 15+.
# Four legs, one per set-op semantics:
#   retained  = A INTERSECT B      (distinct pairs active in both)
#   lost      = A EXCEPT B         (distinct pairs that churned)
#   common    = A INTERSECT ALL B  (bag: min(count_A, count_B))
#   excess    = A EXCEPT ALL B     (bag: max(count_A - count_B, 0))
# Readout: per-event-type counts of each leg, LEFT-joined onto the
# distinct type list (engine-wide J8 LEFT policy) with 0 defaults.
#
# Scale shape: each set op is a single hash shuffle keyed on the full
# (user, type) row — same key for all four legs, so AQE reuses the
# exchange; the readout aggregations collapse to |event_type| rows.
# No floats anywhere.
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
WITH mind AS (SELECT min(date_trunc('day', ts)) AS d0 FROM events),
pairs AS MATERIALIZED (
    SELECT user_id, event_type,
           date_diff('day', d0, date_trunc('day', ts)) AS dd
    FROM events CROSS JOIN mind
),
a AS MATERIALIZED (SELECT user_id, event_type FROM pairs WHERE dd < 15),
b AS MATERIALIZED (SELECT user_id, event_type FROM pairs WHERE dd >= 15),
retained AS (SELECT * FROM a INTERSECT SELECT * FROM b),
lost     AS (SELECT * FROM a EXCEPT SELECT * FROM b),
common   AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
excess   AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
SELECT t.event_type,
       CAST(COALESCE(r.n, 0) AS BIGINT) AS n_retained_pairs,
       CAST(COALESCE(l.n, 0) AS BIGINT) AS n_lost_pairs,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_common_rows,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS n_excess_rows
FROM (SELECT DISTINCT event_type FROM events) t
LEFT JOIN (SELECT event_type, count(*) AS n FROM retained GROUP BY 1) r
       ON r.event_type = t.event_type
LEFT JOIN (SELECT event_type, count(*) AS n FROM lost GROUP BY 1) l
       ON l.event_type = t.event_type
LEFT JOIN (SELECT event_type, count(*) AS n FROM common GROUP BY 1) c
       ON c.event_type = t.event_type
LEFT JOIN (SELECT event_type, count(*) AS n FROM excess GROUP BY 1) e
       ON e.event_type = t.event_type
"""


@register("setops_halfwindow_pairs", _SETOPS_ORACLE)
def setops_halfwindow_pairs(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """intersect / except / exceptAll / intersectAll over the (user,
    event_type) pairs of the window's two halves — §2.6 closure."""
    ev = load_table(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.date_trunc("day", "ts")).alias("d0"))
    pairs = (ev.crossJoin(F.broadcast(d0))
             .select("user_id", "event_type",
                     F.datediff(F.date_trunc("day", "ts"), "d0")
                     .alias("dd")))
    a = pairs.filter(F.col("dd") < 15).select("user_id", "event_type")
    b = pairs.filter(F.col("dd") >= 15).select("user_id", "event_type")

    def leg_counts(leg: DataFrame, col: str) -> DataFrame:
        return (leg.groupBy("event_type")
                .agg(F.count("*").cast("long").alias(col)))

    types = ev.select("event_type").distinct()
    out = (types
           .join(leg_counts(a.intersect(b), "n_retained_pairs"),
                 "event_type", "left")
           .join(leg_counts(a.subtract(b), "n_lost_pairs"),
                 "event_type", "left")
           .join(leg_counts(a.intersectAll(b), "n_common_rows"),
                 "event_type", "left")
           .join(leg_counts(a.exceptAll(b), "n_excess_rows"),
                 "event_type", "left"))
    return out.select(
        "event_type",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
          for c in ("n_retained_pairs", "n_lost_pairs",
                    "n_common_rows", "n_excess_rows")])
