"""Round-14 candidate queries (written in round 10).

- unconverted_clicks: the BATCH twin of
  streaming/jobs.unconverted_clicks_stream (VERDICT r09 #5) — the
  retargeting relation: every click LEFT-joined to the same user's
  purchase within 1 hour.  The streaming job computes exactly this
  relation incrementally (watermark-flushed outer results);
  tests/test_round14.py pins the two bit-equal on the same feed,
  CORRECTNESS gives it the oracle gate the other streaming twins got.
- cube_revenue_margins: 2-D CUBE over lineitem (returnflag x
  ship-year) with exact-decimal revenue/charge sums and GROUPING()
  flags, checked against a UNION-ALL oracle that spells out all four
  grouping combinations independently (VERDICT r09 #7 — the §2.4
  capability-ceiling closer; DuckDB's own CUBE would share the
  algorithm, the UNION-ALL spelling does not).

Float discipline (registry.py docstring authoritative): money folds
through DECIMAL; passthrough doubles (events.value) carry no
arithmetic so they hash bit-equal; timestamps bridge as epoch-micros
BIGINTs (exact in both engines, no stringification hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Unconverted clicks — batch twin of the left-outer stream-stream
# interval join (streaming/jobs.py:419).  One row per (click, matching
# purchase) with purchase columns NULL when no purchase by the same
# user lands in [click_ts, click_ts + 1h] — the retargeting feed.
#
# Scale shape: equi-key join on user_id (both sides shuffle on the
# key; AQE handles skewed power-users) with the time interval as a
# residual join condition; per-user-per-hour purchase fan-in is
# bounded by user behavior, not corpus size.  This is the relation the
# streaming job maintains with O(throughput x window) state — the
# batch path is the backfill/repair arm of the same feed.
# ---------------------------------------------------------------------------


@register("unconverted_clicks", """
WITH c AS (
    SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
),
p AS (
    SELECT user_id, event_id AS purchase_id, value AS amount,
           ts AS purchase_ts
    FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, c.click_id,
       epoch_us(c.click_ts) AS click_ts_us,
       p.purchase_id, p.amount,
       CAST(p.purchase_id IS NOT NULL AS INT) AS converted
FROM c LEFT JOIN p
  ON c.user_id = p.user_id
 AND p.purchase_ts >= c.click_ts
 AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
""")
def unconverted_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of unconverted_clicks_stream: clicks LEFT-joined to
    same-user purchases within 1 hour (epoch-micros ts bridge)."""
    ev = load_table(spark, sf_dir, "events")
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("value").alias("amount"),
                 F.col("ts").alias("purchase_ts")))
    cond = ((c["user_id"] == p["p_user"])
            & (p["purchase_ts"] >= c["click_ts"])
            & (p["purchase_ts"]
               <= c["click_ts"] + F.expr("INTERVAL 1 HOUR")))
    return (c.join(p, cond, "left")
            .select("user_id", "click_id",
                    F.unix_micros("click_ts").alias("click_ts_us"),
                    "purchase_id", "amount",
                    F.col("purchase_id").isNotNull().cast("int")
                    .alias("converted")))


# ---------------------------------------------------------------------------
# CUBE revenue/margins — all four grouping combinations of
# (l_returnflag, ship-year) in ONE pass (Spark expands the cube into a
# single Expand + hash-aggregate: the 4x row expansion happens after
# the scan, map-side partials still apply — one shuffle, not four).
# The oracle deliberately spells the cube as a UNION ALL of the four
# independent GROUP BYs so the two engines share no cube machinery.
#
# Exactness: revenue = sum(extprice * (1 - disc)), charge = sum(
# extprice * (1 - disc) * (1 + tax)) — all DECIMAL until the final
# double cast, which bridges through the exact decimal STRING: the
# sf0.1 grand-total sums exceed 2^53 scaled, where a direct
# decimal->double cast can differ by an ulp between engines
# (james_stein r08 precedent; parity.py docstring).  GROUPING() flags disambiguate
# rolled-up NULLs from data NULLs (keys here are non-null, but the
# contract is stated).
# ---------------------------------------------------------------------------

_CUBE_REV = ("SUM(CAST(l_extendedprice AS DECIMAL(12,2)) "
             "* (1 - CAST(l_discount AS DECIMAL(4,2))))")
_CUBE_CHG = ("SUM(CAST(l_extendedprice AS DECIMAL(12,2)) "
             "* (1 - CAST(l_discount AS DECIMAL(4,2))) "
             "* (1 + CAST(l_tax AS DECIMAL(4,2))))")

_CUBE_BLOCKS = []
for _flag_on, _year_on in ((1, 1), (1, 0), (0, 1), (0, 0)):
    _sel_flag = "l_returnflag" if _flag_on else "CAST(NULL AS VARCHAR)"
    _sel_year = ("CAST(year(l_shipdate) AS INT)" if _year_on
                 else "CAST(NULL AS INT)")
    _keys = [k for k, on in (("l_returnflag", _flag_on),
                             ("year(l_shipdate)", _year_on)) if on]
    _group = f"GROUP BY {', '.join(_keys)}" if _keys else ""
    _CUBE_BLOCKS.append(f"""
SELECT {_sel_flag} AS l_returnflag, {_sel_year} AS ship_year,
       {1 - _flag_on} AS g_flag, {1 - _year_on} AS g_year,
       COUNT(*) AS n,
       CAST(CAST({_CUBE_REV} AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST({_CUBE_CHG} AS VARCHAR) AS DOUBLE) AS charge
FROM lineitem {_group}""")


@register("cube_revenue_margins",
          "\nUNION ALL\n".join(_CUBE_BLOCKS))
def cube_revenue_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D cube (returnflag x ship-year) of exact-decimal revenue and
    tax-inclusive charge, with GROUPING() flags, vs a UNION-ALL
    oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return (li.select("l_returnflag",
                      F.year("l_shipdate").cast("int").alias("ship_year"),
                      (price * (F.lit(1) - disc)).alias("rev"),
                      (price * (F.lit(1) - disc)
                       * (F.lit(1) + tax)).alias("chg"))
            .cube("l_returnflag", "ship_year")
            .agg(F.grouping("l_returnflag").cast("int").alias("g_flag"),
                 F.grouping("ship_year").cast("int").alias("g_year"),
                 F.count("*").alias("n"),
                 F.sum("rev").cast("string").cast("double").alias("revenue"),
                 F.sum("chg").cast("string").cast("double").alias("charge"))
            .select("l_returnflag", "ship_year", "g_flag", "g_year",
                    "n", "revenue", "charge"))
