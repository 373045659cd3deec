"""Round-14 query layer — genuinely-uncovered engine surfaces
(VERDICT r13 #6 named the first two): Spark-side LATERAL correlated
subqueries, the ``try_*`` error-safe function family, the Spark 4
VARIANT semi-structured type, ``DataFrame.transpose``, case-insensitive
collation, the built-in Datasketches HLL aggregates, and
timestampadd/timestampdiff interval arithmetic.

Registry-discipline note (ROADMAP r14 #5): each family was grepped
before drafting — LATERAL previously appeared ONLY in oracle SQL
(asof/gapfill probes), ``try_parse_json`` was the single ``try_*``
touch, and variant/transpose/collate/hll_sketch_agg/timestampadd had
zero call sites. x19_json_extract (get_json_object over props) is the
nearest kin of the variant suite — that one exercises STRING-path JSON
extraction, this one the typed VARIANT binary encoding.

Scale shapes: every query is a bounded projection/aggregation over one
fact table (no new shuffle-heavy joins); the LATERAL query decorrelates
to a per-nation window rank (25-row outer side); transpose runs on a
5-row aggregate by contract (transpose requires a driver-side column
head — documented below).

Reference: the reference crawler (exchage_rate_crawler.py,
google_trends_*.py) has no analogue surface; this layer exists for the
100 TB engine-parity mandate, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# LATERAL correlated subquery — Spark-side surface parity.
#
# Top-2 customers by account balance per nation, spelled as a SQL
# LATERAL join on BOTH engines (identical text modulo view names).
# Catalyst decorrelates the ORDER BY ... LIMIT 2 inner query into a
# per-nation rank — the outer side is the 25-row nation dim, so the
# plan is one customer shuffle however large the fact side grows.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n.n_name AS nation, t.c_name AS cust_name,
       t.c_acctbal AS acctbal,
       CAST(row_number() OVER (PARTITION BY n.n_name
            ORDER BY t.c_acctbal DESC, t.c_name) AS INT) AS rnk
FROM {nation} n, LATERAL (
    SELECT c_name, c_acctbal FROM {customer} c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY nation, rnk
"""
# (comma-LATERAL: the one spelling BOTH parsers accept — DuckDB's
# JOIN LATERAL requires an ON clause that Spark's does not)


@register("lateral_topk_per_key",
          _LATERAL_SQL.format(nation="nation", customer="customer"))
def lateral_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated subquery (identical spelling on both
    engines): top-2 customers per nation with a deterministic
    (acctbal DESC, name) tiebreak. acctbal is a passthrough double —
    no arithmetic, bit-equal by the registry float rules."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "r19_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "r19_customer")
    return spark.sql(_LATERAL_SQL.format(nation="r19_nation",
                                         customer="r19_customer"))


# ---------------------------------------------------------------------------
# try_* error-safe function family — NULL-on-failure semantics pinned
# cross-engine on a fixed case matrix (every case was verified to agree
# between Spark's try_* and DuckDB's TRY_CAST / HUGEINT-guard
# spellings before registration; cases where the engines genuinely
# differ — e.g. TRY_CAST('3.9' AS INT), which DuckDB rounds and Spark
# nulls — are deliberately NOT in the matrix).
# ---------------------------------------------------------------------------


@register("try_error_safe_suite", """
SELECT
  TRY_CAST('42' AS INT)                                   AS cast_ok,
  TRY_CAST('12x' AS INT)                                  AS cast_junk,
  TRY_CAST('' AS INT)                                     AS cast_empty,
  CAST(TRY_CAST('2024-02-30' AS DATE) AS VARCHAR)         AS date_invalid,
  CAST(TRY_CAST('2024-02-29' AS DATE) AS VARCHAR)         AS date_leap,
  TRY_CAST('1e3' AS DOUBLE)                               AS cast_sci,
  CAST(10.0 AS DOUBLE) / 4.0                              AS div_ok,
  CASE WHEN 0 = 0 THEN NULL
       ELSE CAST(1 AS DOUBLE) / 0 END                     AS div_zero,
  CASE WHEN CAST(9223372036854775807 AS HUGEINT) + 1
            <= 9223372036854775807
       THEN CAST(CAST(9223372036854775807 AS HUGEINT) + 1 AS BIGINT)
       END                                                AS add_overflow,
  CAST(5 + 7 AS BIGINT)                                   AS add_ok,
  CASE WHEN CAST(-9223372036854775808 AS HUGEINT) - 1
            >= -9223372036854775808
       THEN CAST(CAST(-9223372036854775808 AS HUGEINT) - 1 AS BIGINT)
       END                                                AS sub_overflow,
  CASE WHEN CAST(4611686018427387904 AS HUGEINT) * 4
            <= 9223372036854775807
       THEN CAST(CAST(4611686018427387904 AS HUGEINT) * 4 AS BIGINT)
       END                                                AS mul_overflow,
  CAST(TRY_CAST(replace(replace('$1,234.56', '$', ''), ',', '')
       AS DECIMAL(6,2)) AS DOUBLE)                        AS tonum_ok,
  CAST(TRY_CAST('zz' AS DECIMAL(3,0)) AS DOUBLE)          AS tonum_junk,
  ([10, 20, 30])[5]                                       AS arr_oob,
  ([10, 20, 30])[2]                                       AS arr_hit,
  CAST(NULL AS INT)                                       AS map_miss,
  9                                                       AS map_hit
""")
def try_error_safe_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* error-safe surface: try_cast (junk / empty /
    impossible-date / scientific notation), try_divide by zero,
    try_add / try_subtract / try_multiply at BIGINT overflow,
    try_to_number with a currency format, try_element_at out-of-bounds
    and missing-key. One row, one typed column per case; the oracle
    spells the identical semantics with TRY_CAST and HUGEINT range
    guards. Dates bridge as strings (ISO render is engine-identical);
    decimals bridge as double."""
    _ = load_table(spark, sf_dir, "region")  # path validity contract
    return spark.sql("""
SELECT
  try_cast('42' AS INT)                              AS cast_ok,
  try_cast('12x' AS INT)                             AS cast_junk,
  try_cast('' AS INT)                                AS cast_empty,
  CAST(try_cast('2024-02-30' AS DATE) AS STRING)     AS date_invalid,
  CAST(try_cast('2024-02-29' AS DATE) AS STRING)     AS date_leap,
  try_cast('1e3' AS DOUBLE)                          AS cast_sci,
  try_divide(CAST(10.0 AS DOUBLE), CAST(4.0 AS DOUBLE)) AS div_ok,
  try_divide(CAST(1 AS DOUBLE), CAST(0 AS DOUBLE))   AS div_zero,
  try_add(9223372036854775807L, 1L)                  AS add_overflow,
  try_add(5L, 7L)                                    AS add_ok,
  try_subtract(-9223372036854775808L, 1L)            AS sub_overflow,
  try_multiply(4611686018427387904L, 4L)             AS mul_overflow,
  CAST(try_to_number('$1,234.56', '$9,999.99') AS DOUBLE) AS tonum_ok,
  CAST(try_to_number('zz', '999') AS DOUBLE)         AS tonum_junk,
  try_element_at(array(10, 20, 30), 5)               AS arr_oob,
  try_element_at(array(10, 20, 30), 2)               AS arr_hit,
  try_element_at(map('k', 9), 'z')                   AS map_miss,
  try_element_at(map('k', 9), 'k')                   AS map_hit
""")


# ---------------------------------------------------------------------------
# VARIANT semi-structured type — typed-path extraction over the binary
# variant encoding (x19_json_extract's kin covers STRING-path
# get_json_object; this covers parse_json -> variant_get /
# try_variant_get / schema_of_variant). The JSON document is built
# in-engine from event columns with the same concat on both sides, so
# the extraction inputs are byte-identical.
# ---------------------------------------------------------------------------

_VAR_SCHEMA_LIT = "OBJECT<a: ARRAY<BIGINT>, t: STRING, u: BIGINT>"


@register("variant_get_suite", f"""
WITH j AS (
    SELECT event_id,
           '{{"u":' || CAST(user_id AS VARCHAR)
             || ',"t":"' || event_type
             || '","a":[' || CAST(event_id % 7 AS VARCHAR)
             || ',' || CAST(event_id % 11 AS VARCHAR) || ']}}' AS doc
    FROM events WHERE event_id < 50
)
SELECT event_id,
       CAST(json_extract(doc, '$.u') AS BIGINT)      AS u,
       json_extract_string(doc, '$.t')               AS t,
       CAST(json_extract(doc, '$.a[1]') AS BIGINT)   AS a1,
       CAST(json_extract(doc, '$.missing') AS BIGINT) AS miss,
       '{_VAR_SCHEMA_LIT}'                           AS sch
FROM j ORDER BY event_id
""")
def variant_get_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT: parse_json into the binary variant encoding,
    then typed-path variant_get ($.u bigint, $.t string, $.a[1] array
    element), try_variant_get on a missing path (NULL, no error), and
    schema_of_variant (constant for this fixed construction — the
    oracle pins the literal, which documents the inferred shape:
    {_VAR_SCHEMA_LIT!r})."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    doc = F.concat(
        F.lit('{"u":'), F.col("user_id").cast("string"),
        F.lit(',"t":"'), F.col("event_type"),
        F.lit('","a":['), (F.col("event_id") % 7).cast("string"),
        F.lit(","), (F.col("event_id") % 11).cast("string"), F.lit("]}"))
    v = F.parse_json(doc)
    return (ev.select(
        "event_id",
        F.variant_get(v, "$.u", "bigint").alias("u"),
        F.variant_get(v, "$.t", "string").alias("t"),
        F.variant_get(v, "$.a[1]", "bigint").alias("a1"),
        F.try_variant_get(v, "$.missing", "bigint").alias("miss"),
        F.schema_of_variant(v).alias("sch"))
        .orderBy("event_id"))


# ---------------------------------------------------------------------------
# DataFrame.transpose — region metrics matrix flipped so metrics become
# rows and regions become columns. transpose() requires the frame
# head on the driver (column names come from data), so the input is a
# 5-row aggregate BY CONTRACT — the reduction happens before the flip,
# exactly how a 100 TB report would use it.
# ---------------------------------------------------------------------------


@register("transpose_region_stats", """
WITH m AS (
    SELECT r.r_name,
           round(avg(c.c_acctbal), 6) + 0.0 AS avg_bal,
           CAST(count(*) AS DOUBLE)         AS n_cust,
           CAST(count(DISTINCT n.n_nationkey) AS DOUBLE) AS n_nations
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
)
SELECT k AS key,
       max(CASE WHEN r_name = 'AFRICA' THEN v END)      AS "AFRICA",
       max(CASE WHEN r_name = 'AMERICA' THEN v END)     AS "AMERICA",
       max(CASE WHEN r_name = 'ASIA' THEN v END)        AS "ASIA",
       max(CASE WHEN r_name = 'EUROPE' THEN v END)      AS "EUROPE",
       max(CASE WHEN r_name = 'MIDDLE EAST' THEN v END) AS "MIDDLE EAST"
FROM (
    SELECT r_name, 'avg_bal' AS k, avg_bal AS v FROM m
    UNION ALL SELECT r_name, 'n_cust', n_cust FROM m
    UNION ALL SELECT r_name, 'n_nations', n_nations FROM m
)
GROUP BY k ORDER BY k
""")
def transpose_region_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose over a 5-region aggregate: region rows
    become columns (names from data — the driver-side head transpose
    requires is why the input is the REDUCED relation), metric columns
    become rows keyed by 'key'. The oracle spells the flip as a
    conditional-aggregation pivot. All metrics are double (transpose
    needs one common value type)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    m = (region
         .join(nation, nation.n_regionkey == region.r_regionkey)
         .join(cust, cust.c_nationkey == nation.n_nationkey)
         .groupBy("r_name")
         .agg((F.round(F.avg("c_acctbal"), 6) + 0.0).alias("avg_bal"),
              F.count("*").cast("double").alias("n_cust"),
              F.countDistinct("n_nationkey").cast("double")
              .alias("n_nations"))
         .orderBy("r_name"))
    return m.transpose().withColumnRenamed("key", "key").orderBy("key")


# ---------------------------------------------------------------------------
# Case-insensitive collation — Spark 4 UTF8_LCASE grouping. Mixed
# casing is injected deterministically (event_id mod 3: UPPER /
# Initial-cap / original), then grouped under the collation; the
# oracle groups by lower(). The initial-cap spelling is built by hand
# (upper(first) || rest) with the identical expression on both sides.
# ---------------------------------------------------------------------------


@register("collation_lcase_groups", """
WITH k AS (
    SELECT CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                WHEN event_id % 3 = 1 THEN
                     upper(substr(event_type, 1, 1))
                       || substr(event_type, 2)
                ELSE event_type END AS k
    FROM events
)
SELECT lower(min(k)) AS lkey,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT k) AS BIGINT) AS n_case_variants
FROM k GROUP BY lower(k) ORDER BY lkey
""")
def collation_lcase_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY under the UTF8_LCASE collation: 'CLICK' / 'Click' /
    'click' land in one group. Output key is lower(min(binary-k)) —
    deterministic, never the collation's arbitrary group
    representative. n_case_variants counts the distinct raw spellings
    the collated group absorbed (binary-distinct inside a collated
    group — the two collations composing is the point)."""
    ev = load_table(spark, sf_dir, "events")
    k = (F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
         .when(F.col("event_id") % 3 == 1,
               F.concat(F.upper(F.substring("event_type", 1, 1)),
                        F.expr("substr(event_type, 2)")))
         .otherwise(F.col("event_type")))
    return (ev.select(k.alias("k"))
            .groupBy(F.collate(F.col("k"), "UTF8_LCASE").alias("ck"))
            .agg(F.lower(F.min(F.expr("k COLLATE UTF8_BINARY")))
                 .alias("lkey"),
                 F.count("*").cast("long").alias("n"),
                 F.countDistinct(F.expr("k COLLATE UTF8_BINARY"))
                 .cast("long").alias("n_case_variants"))
            .select("lkey", "n", "n_case_variants")
            .orderBy("lkey"))


# ---------------------------------------------------------------------------
# Built-in Datasketches HLL aggregates — the MERGEABLE sketch builtin
# (the engine's own HLL queries implement the register math by hand;
# this exercises hll_sketch_agg / hll_union_agg / hll_sketch_estimate,
# the binary-sketch path a 100 TB rollup would persist). Estimates are
# asserted as booleans against the exact count (±5%, far outside the
# lgK=12 error envelope) — the exact count is the hashed value.
# ---------------------------------------------------------------------------


@register("hll_sketch_builtin_audit", """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS est_within_5pct,
       TRUE AS merge_within_5pct
FROM events GROUP BY event_type ORDER BY event_type
""")
def hll_sketch_builtin_audit(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Datasketches HLL builtins: per event type, the direct sketch
    estimate AND the shard-merged estimate (8 user-shard sketches
    combined with hll_union_agg — the mergeable-summary path) must
    land within ±5% of the exact distinct count. The oracle carries
    the exact count and TRUE literals: DuckDB's approx_count_distinct
    is a different HLL implementation, so the ASSERTION is the
    portable fact, not the estimate."""
    ev = load_table(spark, sf_dir, "events")
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
    shards = (ev.groupBy("event_type",
                         F.pmod(F.col("user_id"), F.lit(8)).alias("sh"))
              .agg(F.hll_sketch_agg("user_id").alias("sk")))
    merged = shards.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_m"))
    ok = lambda c: (F.abs(c - F.col("n_exact"))  # noqa: E731
                    <= 0.05 * F.col("n_exact"))
    return (ex.join(merged, "event_type")
            .select("event_type", "n_exact",
                    ok(F.col("est")).alias("est_within_5pct"),
                    ok(F.col("est_m")).alias("merge_within_5pct"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# timestampadd / timestampdiff interval arithmetic — whole-unit offsets
# only: DuckDB's date_diff counts boundary CROSSINGS while Spark's
# timestampdiff counts elapsed full units, and the two agree exactly
# when the offset is an integral number of the diffed unit (the
# sub-unit fields cancel). Month-grain edges live in date_edge_suite;
# this suite is the sub-day surface it left uncovered.
# ---------------------------------------------------------------------------


@register("interval_arith_suite", """
WITH e AS (
    SELECT event_id, ts,
           CAST(event_id % 90 AS INT) AS mins,
           CAST(event_id % 5 AS INT) AS weeks
    FROM events WHERE event_id < 40
)
SELECT event_id,
       epoch_us(ts + INTERVAL 3 HOUR)                    AS plus_3h_us,
       epoch_us(ts + to_minutes(mins))                   AS plus_kmin_us,
       epoch_us(ts + to_days(7 * weeks))                 AS plus_kweek_us,
       epoch_us(ts + INTERVAL 1 DAY + INTERVAL 2 HOUR
                   + INTERVAL 3 MINUTE + INTERVAL 4 SECOND)
                                                         AS plus_dt_us,
       CAST(date_diff('minute', ts, ts + to_minutes(mins)) AS BIGINT)
                                                         AS diff_min,
       CAST(date_diff('hour', ts, ts + INTERVAL 3 HOUR) AS BIGINT)
                                                         AS diff_hour,
       CAST(date_diff('day', ts, ts + to_days(7 * weeks)) AS BIGINT)
                                                         AS diff_day
FROM e ORDER BY event_id
""")
def interval_arith_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestampadd (HOUR / MINUTE / WEEK-as-days), make_dt_interval
    composition, and timestampdiff at minute/hour/day grain over
    whole-unit offsets (the crossings-vs-elapsed agreement zone —
    docstring above). Timestamps bridge as epoch-micros BIGINTs (the
    registry rule: exact in both engines)."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") < 40)
          .select("event_id", "ts",
                  (F.col("event_id") % 90).cast("int").alias("mins"),
                  (F.col("event_id") % 5).cast("int").alias("weeks")))
    return (ev.select(
        "event_id",
        F.unix_micros(F.timestamp_add("HOUR", F.lit(3), F.col("ts")))
        .alias("plus_3h_us"),
        F.unix_micros(F.timestamp_add("MINUTE", F.col("mins"),
                                      F.col("ts")))
        .alias("plus_kmin_us"),
        F.unix_micros(F.timestamp_add("DAY", 7 * F.col("weeks"),
                                      F.col("ts")))
        .alias("plus_kweek_us"),
        F.unix_micros(F.col("ts") + F.make_dt_interval(
            F.lit(1), F.lit(2), F.lit(3), F.lit(4)))
        .alias("plus_dt_us"),
        F.expr("timestampdiff(MINUTE, ts, "
               "timestampadd(MINUTE, mins, ts))").cast("long")
        .alias("diff_min"),
        F.expr("timestampdiff(HOUR, ts, "
               "timestampadd(HOUR, 3, ts))").cast("long")
        .alias("diff_hour"),
        F.expr("timestampdiff(DAY, ts, "
               "timestampadd(DAY, 7 * weeks, ts))").cast("long")
        .alias("diff_day"))
        .orderBy("event_id"))
