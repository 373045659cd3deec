"""Round-9 candidate queries (written in round 7) — continuing the
LLM-training-data-pipeline mandate into sequential testing, sampling
design, exact-substring dedup, and embedding-level contamination:

- ab_sprt_curve: Wald sequential probability ratio test over the daily
  event log — the streaming-era sibling of ab_assignment_outcomes'
  fixed-horizon z-test (stop an experiment the day the evidence
  crosses a boundary instead of waiting out the horizon).
- neyman_allocation_plan: optimal stratified-sample allocation
  (n_h ∝ N_h·S_h) vs proportional — the sampling-design step before
  any of the corpus audit queries draw their strata.
- fano_burstiness_by_type: index-of-dispersion classification of daily
  event arrivals (bursty vs Poisson-ish vs regular) — the data-arrival
  QA readout that decides whether per-day partitions skew.
- substring_dup_spans: maximal cross-document duplicated word-5-gram
  runs per document (the exact-substring dedup readout of Lee et al.
  2022, "Deduplicating Training Data Makes Language Models Better" —
  public paper; span = how much CONTIGUOUS text is copied, which
  set-level Jaccard cannot see).

Same discipline as every other module: exact integer/decimal moments,
no float accumulation (cumulative LLR is recomputed from exact integer
cumsums, never summed as doubles), Spark-parity rounding
(functions/parity.round_sql) on rounded oracle doubles, `+ 0.0` on any
rounded column that can be negative, md5-only hashing, transcendental
constants computed ONCE in Python and embedded as identical literals
in both engines (Java and DuckDB libm may differ in the last ulp).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from travel_data_pipeline_spark.functions.parity import round_sql
from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Wald SPRT over the daily experiment log — sequential A/B evidence.
#
# Arms are the md5 split ab_assignment_outcomes uses; each treatment
# event is a Bernoulli trial (success = purchase). Testing
# H0: p = P0 vs H1: p = P1, the log-likelihood ratio after (n, x)
# trials/successes is x·ln(P1/P0) + (n-x)·ln((1-P1)/(1-P0)); the test
# stops when it leaves (ln B, ln A), A = (1-β)/α, B = β/(1-α).
#
# Float discipline: the ln coefficients are PYTHON literals embedded in
# both engines; the cumulative LLR is NOT a windowed float sum — the
# integer trial/success counts are cumulated exactly (bounded ~30-row
# day grid) and the LLR is ONE shared double expression per row.
#
# Scale shape: one grouped pass over the events scan (shuffle on day),
# then windows over the bounded day grid — never data-scaled.
# ---------------------------------------------------------------------------

_SPRT_P0 = 0.17
_SPRT_P1 = 0.21
_SPRT_LA = math.log(_SPRT_P1 / _SPRT_P0)              # per-success
_SPRT_LB = math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))  # per-failure
_SPRT_UPPER = math.log(19.0)    # alpha = beta = 0.05
_SPRT_LOWER = -math.log(19.0)

_sprt_arm = md5_long_sql("'ab:' || CAST(user_id AS VARCHAR)")
_SPRT_LLR = (f"(CAST(cum_x AS DOUBLE) * {_SPRT_LA!r}"
             f" + CAST(cum_n - cum_x AS DOUBLE) * {_SPRT_LB!r})")


@register("ab_sprt_curve", f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS n_trials,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_success
    FROM events
    WHERE ({_sprt_arm} % 2) = 1
    GROUP BY day
),
cum AS (
    SELECT day, n_trials, n_success,
           SUM(n_trials) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS cum_n,
           SUM(n_success) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS cum_x
    FROM daily
)
SELECT day, CAST(n_trials AS BIGINT) AS n_trials,
       CAST(n_success AS BIGINT) AS n_success,
       CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_x AS BIGINT) AS cum_x,
       {round_sql(_SPRT_LLR)} + 0.0 AS cum_llr,
       CASE WHEN {_SPRT_LLR} >= {_SPRT_UPPER!r} THEN 'accept_h1'
            WHEN {_SPRT_LLR} <= {_SPRT_LOWER!r} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
""")
def ab_sprt_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Wald SPRT curve for the treatment arm's purchase rate.

    The decision column compares the UNROUNDED LLR (one shared double
    expression from exact integer cumsums) against the Wald boundaries
    ln(19)/-ln(19); the reported cum_llr is 6-dp rounded with the
    Spark-parity spelling (an accumulated-shape double) and `+ 0.0`
    (early days can round to -0.0)."""
    events = load_table(spark, sf_dir, "events")
    treat = events.filter(
        (md5_long(F.concat(F.lit("ab:"),
                           F.col("user_id").cast("string"))) % 2) == 1)
    daily = (treat.groupBy(F.col("ts").cast("date").alias("day"))
             .agg(F.count("*").alias("n_trials"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("n_success")))
    # bounded day grid (~30 rows) — the unpartitioned window is over a
    # time-bounded relation, never data-scaled (day-grid precedent:
    # queries_stats day windows)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = (daily.withColumn("cum_n", F.sum("n_trials").over(w))
           .withColumn("cum_x", F.sum("n_success").over(w)))
    llr = (F.col("cum_x").cast("double") * F.lit(_SPRT_LA)
           + (F.col("cum_n") - F.col("cum_x")).cast("double")
           * F.lit(_SPRT_LB))
    return cum.select(
        "day",
        F.col("n_trials").cast("long").alias("n_trials"),
        F.col("n_success").cast("long").alias("n_success"),
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("cum_x").cast("long").alias("cum_x"),
        (F.round(llr, 6) + 0.0).alias("cum_llr"),
        F.when(llr >= _SPRT_UPPER, "accept_h1")
         .when(llr <= _SPRT_LOWER, "accept_h0")
         .otherwise("continue").alias("decision"))


# ---------------------------------------------------------------------------
# Neyman (optimal) stratified-sample allocation — for a fixed audit
# budget, sample stratum h at n_h ∝ N_h · S_h (size × std of the
# target metric) instead of proportionally; variance of the stratified
# mean drops by the ratio of the two allocations' Σ N_h²S_h²/n_h.
#
# Exactness: per-stratum moments are exact integer/decimal sums (sum
# and sum-of-squares of n_chars ride DECIMAL(38,0) — int64 would
# overflow sum-of-squares at ~1e12 docs); S_h is 6-dp rounded and
# CAST to DECIMAL(18,6) so Σ N_h·S_h is a DECIMAL sum —
# order-independent, never a float reduction over strata.
#
# Scale shape: one grouped pass (shuffle on (source, lang)), a bounded
# |sources|×|langs| stratum relation, one broadcast scalar total.
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000
# population variance from exact moments; clamped at 0 (the exact
# algebra can't go negative, the double rendering of it can)
_NEYMAN_VAR = ("GREATEST((CAST(ssq AS DOUBLE)"
               " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
               " / CAST(n_h AS DOUBLE)) / CAST(n_h AS DOUBLE), 0.0)")


@register("neyman_allocation_plan", f"""
WITH strata AS (
    SELECT source, lang, count(*) AS n_h,
           SUM(CAST(n_chars AS DECIMAL(38,0))) AS s,
           SUM(CAST(n_chars AS DECIMAL(19,0)) * n_chars) AS ssq
    FROM documents GROUP BY source, lang
),
sized AS (
    SELECT source, lang, n_h, s,
           CAST({round_sql(f"sqrt({_NEYMAN_VAR})")} AS DECIMAL(18,6))
               AS sd6
    FROM strata
),
tot AS (
    SELECT SUM(CAST(n_h AS DECIMAL(18,0)) * sd6) AS total_ns,
           SUM(n_h) AS total_n
    FROM sized
)
SELECT source, lang, CAST(n_h AS BIGINT) AS n_h,
       {round_sql("CAST(s AS DOUBLE) / n_h")} AS mean_chars,
       CAST(sd6 AS DOUBLE) AS sd_chars,
       {round_sql(f"CAST(CAST(n_h AS DECIMAL(18,0)) * sd6 AS DOUBLE)"
                  f" / CAST(total_ns AS DOUBLE)")} AS neyman_share,
       CAST(floor({_NEYMAN_BUDGET} * CAST(CAST(n_h AS DECIMAL(18,0))
                * sd6 AS DOUBLE) / CAST(total_ns AS DOUBLE)) AS BIGINT)
           AS neyman_n,
       CAST(floor({_NEYMAN_BUDGET} * CAST(n_h AS DOUBLE)
                / CAST(total_n AS DOUBLE)) AS BIGINT) AS prop_n
FROM sized CROSS JOIN tot
""")
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) Neyman vs proportional sample allocation for
    a {_NEYMAN_BUDGET}-doc audit budget (allocations floored — floor
    of an identically-computed double never crosses a boundary the
    way HALF_UP rounding can)."""
    docs = load_table(spark, sf_dir, "documents")
    strata = (docs.groupBy("source", "lang")
              .agg(F.count("*").alias("n_h"),
                   F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("s"),
                   F.sum(F.col("n_chars").cast("decimal(19,0)")
                         * F.col("n_chars")).alias("ssq")))
    var = F.greatest(
        (F.col("ssq").cast("double")
         - F.col("s").cast("double") * F.col("s").cast("double")
         / F.col("n_h").cast("double")) / F.col("n_h").cast("double"),
        F.lit(0.0))
    sized = strata.select(
        "source", "lang", "n_h", "s",
        F.round(F.sqrt(var), 6).cast("decimal(18,6)").alias("sd6"))
    tot = sized.agg(
        F.sum(F.col("n_h").cast("decimal(18,0)") * F.col("sd6"))
         .alias("total_ns"),
        F.sum("n_h").alias("total_n"))
    term = (F.col("n_h").cast("decimal(18,0)") * F.col("sd6"))
    return (sized.crossJoin(F.broadcast(tot))
            .select("source", "lang",
                    F.col("n_h").cast("long").alias("n_h"),
                    F.round(F.col("s").cast("double") / F.col("n_h"), 6)
                     .alias("mean_chars"),
                    F.col("sd6").cast("double").alias("sd_chars"),
                    F.round(term.cast("double")
                            / F.col("total_ns").cast("double"), 6)
                     .alias("neyman_share"),
                    F.floor(_NEYMAN_BUDGET * term.cast("double")
                            / F.col("total_ns").cast("double"))
                     .cast("long").alias("neyman_n"),
                    F.floor(_NEYMAN_BUDGET * F.col("n_h").cast("double")
                            / F.col("total_n").cast("double"))
                     .cast("long").alias("prop_n")))


# ---------------------------------------------------------------------------
# Fano factor (index of dispersion) of daily event arrivals per type —
# var/mean of the per-day count over the GLOBAL day grid (zero days
# included: a type that fires 300 times on one day and never again is
# the bursty case the grid-less version would miss).
#
# Exactness: integer moments over a bounded (|types| × |days|) grid;
# the Fano ratio is one shared double expression. Scale shape: one
# grouped pass over events, a broadcast cross of two bounded dims.
# ---------------------------------------------------------------------------

_FANO = ("(CAST(n_days AS DOUBLE) * CAST(ssq AS DOUBLE)"
         " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
         " / (CAST(n_days AS DOUBLE) * CAST(s AS DOUBLE))")


@register("fano_burstiness_by_type", f"""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
    SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
    FROM events GROUP BY event_type, day
),
grid AS (
    SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
    FROM types t CROSS JOIN days d
    LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
),
m AS (
    SELECT event_type, count(*) AS n_days,
           SUM(CAST(c AS DECIMAL(38,0))) AS s,
           SUM(CAST(c AS DECIMAL(19,0)) * c) AS ssq
    FROM grid GROUP BY event_type
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(s AS BIGINT) AS total_events,
       {round_sql("CAST(s AS DOUBLE) / n_days")} AS mean_daily,
       CASE WHEN s = 0 THEN NULL ELSE {round_sql(_FANO)} END AS fano,
       CASE WHEN s = 0 THEN 'empty'
            WHEN {_FANO} >= 1.2 THEN 'bursty'
            WHEN {_FANO} <= 0.9 THEN 'regular'
            ELSE 'poisson-ish' END AS arrival_class
FROM m
""")
def fano_burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-arrival dispersion per event type over the full day grid
    (Fano = 1 for a Poisson process; classification thresholds compare
    the same unrounded double on both sides)."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(F.col("ts").cast("date").alias("day")).distinct()
    types = events.select("event_type").distinct()
    counts = (events.groupBy("event_type",
                             F.col("ts").cast("date").alias("day"))
              .agg(F.count("*").alias("c")))
    grid = (types.crossJoin(F.broadcast(days))
            .join(counts, ["event_type", "day"], "left")
            .select("event_type", "day",
                    F.coalesce("c", F.lit(0)).alias("c")))
    m = grid.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c")).alias("ssq"))
    fano = ((F.col("n_days").cast("double") * F.col("ssq").cast("double")
             - F.col("s").cast("double") * F.col("s").cast("double"))
            / (F.col("n_days").cast("double")
               * F.col("s").cast("double")))
    return m.select(
        "event_type", F.col("n_days").cast("long").alias("n_days"),
        F.col("s").cast("long").alias("total_events"),
        F.round(F.col("s").cast("double") / F.col("n_days"), 6)
         .alias("mean_daily"),
        F.when(F.col("s") == 0, F.lit(None).cast("double"))
         .otherwise(F.round(fano, 6)).alias("fano"),
        F.when(F.col("s") == 0, "empty")
         .when(fano >= 1.2, "bursty")
         .when(fano <= 0.9, "regular")
         .otherwise("poisson-ish").alias("arrival_class"))


# ---------------------------------------------------------------------------
# Exact-substring duplication spans — per document, the maximal runs
# of consecutive word-5-gram positions whose gram also appears in at
# least one OTHER document (Lee et al. 2022's exact-substring dedup,
# re-expressed at fixed gram length: a length-L duplicated span means
# an exact shared substring of L+4 words).
#
# Scale shape: gram text leaves the plan before any shuffle — the
# cross-doc frequency groupBy and the position join both key on the
# 60-bit md5 of the gram (32-byte keys, not 5-word strings; md5
# identically on both engines, so a collision — ~2^-60 — would be the
# SAME collision in the oracle). Islands are per-document windows
# (partitioned), never global; output is bounded by docs-with-dups.
# ---------------------------------------------------------------------------

_SPAN_N = 5


@register("substring_dup_spans", f"""
WITH normed AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
grams AS (
    SELECT w.doc_id, i.i AS pos,
           {md5_long_sql(f"array_to_string(w.words[i.i:i.i+{_SPAN_N - 1}],"
                         f" ' ')")} AS gh
    FROM (SELECT doc_id, string_split(norm, ' ') AS words FROM normed) w,
         unnest(generate_series(1, greatest(len(w.words) - {_SPAN_N - 1},
                                            0))) AS i(i)
),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
dup AS (SELECT gh FROM grams GROUP BY gh
        HAVING COUNT(DISTINCT doc_id) >= 2),
dpos AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)),
isl AS (
    SELECT doc_id, pos,
           pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS grp
    FROM dpos
),
spans AS (
    SELECT doc_id, grp, count(*) AS span_len
    FROM isl GROUP BY doc_id, grp
),
per_doc AS (
    SELECT doc_id, count(*) AS n_spans, MAX(span_len) AS max_span_grams,
           SUM(span_len) AS dup_grams
    FROM spans GROUP BY doc_id
)
SELECT p.doc_id, CAST(s.n_grams AS BIGINT) AS n_grams,
       CAST(p.dup_grams AS BIGINT) AS dup_grams,
       CAST(p.n_spans AS BIGINT) AS n_spans,
       CAST(p.max_span_grams AS BIGINT) AS max_span_grams,
       {round_sql("p.dup_grams / CAST(s.n_grams AS DOUBLE)")} AS dup_share
FROM per_doc p JOIN sizes s ON s.doc_id = p.doc_id
""")
def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated 5-gram runs per document
    (docs with no duplicated gram are omitted — inner-join semantics
    on both sides; docs under 5 words carry no gram slots at all).

    Islands: within a document, consecutive duplicated positions share
    pos - row_number() — one partitioned window, one bounded groupBy.
    """
    from travel_data_pipeline_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    grams = (docs.select(
        "doc_id",
        F.posexplode(dedup.word_shingles(F.col("text"), _SPAN_N))
         .alias("p0", "g"))
        .select("doc_id", (F.col("p0") + 1).alias("pos"),
                md5_long(F.col("g")).alias("gh")))
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    dup = (grams.groupBy("gh")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("gh"))
    dpos = grams.join(dup, "gh").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dpos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = (isl.groupBy("doc_id", "grp")
             .agg(F.count("*").alias("span_len")))
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.max("span_len").alias("max_span_grams"),
        F.sum("span_len").alias("dup_grams"))
    return (per_doc.join(sizes, "doc_id")
            .select("doc_id",
                    F.col("n_grams").cast("long").alias("n_grams"),
                    F.col("dup_grams").cast("long").alias("dup_grams"),
                    F.col("n_spans").cast("long").alias("n_spans"),
                    F.col("max_span_grams").cast("long")
                     .alias("max_span_grams"),
                    F.round(F.col("dup_grams")
                            / F.col("n_grams").cast("double"), 6)
                     .alias("dup_share")))
