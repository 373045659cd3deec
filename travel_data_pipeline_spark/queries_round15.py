"""Round-15 candidate queries (written in round 10) — survival,
calibration-fitting, link-analysis, and local-DP layers:

- nelson_aalen_hazard: the Nelson-Aalen cumulative-hazard estimator
  over the SAME lifetime/censoring relation as kaplan_meier_lifetime
  (Aalen 1978, public) — H(t) = sum_{t_i<=t} d_i/n_i with its
  variance sum d_i/n_i^2 and the Fleming-Harrington survival
  exp(-H(t)).  KM multiplies survival factors; NA sums hazard
  increments — distinct estimator, shared step relation.
- isotonic_calibration_bins: weighted isotonic (PAVA) fit of the
  frozen quality scorer's reliability bins via the minimax closed
  form iso(i) = max_{j<=i} min_{k>=i} wavg(rate, bins j..k)
  (Barlow et al. 1972, public) — no iteration, no driver loop: the
  bin relation is <= 10 rows, so the (j, k) interval enumeration is
  a bounded broadcast relation regardless of corpus size.
- hits_supplier_part: Kleinberg HITS (1999, public) hub/authority
  power iteration over the bipartite supplier->part purchase graph,
  3 iterations, MAX-normalized (max is order-free exact — no global
  float-sum hazard), every neighbor sum a position-sorted fold
  (copurchase_pagerank discipline).
- randomized_response_debias: Warner randomized response (1965,
  public) — each event reports its high-value flag truthfully with
  probability 3/4, else a fair md5 coin; the per-type debiased
  estimate (obs - 1/8) / (3/4 - 1/8)... spelled exactly as
  (obs_rate - q*(1-p_keep)) / p_keep with q = 1/2 — is audited
  against the true rate the mechanism hid.  The local-DP sibling of
  dp_noisy_event_counts (central DP).

Float discipline (registry.py docstring authoritative): all counts
are exact integers; hazard/iso/HITS doubles derive from integer or
pinned-fold inputs; every output rounds 6dp through parity.round_sql
on the DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from travel_data_pipeline_spark.functions.parity import round_sql
from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard.
#
# Shares kaplan_meier_lifetime's lifetime/censoring/step construction
# (queries_stats.py:821) — the estimator differs: instead of the
# product-limit survival, fold the hazard increments
#   H(t)   = sum_{t_i <= t} d_i / n_i          (cumulative hazard)
#   varH   = sum_{t_i <= t} d_i / n_i^2        (Aalen variance)
#   S_FH   = exp(-H(t))                        (Fleming-Harrington)
# Both cumsums are POSITION-PINNED array folds over the time-sorted
# step list (double addition re-parenthesization hazard — the
# two_phase_ordered cumsum restriction applies to window sums, so the
# bounded step relation folds in one sorted array instead).
#
# Scale shape: two grouped passes over events (per-user span, per-time
# deaths) + one bounded fold over the step relation (|distinct
# lifetimes| rows — day-grained, corpus-size-independent).
# ---------------------------------------------------------------------------


@register("nelson_aalen_hazard", f"""
WITH life AS MATERIALIZED (
    SELECT user_id,
           date_diff('day', min(date_trunc('day', ts)),
                     max(date_trunc('day', ts))) AS t,
           CASE WHEN max(date_trunc('day', ts))
                     = (SELECT max(date_trunc('day', ts)) FROM events)
                THEN 1 ELSE 0 END AS censored
    FROM events GROUP BY user_id
),
byt AS (
    SELECT t,
           CAST(SUM(1 - censored) AS BIGINT) AS d,
           CAST(SUM(censored) AS BIGINT) AS c
    FROM life GROUP BY t
),
risk AS (
    SELECT t, d,
           (SELECT count(*) FROM life)
             - COALESCE(SUM(d + c) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS n_risk
    FROM byt
),
steps AS MATERIALIZED (
    SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk
    FROM risk WHERE d > 0
),
hfold AS (
    SELECT t, d, n_risk,
           list_reduce(list_prepend(0.0,
               list(CAST(d2 AS DOUBLE) / n2 ORDER BY t2)),
               (a, b) -> a + b) AS h,
           list_reduce(list_prepend(0.0,
               list(CAST(d2 AS DOUBLE) / (n2 * n2) ORDER BY t2)),
               (a, b) -> a + b) AS vh
    FROM steps s
    JOIN (SELECT t AS t2, d AS d2, CAST(n_risk AS DOUBLE) AS n2
          FROM steps) i ON i.t2 <= s.t
    GROUP BY t, d, n_risk
)
SELECT CAST(t AS BIGINT) AS t, d, n_risk,
       {round_sql('h')} AS cum_hazard,
       {round_sql('vh')} AS var_hazard,
       {round_sql('exp(-h)')} AS fh_survival
FROM hfold
""")
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard (+ Aalen variance and the
    Fleming-Harrington survival exp(-H)) over user activity lifetimes
    — the counting-process sibling of kaplan_meier_lifetime."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    life = (ev.groupBy("user_id")
            .agg(F.min(day).alias("first_d"), F.max(day).alias("last_d")))
    max_day = ev.agg(F.max(day).alias("max_d"))
    life = (life.crossJoin(F.broadcast(max_day))
            .select(F.datediff("last_d", "first_d").cast("long").alias("t"),
                    F.when(F.col("last_d") == F.col("max_d"), 1)
                     .otherwise(0).alias("censored")))
    byt = (life.groupBy("t")
           .agg(F.sum(1 - F.col("censored")).alias("d"),
                F.sum("censored").alias("c")))
    total = life.agg(F.count("*").alias("n_total"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (byt.crossJoin(F.broadcast(total))
            .withColumn("removed",
                        F.coalesce(F.sum(F.col("d") + F.col("c")).over(w),
                                   F.lit(0)))
            .withColumn("n_risk", F.col("n_total") - F.col("removed")))
    steps = (risk.filter(F.col("d") > 0)
             .select("t", "d", F.col("n_risk").cast("long").alias("n_risk")))
    # one sorted fold carrying (h, vh) through the step list; the
    # per-t prefix is re-read from the accumulated array (exact same
    # addition order as the oracle's per-t sorted list_reduce)
    folded = steps.agg(F.array_sort(F.collect_list(
        F.struct("t", "d", "n_risk"))).alias("ss"))
    walk = F.aggregate(
        F.col("ss"),
        F.array().cast("array<struct<t:bigint,d:bigint,n_risk:bigint,"
                       "h:double,vh:double>>"),
        lambda acc, x: F.array_append(acc, F.struct(
            x["t"].alias("t"), x["d"].alias("d"),
            x["n_risk"].alias("n_risk"),
            (F.when(F.size(acc) == 0, F.lit(0.0))
              .otherwise(F.element_at(acc, -1)["h"])
             + x["d"].cast("double")
             / x["n_risk"].cast("double")).alias("h"),
            (F.when(F.size(acc) == 0, F.lit(0.0))
              .otherwise(F.element_at(acc, -1)["vh"])
             + x["d"].cast("double")
             / (x["n_risk"].cast("double")
                * x["n_risk"].cast("double"))).alias("vh"))))
    return (folded.select(F.explode(walk).alias("e"))
            .select(F.col("e.t").alias("t"), F.col("e.d").alias("d"),
                    F.col("e.n_risk").alias("n_risk"),
                    F.round(F.col("e.h"), 6).alias("cum_hazard"),
                    F.round(F.col("e.vh"), 6).alias("var_hazard"),
                    F.round(F.exp(-F.col("e.h")), 6).alias("fh_survival")))


# ---------------------------------------------------------------------------
# Isotonic calibration (PAVA) over the reliability bins.
#
# The weighted isotonic fit has the closed minimax form
#   iso(i) = max_{j<=i} min_{k>=i} Av(j, k),
#   Av(j, k) = sum_{b=j..k} n_pos_b / sum_{b=j..k} n_b
# (Barlow/Bartholomew/Bremner/Brunk 1972) — equal to the PAVA
# pool-adjacent-violators result, but expressible as three bounded
# relational passes instead of a sequential pooling loop.  Every
# Av is ONE division of exact integer sums, so min/max over them are
# order-free and the whole fit is engine-deterministic.
#
# Scale shape: the corpus scan lives inside calibration_binned (shared
# with cdf_calibration_bins); everything after runs on <= 10 bins ->
# <= 55 intervals -> <= 550 (i, j) cells — broadcast-sized at any
# corpus scale.
# ---------------------------------------------------------------------------

from travel_data_pipeline_spark.queries_round8 import (  # noqa: E402
    CAL_PROBS_SQL,
    calibration_binned,
)


@register("isotonic_calibration_bins", f"""
WITH {CAL_PROBS_SQL},
b AS (
    SELECT bin, n, n_pos,
           row_number() OVER (ORDER BY bin) AS rn
    FROM cal_binned
),
iv AS (
    SELECT j.rn AS jrn, k.rn AS krn,
           SUM(x.n) AS n_sum, SUM(x.n_pos) AS pos_sum
    FROM b j JOIN b k ON j.rn <= k.rn
    JOIN b x ON x.rn BETWEEN j.rn AND k.rn
    GROUP BY j.rn, k.rn
),
minmat AS (
    SELECT i.rn AS irn, v.jrn,
           MIN(CAST(v.pos_sum AS DOUBLE) / v.n_sum) AS min_av
    FROM b i JOIN iv v ON v.jrn <= i.rn AND v.krn >= i.rn
    GROUP BY i.rn, v.jrn
),
iso AS (SELECT irn, MAX(min_av) AS iso_v FROM minmat GROUP BY irn)
SELECT CAST(b.bin AS INT) AS bin, CAST(b.n AS BIGINT) AS n,
       {round_sql('b.n_pos / CAST(b.n AS DOUBLE)')} AS pos_rate,
       {round_sql('iso.iso_v')} AS iso_rate
FROM b JOIN iso ON iso.irn = b.rn
""")
def isotonic_calibration_bins(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Weighted isotonic (PAVA) calibration fit of the frozen quality
    scorer's reliability bins, via the minimax closed form — the
    monotone recalibration map a production scorer would serve."""
    from pyspark.sql import Window

    binned = calibration_binned(spark, sf_dir)
    # <= 10 rows from here down: the single-partition window is a
    # bounded global op (conformal_interval_coverage precedent)
    b = binned.select(
        "bin", "n", "n_pos",
        F.row_number().over(Window.orderBy("bin")).alias("rn"))
    bj = b.select(F.col("rn").alias("jrn"))
    bk = b.select(F.col("rn").alias("krn"))
    bx = b.select(F.col("rn").alias("xrn"), F.col("n").alias("xn"),
                  F.col("n_pos").alias("xpos"))
    iv = (bj.join(bk, F.col("jrn") <= F.col("krn"))
          .join(bx, (F.col("xrn") >= F.col("jrn"))
                & (F.col("xrn") <= F.col("krn")))
          .groupBy("jrn", "krn")
          .agg(F.sum("xn").alias("n_sum"),
               F.sum("xpos").alias("pos_sum")))
    bi = b.select(F.col("rn").alias("irn"))
    minmat = (bi.join(iv, (F.col("jrn") <= F.col("irn"))
                      & (F.col("krn") >= F.col("irn")))
              .groupBy("irn", "jrn")
              .agg(F.min(F.col("pos_sum").cast("double")
                         / F.col("n_sum")).alias("min_av")))
    iso = minmat.groupBy("irn").agg(F.max("min_av").alias("iso_v"))
    return (b.join(iso, b.rn == iso.irn)
            .select(F.col("bin").cast("int").alias("bin"),
                    F.col("n").cast("long").alias("n"),
                    F.round(F.col("n_pos")
                            / F.col("n").cast("double"), 6)
                    .alias("pos_rate"),
                    F.round(F.col("iso_v"), 6).alias("iso_rate")))


# ---------------------------------------------------------------------------
# HITS hubs/authorities over the bipartite supplier -> part graph.
#
# Edges (l_suppkey, l_partkey, w = lineitem count); 3 iterations of
#   auth(p) = sum_s w * hub(s);   hub(s) = sum_p w * auth(p)
# each MAX-normalized (max of exact-derivation doubles is order-free,
# unlike an L2/L1 norm's global float sum).  Neighbor sums are
# position-sorted folds (copurchase_pagerank discipline) so the result
# is bitwise-stable under any partitioning.
#
# Scale shape: the edge build is one grouped pass over lineitem; each
# iteration is two key-partitioned joins + folds over the (bounded
# per-node degree) adjacency — Pregel's shape; the edge relation is
# checkpointed once and reused by all iterations.
# ---------------------------------------------------------------------------

_HITS_ITER = 3


def _hits_oracle() -> str:
    iters = []
    prev_h = "h0"
    prev_a = None
    for t in range(1, _HITS_ITER + 1):
        iters.append(f"""
ar{t} AS MATERIALIZED (
    SELECT e.p AS node,
           list_reduce(list_prepend(0.0,
               list(e.w * {prev_h}.v ORDER BY e.s)), (x, y) -> x + y) AS r
    FROM edges e JOIN {prev_h} ON {prev_h}.node = e.s
    GROUP BY e.p
),
am{t} AS (SELECT MAX(r) AS m FROM ar{t}),
a{t} AS MATERIALIZED (SELECT node, r / m AS v FROM ar{t} CROSS JOIN am{t}),
hr{t} AS MATERIALIZED (
    SELECT e.s AS node,
           list_reduce(list_prepend(0.0,
               list(e.w * a{t}.v ORDER BY e.p)), (x, y) -> x + y) AS r
    FROM edges e JOIN a{t} ON a{t}.node = e.p
    GROUP BY e.s
),
hm{t} AS (SELECT MAX(r) AS m FROM hr{t}),
h{t} AS MATERIALIZED (SELECT node, r / m AS v FROM hr{t} CROSS JOIN hm{t})""")
        prev_h = f"h{t}"
        prev_a = f"a{t}"
    return f"""
WITH edges AS MATERIALIZED (
    SELECT l_suppkey AS s, l_partkey AS p,
           CAST(COUNT(*) AS DOUBLE) AS w
    FROM lineitem GROUP BY 1, 2
),
h0 AS (SELECT DISTINCT s AS node, 1.0 AS v FROM edges),
{','.join(iters)}
SELECT 'hub' AS role, node AS node_id,
       {round_sql('v')} AS score FROM {prev_h}
UNION ALL
SELECT 'authority' AS role, node AS node_id,
       {round_sql('v')} AS score FROM {prev_a}
"""


@register("hits_supplier_part", _hits_oracle())
def hits_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration max-normalized HITS over the supplier->part
    purchase graph: hub suppliers stock the authoritative parts."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (li.groupBy(F.col("l_suppkey").alias("s"),
                        F.col("l_partkey").alias("p"))
             .agg(F.count("*").cast("double").alias("w")))
    n_part = spark.sparkContext.defaultParallelism
    edges = (edges.repartition(n_part, "p")
             .localCheckpoint(eager=True))
    hub = edges.select("s").distinct().select(
        F.col("s").alias("node"), F.lit(1.0).alias("v"))
    auth = None
    for _ in range(_HITS_ITER):
        ar = (edges.join(hub, edges.s == hub.node)
              .groupBy(edges.p.alias("node"))
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(
                      F.struct(edges.s.alias("s"),
                               (edges.w * F.col("v")).alias("c")))),
                  F.lit(0.0), lambda x, y: x + y["c"]).alias("r")))
        am = ar.agg(F.max("r").alias("m"))
        auth = (ar.crossJoin(F.broadcast(am))
                .select("node", (F.col("r") / F.col("m")).alias("v")))
        hr = (edges.join(auth, edges.p == auth.node)
              .groupBy(edges.s.alias("node"))
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(
                      F.struct(edges.p.alias("p"),
                               (edges.w * F.col("v")).alias("c")))),
                  F.lit(0.0), lambda x, y: x + y["c"]).alias("r")))
        hm = hr.agg(F.max("r").alias("m"))
        hub = (hr.crossJoin(F.broadcast(hm))
               .select("node", (F.col("r") / F.col("m")).alias("v")))
    return (hub.select(F.lit("hub").alias("role"),
                       F.col("node").alias("node_id"),
                       F.round("v", 6).alias("score"))
            .unionByName(
                auth.select(F.lit("authority").alias("role"),
                            F.col("node").alias("node_id"),
                            F.round("v", 6).alias("score"))))


# ---------------------------------------------------------------------------
# Randomized-response debiasing (local DP).
#
# Mechanism (per event): with p_keep = 3/4 report the TRUE
# high-value flag (value > 50), else report a fair coin — both
# branches driven by md5 uniforms so the two engines (and any replay)
# produce the identical privatized stream.  Per event type the
# debiased estimate of the true rate is
#   pi_hat = (obs_rate - (1 - p_keep) * 1/2) / p_keep
# and the audit reports it against the true rate the mechanism hid.
#
# Scale shape: pure projection + one grouped pass (5 output rows);
# the privatized column is exactly what a 100 TB pipeline would
# persist — the audit certifies the debiasing arithmetic on top.
# ---------------------------------------------------------------------------

_RR_KEEP_NUM, _RR_KEEP_DEN = 3, 4  # p_keep = 3/4
_RR_THRESH = 50.0


@register("randomized_response_debias", f"""
WITH flags AS (
    SELECT event_type,
           CASE WHEN value > {_RR_THRESH!r} THEN 1 ELSE 0 END AS truth,
           {md5_long_sql("'rrkeep:' || CAST(event_id AS VARCHAR)")}
             % {_RR_KEEP_DEN} AS keep_bucket,
           {md5_long_sql("'rrcoin:' || CAST(event_id AS VARCHAR)")}
             % 2 AS coin
    FROM events
),
reported AS (
    SELECT event_type, truth,
           CASE WHEN keep_bucket < {_RR_KEEP_NUM} THEN truth
                ELSE coin END AS report
    FROM flags
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(truth) AS BIGINT) AS n_true,
       CAST(SUM(report) AS BIGINT) AS n_reported,
       {round_sql('SUM(truth) / CAST(COUNT(*) AS DOUBLE)')} AS true_rate,
       {round_sql(f'''(SUM(report) / CAST(COUNT(*) AS DOUBLE)
            - (1.0 - {_RR_KEEP_NUM}.0 / {_RR_KEEP_DEN}.0) * 0.5)
           / ({_RR_KEEP_NUM}.0 / {_RR_KEEP_DEN}.0)''')} AS debiased_rate
FROM reported GROUP BY event_type
""")
def randomized_response_debias(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Warner randomized response over the high-value event flag:
    privatize with p_keep=3/4 + md5 fair coin, then debias the
    per-type rate — the local-DP sibling of dp_noisy_event_counts."""
    ev = load_table(spark, sf_dir, "events")
    truth = F.when(F.col("value") > _RR_THRESH, 1).otherwise(0)
    keep = (md5_long(F.concat(F.lit("rrkeep:"),
                              F.col("event_id").cast("string")))
            % _RR_KEEP_DEN)
    coin = (md5_long(F.concat(F.lit("rrcoin:"),
                              F.col("event_id").cast("string"))) % 2)
    rep = F.when(keep < _RR_KEEP_NUM, truth).otherwise(coin)
    p_keep = _RR_KEEP_NUM / _RR_KEEP_DEN
    flags = ev.select("event_type", truth.alias("truth"),
                      rep.alias("report"))
    obs_rate = F.sum("report") / F.count("*").cast("double")
    return (flags.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("truth").cast("long").alias("n_true"),
                 F.sum("report").cast("long").alias("n_reported"),
                 F.round(F.sum("truth")
                         / F.count("*").cast("double"), 6)
                 .alias("true_rate"),
                 F.round((obs_rate - F.lit((1.0 - p_keep) * 0.5))
                         / F.lit(p_keep), 6).alias("debiased_rate")))
