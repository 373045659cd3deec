"""Round-13 candidate queries (written in round 9) — experimentation
guardrails, bandit readouts, and classic optimization operators:

- srm_assignment_audit: sample-ratio-mismatch chi-square per
  assignment salt — the trust gate every experiment readout should
  run before any ATE is believed (Fabijan et al. 2019, public).
- ucb_arm_scores: UCB1 (Auer et al. 2002, public) score per
  event-type arm over 6-dp-rounded rewards — the explore/exploit
  allocation readout of the experimentation family.
- bayes_beta_binomial_arms: conjugate Beta(1,1) posterior over
  per-user purchase conversion per arm — closed-form posterior
  mean/sd, no sampling.
- skyline_pareto_front: the 2-D skyline (Borzsony/Kossmann/Stocker
  2001, public) over parts (min price, max size) via a sort-free
  staircase: per-price group maxima, two-phase inclusive running
  max, first-attainer pick — no O(n^2) dominance join anywhere.

Float discipline (registry.py docstring authoritative): rewards are
rounded to 6 dp FIRST and summed as DECIMAL(18,6) (winsorized-mean
precedent — exact, order-free); ln/sqrt run on shared per-row trees;
chi-square and posteriors are pure integer-moment expressions.
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
# Sample-ratio-mismatch audit — for each registered assignment salt
# (the real experiment split plus the three placebo salts), compare
# the customer arm counts against the designed 50/50 and report the
# 1-df chi-square:  chi2 = (n0 - n1)^2 / N  (algebraic reduction of
# sum (o-e)^2/e for two equal-probability arms).  A flagged REAL
# split means every downstream ATE readout is suspect; a flagged
# placebo means the hash family itself is broken.
#
# Scale shape: one grouped pass over customers per salt (4 bounded
# aggregates, no join); output is |salts| rows.
# ---------------------------------------------------------------------------

_SRM_CRIT = 3.841458820694124  # chi-square(1 df) 95% critical value


def _srm_oracle() -> str:
    from travel_data_pipeline_spark.queries_round11 import (
        _PLACEBO_SALTS,
    )

    blocks = []
    for label, salt in _PLACEBO_SALTS:
        hashed = md5_long_sql(f"'{salt}' || CAST(c_custkey AS VARCHAR)")
        arm = f"({hashed} % 2)"
        blocks.append(f"""
SELECT '{label}' AS assignment,
       CAST(SUM(CASE WHEN {arm} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ctrl,
       CAST(SUM(CASE WHEN {arm} = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_treat,
       {round_sql(
           f"CAST((SUM(CASE WHEN {arm} = 0 THEN 1 ELSE 0 END)"
           f" - SUM(CASE WHEN {arm} = 1 THEN 1 ELSE 0 END))"
           f" * (SUM(CASE WHEN {arm} = 0 THEN 1 ELSE 0 END)"
           f" - SUM(CASE WHEN {arm} = 1 THEN 1 ELSE 0 END)) AS DOUBLE)"
           f" / COUNT(*)")} AS chi2,
       CASE WHEN CAST((SUM(CASE WHEN {arm} = 0 THEN 1 ELSE 0 END)
                 - SUM(CASE WHEN {arm} = 1 THEN 1 ELSE 0 END))
                 * (SUM(CASE WHEN {arm} = 0 THEN 1 ELSE 0 END)
                 - SUM(CASE WHEN {arm} = 1 THEN 1 ELSE 0 END)) AS DOUBLE)
                 / COUNT(*) > {_SRM_CRIT!r}
            THEN 'srm' ELSE 'ok' END AS status
FROM customer""")
    return "\nUNION ALL\n".join(blocks)


@register("srm_assignment_audit", _srm_oracle)
def srm_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-df chi-square sample-ratio check of every assignment salt."""
    from travel_data_pipeline_spark.queries_round11 import (
        _PLACEBO_SALTS,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    outs = []
    for label, salt in _PLACEBO_SALTS:
        arm = (md5_long(F.concat(F.lit(salt),
                                 F.col("c_custkey").cast("string"))) % 2)
        agg = cust.agg(
            F.sum(F.when(arm == 0, 1).otherwise(0)).alias("n_ctrl"),
            F.sum(F.when(arm == 1, 1).otherwise(0)).alias("n_treat"),
            F.count("*").alias("n"))
        diff = (F.col("n_ctrl") - F.col("n_treat")).cast("double")
        chi2 = diff * diff / F.col("n")
        outs.append(agg.select(
            F.lit(label).alias("assignment"),
            F.col("n_ctrl").cast("long").alias("n_ctrl"),
            F.col("n_treat").cast("long").alias("n_treat"),
            F.round(chi2, 6).alias("chi2"),
            F.when(chi2 > _SRM_CRIT, "srm").otherwise("ok")
            .alias("status")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# UCB1 arm scores — each event type is an arm, its per-event `value`
# the reward (rounded to 6 dp first, so the per-arm sums accumulate
# EXACTLY in DECIMAL(18,6); the winsorized-mean precedent).  UCB1
# score = mean + sqrt(2 ln N / n_j); the argmax arm is the one a
# bandit scheduler would pull next.  ln and sqrt run on one shared
# per-row expression tree (entropy precedent).
#
# Scale shape: one grouped pass over events to |types| rows; the
# grand total broadcasts back.  The argmax flag compares each arm's
# ucb against the broadcast max of the SAME rounded column, so the
# flag is parity-stable by construction.
# ---------------------------------------------------------------------------


@register("ucb_arm_scores", f"""
WITH arms AS (
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST({round_sql('value')} AS DECIMAL(18,6))) AS s
    FROM events GROUP BY event_type
),
tot AS (SELECT SUM(n) AS big_n FROM arms),
scored AS (
    SELECT event_type, n,
           {round_sql('CAST(s AS DOUBLE) / n')} AS mean_reward,
           {round_sql('CAST(s AS DOUBLE) / n'
                      ' + sqrt(2.0 * ln(CAST(t.big_n AS DOUBLE))'
                      ' / CAST(n AS DOUBLE))')} AS ucb_score
    FROM arms CROSS JOIN tot t
)
SELECT event_type, CAST(n AS BIGINT) AS n_pulls, mean_reward, ucb_score,
       CASE WHEN ucb_score = (SELECT MAX(ucb_score) FROM scored)
            THEN 'pull' ELSE 'hold' END AS next_action
FROM scored
""")
def ucb_arm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 score per event-type arm; the argmax arm is flagged."""
    ev = load_table(spark, sf_dir, "events")
    arms = (ev.select("event_type",
                      F.round("value", 6).cast("decimal(18,6)").alias("r"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("r").alias("s")))
    tot = arms.agg(F.sum("n").alias("big_n"))
    mean = F.col("s").cast("double") / F.col("n")
    ucb = mean + F.sqrt(F.lit(2.0) * F.log(F.col("big_n").cast("double"))
                        / F.col("n").cast("double"))
    scored = (arms.crossJoin(F.broadcast(tot))
              .select("event_type", "n",
                      F.round(mean, 6).alias("mean_reward"),
                      F.round(ucb, 6).alias("ucb_score")))
    best = scored.agg(F.max("ucb_score").alias("best"))
    return (scored.crossJoin(F.broadcast(best))
            .select("event_type", F.col("n").cast("long").alias("n_pulls"),
                    "mean_reward", "ucb_score",
                    F.when(F.col("ucb_score") == F.col("best"), "pull")
                    .otherwise("hold").alias("next_action")))


# ---------------------------------------------------------------------------
# Beta-binomial posterior per arm — per-user purchase conversion under
# the md5 'exp:' split with a Beta(1,1) prior: the posterior is
# Beta(1 + conv, 1 + n - conv) in closed form, so mean and sd are pure
# integer-moment expressions (no sampling, no special functions):
#
#   mean = a / (a + b)
#   var  = a*b / ((a+b)^2 * (a+b+1))
#
# Scale shape: one distinct-user pass over events (user grain), one
# grouped aggregate to 2 rows.
# ---------------------------------------------------------------------------


def _bb_oracle() -> str:
    hashed = md5_long_sql("'exp:' || CAST(user_id AS VARCHAR)")
    arm = f"({hashed} % 2)"
    return f"""
WITH users AS (
    SELECT user_id, {arm} AS arm,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
    FROM events GROUP BY user_id, arm
),
m AS (
    SELECT arm, COUNT(*) AS n, SUM(converted) AS conv
    FROM users GROUP BY arm
)
SELECT CAST(arm AS BIGINT) AS arm, CAST(n AS BIGINT) AS n_users,
       CAST(conv AS BIGINT) AS n_converted,
       CAST(1 + conv AS BIGINT) AS alpha,
       CAST(1 + n - conv AS BIGINT) AS beta,
       {round_sql('CAST(1 + conv AS DOUBLE) / CAST(2 + n AS DOUBLE)')}
           AS post_mean,
       {round_sql(
           'sqrt(CAST(1 + conv AS DOUBLE) * CAST(1 + n - conv AS DOUBLE)'
           ' / (CAST(2 + n AS DOUBLE) * CAST(2 + n AS DOUBLE)'
           '    * CAST(3 + n AS DOUBLE)))')} AS post_sd
FROM m
"""


@register("bayes_beta_binomial_arms", _bb_oracle)
def bayes_beta_binomial_arms(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Closed-form Beta(1,1) posterior of per-user conversion per arm."""
    ev = load_table(spark, sf_dir, "events")
    arm = (md5_long(F.concat(F.lit("exp:"),
                             F.col("user_id").cast("string"))) % 2)
    users = (ev.groupBy("user_id", arm.alias("arm"))
             .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("converted")))
    m = users.groupBy("arm").agg(F.count("*").alias("n"),
                                 F.sum("converted").alias("conv"))
    a = (F.lit(1) + F.col("conv")).cast("double")
    b = (F.lit(1) + F.col("n") - F.col("conv")).cast("double")
    ab = (F.lit(2) + F.col("n")).cast("double")
    return m.select(
        F.col("arm").cast("long").alias("arm"),
        F.col("n").cast("long").alias("n_users"),
        F.col("conv").cast("long").alias("n_converted"),
        (F.lit(1) + F.col("conv")).cast("long").alias("alpha"),
        (F.lit(1) + F.col("n") - F.col("conv")).cast("long").alias("beta"),
        F.round(a / ab, 6).alias("post_mean"),
        F.round(F.sqrt(a * b / (ab * ab
                                * (F.lit(3) + F.col("n")).cast("double"))),
                6).alias("post_sd"))


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto front) over parts: minimize p_retailprice,
# maximize p_size.  A part is on the front iff no other part is
# both <= in price and >= in size with one strict.  Sort-free
# staircase instead of the O(n^2) dominance join:
#
#   1. per-price group maxima  (one groupBy)
#   2. inclusive running max of gmax along ascending price via
#      two_phase_ordered cummax (no single-partition sort)
#   3. a group is on the front iff its gmax ATTAINS the running max
#      AND it is the CHEAPEST group attaining that value (the
#      first-attainer pick — an exclusive-cummax test without lag)
#   4. join the (price, size) front back to parts; equal-(price,
#      size) duplicates all stay (neither strictly dominates).
#
# Scale shape: one groupBy to |distinct price| rows, the two-phase
# cummax, a |front|-bounded broadcast join back. Survives any corpus
# where |distinct price| shards — no dominance pair blowup.
# ---------------------------------------------------------------------------


@register("skyline_pareto_front", """
WITH g AS (
    SELECT p_retailprice AS price, MAX(p_size) AS gmax
    FROM part GROUP BY p_retailprice
),
st AS (
    SELECT price, gmax,
           MAX(gmax) OVER (ORDER BY price
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev
    FROM g
),
sky AS (SELECT price, gmax FROM st WHERE prev IS NULL OR gmax > prev)
SELECT p.p_partkey, p.p_retailprice AS price,
       CAST(p.p_size AS BIGINT) AS size
FROM part p JOIN sky s
  ON p.p_retailprice = s.price AND p.p_size = s.gmax
""")
def skyline_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts (min price, max size) via the two-phase
    running-max staircase; oracle uses the independent lag-window
    spelling of the same dominance semantics."""
    from travel_data_pipeline_spark.operators.windows import (
        two_phase_ordered,
    )

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size")
    g = (part.groupBy(F.col("p_retailprice").alias("price"))
         .agg(F.max("p_size").alias("gmax")))
    st = two_phase_ordered(g, [F.col("price").asc()],
                           bucket_on=F.col("price"),
                           cummax_cols={"gmax": "runmax"})
    # attained running max == skyline candidate; the cheapest group
    # per attained VALUE is the true front point (a later group with
    # the same size is dominated by this cheaper one)
    sky = (st.filter(F.col("gmax") == F.col("runmax"))
           .groupBy("gmax").agg(F.min("price").alias("price")))
    return (part.join(F.broadcast(sky),
                      (part.p_retailprice == sky.price)
                      & (part.p_size == sky.gmax))
            .select("p_partkey", F.col("p_retailprice").alias("price"),
                    F.col("p_size").cast("long").alias("size")))
