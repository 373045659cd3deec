"""Round-18 candidate queries (written in round 13).

Families this batch adds (all oracle-paired, all scale-shaped):

- **Inequality & concentration** (Theil T with between/within nation
  decomposition, Atkinson indices, Lorenz decile curve, Palma ratio):
  per-customer revenue is a DECIMAL money sum; global ranks go
  through two_phase_ordered (never a partitionless window over the
  customer relation). Float terms that need a corpus-scale sum (the
  ln terms of Theil/Atkinson) use the ROUNDED-DECIMAL-TERM SUM
  pattern introduced here: each per-row double term is rounded to 12
  dp with the Spark-parity rounding and cast to DECIMAL(38,12), so
  the aggregate is EXACT and order-free (associative) — the only way
  a float reduction stays deterministic across 1000 executors. The
  12-dp round-trip through binary doubles is lossless for |term| <=
  ~4e3 (double ulp at 4096 is 4.5e-13 < the 5e-13 half-spacing).

- **Goodness-of-fit & robust location over the daily grid**
  (chi-square GOF, KS vs fitted logistic, Hodges-Lehmann
  pseudo-median, biweight midvariance, Bowley quartile skewness,
  up/down runs test): the corpus-sized pass is the one groupBy onto
  the bounded day/dow grid; pair enumeration (Walsh averages) is a
  bounded grid self-join; medians/quantiles are exact integer
  cumulative-count selections in doubled units (no float order
  statistics).

- **Forecast evaluation** (theta method, MASE, MA(7) decomposition,
  max drawdown): integer-exact where possible (MASE and drawdown are
  pure integer arithmetic until the final division), EWMA-style
  order-pinned folds where a recurrence is inherent.

- **IR / ranking metrics** (rank-biased precision curve, Spearman
  footrule) over bounded top-k / 25-nation rankings.

- **DDSketch quantiles**: relative-error log buckets, CONSTANT
  per-shard state, associative merge — the mergeable-summary shape
  (SpaceSaving's sibling) with the (gamma-1)/(gamma+1) error bound
  reported per readout.

- **SQL-surface suites** (map HOFs, table-valued functions, bitwise
  aggregates, regexp surface, date-edge arithmetic, boolean
  aggregates) — capability-matrix entries pinning Spark surfaces to
  ANSI semantics.

- **LLM-curation text ops** (trigram LM perplexity via the linear
  zip-with-tail pairing, truncation loss, PII density, intra-doc
  duplicate sentences, char-trigram language signatures, stopword
  profile matrix).

- **A/B extras** (post-stratified arm means on the floor(value*100)
  integer metric; Wilson score CIs) and **geo bucketing** (haversine
  nation pairs over hash-derived coordinates; 1-degree grid-cell
  co-location join — the spatial equi-join shape).

Float discipline: integer/decimal moments everywhere; doubles appear
only in final shared-spelling expressions or rounded-decimal terms;
every rounded output goes through functions.parity.round_sql /
F.round(_, 6) with `+ 0.0` -0.0 guards where a zero can be signed.
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

# shared day-grid helpers (review r12: duplicated copies could
# silently desynchronize the grids)
from travel_data_pipeline_spark.queries_round16 import (  # noqa: E402
    _DAILY_SQL,
    _daily_counts,
)


def _rd_sql(expr: str, n: int = 12) -> str:
    """Rounded-decimal term for ORDER-FREE float sums (DuckDB side):
    Spark-parity round to ``n`` dp, then DECIMAL(38,n) so the SUM is
    exact and associative. Lossless round-trip for |expr| <= ~4e3 at
    n=12 (see module docstring)."""
    return f"CAST({round_sql(expr, n)} AS DECIMAL(38,{n}))"


def _rd(col, n: int = 12):
    """Spark twin of _rd_sql."""
    return F.round(col, n).cast(f"decimal(38,{n})")


# ---------------------------------------------------------------------------
# Batch A — inequality & concentration over per-customer revenue.
#
# rev is the DECIMAL(18,2) money sum per customer (order-free exact);
# ln/sqrt terms are rounded-decimal sums (module docstring); global
# ranks are two-phase. Revenue per customer tops out ~1e7, so
# (r/mu)*ln(r/mu) terms stay well under the 4e3 round-trip ceiling
# only after normalization — every term below is a RATIO times a log,
# bounded by ~n (shares sum to 1), never a raw money value.
# ---------------------------------------------------------------------------

_REV_SQL = """
rev AS (
    SELECT c.c_nationkey AS nk, o.o_custkey,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS r
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
)"""


def _rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (orders.join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("decimal(18,2)").alias("r")))


@register("theil_t_nation_decomposition", f"""
WITH {_REV_SQL},
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(r AS DECIMAL(28,2))) AS DOUBLE) AS s
    FROM rev
),
grp AS (
    SELECT nk, CAST(count(*) AS BIGINT) AS ng,
           CAST(SUM(CAST(r AS DECIMAL(28,2))) AS DOUBLE) AS sg
    FROM rev GROUP BY nk
),
terms AS (
    SELECT
        {_rd_sql('(CAST(v.r AS DOUBLE) / (t.s / t.n))'
                 ' * ln(CAST(v.r AS DOUBLE) / (t.s / t.n))')} AS tt,
        {_rd_sql('(CAST(v.r AS DOUBLE) / t.s)'
                 ' * ln(CAST(v.r AS DOUBLE) / (g.sg / g.ng))')} AS tw
    FROM rev v CROSS JOIN tot t JOIN grp g ON g.nk = v.nk
),
bterms AS (
    SELECT {_rd_sql('(g.sg / t.s) * ln((g.sg / g.ng) / (t.s / t.n))')}
             AS tb
    FROM grp g CROSS JOIN tot t
)
SELECT t.n AS n_customers,
       {round_sql('CAST((SELECT sum(tt) FROM terms) AS DOUBLE) / t.n')}
         + 0.0 AS theil_total,
       {round_sql('CAST((SELECT sum(tb) FROM bterms) AS DOUBLE)')}
         + 0.0 AS theil_between,
       {round_sql('CAST((SELECT sum(tw) FROM terms) AS DOUBLE)')}
         + 0.0 AS theil_within
FROM tot t
""")
def theil_t_nation_decomposition(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Theil T inequality of per-customer revenue with the exact
    between/within nation decomposition T = T_b + sum_g s_g T_g.
    Per-customer ln terms are rounded-decimal sums (order-free —
    the 100 TB float-reduction pattern); group stats are broadcast."""
    rev = _rev(spark, sf_dir)
    tot = rev.agg(F.count("*").cast("long").alias("n"),
                  F.sum(F.col("r").cast("decimal(28,2)"))
                  .cast("double").alias("s"))
    grp = rev.groupBy("nk").agg(
        F.count("*").cast("long").alias("ng"),
        F.sum(F.col("r").cast("decimal(28,2)")).cast("double")
        .alias("sg"))
    rd = F.col("r").cast("double")
    mu = F.col("s") / F.col("n")
    mug = F.col("sg") / F.col("ng")
    terms = (rev.crossJoin(F.broadcast(tot))
             .join(F.broadcast(grp), "nk")
             .select(_rd((rd / mu) * F.log(rd / mu)).alias("tt"),
                     _rd((rd / F.col("s"))
                         * F.log(rd / mug)).alias("tw")))
    sums = terms.agg(F.sum("tt").alias("stt"), F.sum("tw").alias("stw"))
    bsum = (grp.crossJoin(F.broadcast(tot))
            .select(_rd((F.col("sg") / F.col("s"))
                        * F.log(mug / mu)).alias("tb"))
            .agg(F.sum("tb").alias("stb")))
    return (tot.crossJoin(F.broadcast(sums)).crossJoin(F.broadcast(bsum))
            .select(F.col("n").alias("n_customers"),
                    (F.round(F.col("stt").cast("double") / F.col("n"), 6)
                     + 0.0).alias("theil_total"),
                    (F.round(F.col("stb").cast("double"), 6)
                     + 0.0).alias("theil_between"),
                    (F.round(F.col("stw").cast("double"), 6)
                     + 0.0).alias("theil_within")))


@register("atkinson_index_revenue", f"""
WITH {_REV_SQL},
terms AS (
    SELECT {_rd_sql('sqrt(CAST(r AS DOUBLE) / 10000.0)')} AS tsq,
           {_rd_sql('ln(CAST(r AS DOUBLE))')} AS tln
    FROM rev
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(r AS DECIMAL(28,2))) AS DOUBLE) AS s
    FROM rev
),
sums AS (
    SELECT CAST(sum(tsq) AS DOUBLE) AS ssq,
           CAST(sum(tln) AS DOUBLE) AS sln
    FROM terms
)
SELECT t.n AS n_customers,
       {round_sql('t.s / t.n', 2)} AS mu,
       {round_sql('1.0 - ((m.ssq / t.n) * (m.ssq / t.n) * 10000.0)'
                  ' / (t.s / t.n)')} + 0.0 AS atkinson_half,
       {round_sql('1.0 - exp(m.sln / t.n) / (t.s / t.n)')}
         + 0.0 AS atkinson_one
FROM tot t CROSS JOIN sums m
""")
def atkinson_index_revenue(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Atkinson inequality indices of per-customer revenue at
    eps=1/2 (via mean sqrt, revenue scaled by 1e4 to keep terms
    under the rounded-decimal ceiling) and eps=1 (via mean ln)."""
    rev = _rev(spark, sf_dir)
    rd = F.col("r").cast("double")
    terms = rev.select(_rd(F.sqrt(rd / 10000.0)).alias("tsq"),
                       _rd(F.log(rd)).alias("tln"))
    tot = rev.agg(F.count("*").cast("long").alias("n"),
                  F.sum(F.col("r").cast("decimal(28,2)"))
                  .cast("double").alias("s"))
    sums = terms.agg(F.sum("tsq").cast("double").alias("ssq"),
                     F.sum("tln").cast("double").alias("sln"))
    n, s = F.col("n"), F.col("s")
    mu = s / n
    msq = F.col("ssq") / n
    return (tot.crossJoin(F.broadcast(sums))
            .select(F.col("n").alias("n_customers"),
                    F.round(mu, 2).alias("mu"),
                    (F.round(F.lit(1.0)
                             - (msq * msq * 10000.0) / mu, 6)
                     + 0.0).alias("atkinson_half"),
                    (F.round(F.lit(1.0)
                             - F.exp(F.col("sln") / n) / mu, 6)
                     + 0.0).alias("atkinson_one")))


@register("lorenz_curve_deciles", f"""
WITH {_REV_SQL},
ranked AS (
    SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS i,
           count(*) OVER () AS n
    FROM rev
),
dec AS (
    -- // is DuckDB integer division ('/' floats even on BIGINTs and
    -- the INT cast would then ROUND — a decile-10 phantom bucket)
    SELECT CAST(((i - 1) * 10) // n AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(r AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS sd
    FROM ranked GROUP BY 1
),
cum AS (
    SELECT decile, n_cust,
           CAST(SUM(sd) OVER (ORDER BY decile) AS DOUBLE) AS c,
           CAST(SUM(sd) OVER () AS DOUBLE) AS tot
    FROM dec
)
SELECT decile, n_cust,
       {round_sql('c / tot')} + 0.0 AS cum_revenue_share
FROM cum ORDER BY decile
""")
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of per-customer revenue at decile cuts: the
    cumulative revenue share of the poorest d*10%. Ranks are
    two-phase (gini_customer_revenue's shape); the cumulative runs
    over 10 bounded decile rows."""
    from travel_data_pipeline_spark.operators.windows import (
        two_phase_ordered)

    rev = _rev(spark, sf_dir)
    ranked = two_phase_ordered(
        rev, [F.col("r").asc(), F.col("o_custkey").asc()],
        F.col("r").cast("double") + F.col("o_custkey") / F.lit(1e18),
        rank_col="i")
    n1 = ranked.agg(F.count("*").alias("n"))
    dec = (ranked.crossJoin(F.broadcast(n1))
           # DIV: exact integer division (a double '/' + int cast
           # could misbin a boundary rank by one ulp)
           .select(F.expr("CAST(((i - 1) * 10) DIV n AS INT)")
                   .alias("decile"), "r")
           .groupBy("decile")
           .agg(F.count("*").cast("long").alias("n_cust"),
                F.sum(F.col("r").cast("decimal(28,2)"))
                .cast("decimal(28,2)").alias("sd")))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding,
                                              Window.unboundedFollowing)
    return (dec
            .select("decile", "n_cust",
                    F.sum("sd").over(wc).cast("double").alias("c"),
                    F.sum("sd").over(wt).cast("double").alias("tot"))
            .select("decile", "n_cust",
                    (F.round(F.col("c") / F.col("tot"), 6) + 0.0)
                    .alias("cum_revenue_share"))
            .orderBy("decile"))


@register("palma_ratio_revenue", f"""
WITH {_REV_SQL},
ranked AS (
    SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS i,
           count(*) OVER () AS n
    FROM rev
),
sums AS (
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(SUM(CAST(r AS DECIMAL(28,2))) AS DOUBLE) AS s,
           CAST(SUM(CASE WHEN i * 10 <= 4 * n
                         THEN CAST(r AS DECIMAL(28,2)) END)
                AS DOUBLE) AS b40,
           CAST(SUM(CASE WHEN i > n - n // 10
                         THEN CAST(r AS DECIMAL(28,2)) END)
                AS DOUBLE) AS t10
    FROM ranked
)
SELECT n AS n_customers,
       {round_sql('t10 / s')} + 0.0 AS share_top10,
       {round_sql('b40 / s')} + 0.0 AS share_bottom40,
       {round_sql('t10 / b40')} + 0.0 AS palma_ratio
FROM sums
""")
def palma_ratio_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palma ratio: top-10% revenue share over bottom-40% share.
    Integer rank thresholds (i*10 <= 4n; i > n - n div 10) — no
    float quantiles; ranks two-phase."""
    from travel_data_pipeline_spark.operators.windows import (
        two_phase_ordered)

    rev = _rev(spark, sf_dir)
    ranked = two_phase_ordered(
        rev, [F.col("r").asc(), F.col("o_custkey").asc()],
        F.col("r").cast("double") + F.col("o_custkey") / F.lit(1e18),
        rank_col="i")
    n1 = ranked.agg(F.count("*").alias("n"))
    rdec = F.col("r").cast("decimal(28,2)")
    sums = (ranked.crossJoin(F.broadcast(n1))
            .agg(F.max("n").cast("long").alias("n"),
                 F.sum(rdec).cast("double").alias("s"),
                 F.sum(F.when(F.col("i") * 10 <= 4 * F.col("n"), rdec))
                 .cast("double").alias("b40"),
                 F.sum(F.when(
                     F.col("i") > F.col("n") - F.expr("n DIV 10"),
                     rdec))
                 .cast("double").alias("t10")))
    return sums.select(
        F.col("n").alias("n_customers"),
        (F.round(F.col("t10") / F.col("s"), 6) + 0.0)
        .alias("share_top10"),
        (F.round(F.col("b40") / F.col("s"), 6) + 0.0)
        .alias("share_bottom40"),
        (F.round(F.col("t10") / F.col("b40"), 6) + 0.0)
        .alias("palma_ratio"))


# ---------------------------------------------------------------------------
# Batch B — goodness-of-fit & robust location over the daily grid.
#
# The corpus pass is the one groupBy onto the bounded day/dow grid;
# medians and quantiles are exact integer cumulative-count selections
# in DOUBLED units (2x for medians of values, 4x for the MAD) so no
# float order statistic ever exists; pair enumeration (Walsh
# averages) is a bounded grid self-join. Bounded-grid windows are
# fine (the acf_daily_counts discipline).
# ---------------------------------------------------------------------------

_CHI2_FOLD = ("list_reduce(list_prepend(0.0, "
              "list((CAST(o AS DOUBLE) - t.n / 7.0)"
              " * (CAST(o AS DOUBLE) - t.n / 7.0)"
              " / (t.n / 7.0) ORDER BY dow)), (x, y) -> x + y)")


@register("chisq_gof_weekday", f"""
WITH daily AS ({_DAILY_SQL.format(where="")}),
dows AS (
    SELECT ((t % 7) + 7) % 7 AS dow, CAST(sum(cnt) AS BIGINT) AS o
    FROM daily GROUP BY 1
),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM dows)
SELECT t.n AS n_events, CAST(6 AS INT) AS df,
       {round_sql(_CHI2_FOLD)} + 0.0 AS chi2
FROM tot t CROSS JOIN dows GROUP BY t.n
""")
def chisq_gof_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of event volume against a uniform
    day-of-week law: 7 observed sums vs n/7 expected, the 7-term sum
    folded in dow order."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev)
    dows = (daily.groupBy(F.pmod(F.col("t"), F.lit(7)).alias("dow"))
            .agg(F.sum("cnt").cast("long").alias("o")))
    tot = dows.agg(F.sum("o").cast("long").alias("n"))
    nd = F.col("n").cast("double")
    term = ((F.col("o").cast("double") - nd / 7.0)
            * (F.col("o").cast("double") - nd / 7.0) / (nd / 7.0))
    return (dows.crossJoin(F.broadcast(tot))
            .groupBy("n")
            .agg(F.aggregate(
                F.array_sort(F.collect_list(F.struct("dow",
                                                     term.alias("c")))),
                F.lit(0.0), lambda a, x: a + x["c"]).alias("chi2raw"))
            .select(F.col("n").alias("n_events"),
                    F.lit(6).cast("int").alias("df"),
                    (F.round("chi2raw", 6) + 0.0).alias("chi2")))


@register("ks_logistic_daily", f"""
WITH daily AS ({_DAILY_SQL.format(where="")}),
mom AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cnt) AS BIGINT) AS s,
           CAST(sum(cnt * cnt) AS BIGINT) AS q
    FROM daily
),
grid AS (
    SELECT cnt AS v, CAST(count(*) AS BIGINT) AS m,
           CAST(sum(count(*)) OVER (ORDER BY cnt) AS BIGINT) AS cum
    FROM daily GROUP BY cnt
),
fit AS (
    SELECT n, CAST(s AS DOUBLE) / n AS mu,
           CASE WHEN n * q - s * s <= 0 THEN NULL
                ELSE (sqrt(CAST(n * q - s * s AS DOUBLE)) / n)
                     * sqrt(3.0) / pi() END AS sc
    FROM mom
),
dvals AS (
    SELECT f.n, f.mu, f.sc,
           greatest(
               abs(CAST(g.cum AS DOUBLE) / f.n
                   - 1.0 / (1.0 + exp(-(CAST(g.v AS DOUBLE) - f.mu)
                                      / f.sc))),
               abs(CAST(g.cum - g.m AS DOUBLE) / f.n
                   - 1.0 / (1.0 + exp(-(CAST(g.v AS DOUBLE) - f.mu)
                                      / f.sc)))) AS d
    FROM grid g CROSS JOIN fit f
)
SELECT n AS n_days, {round_sql('mu')} + 0.0 AS mu,
       {round_sql('sc')} + 0.0 AS scale,
       {round_sql('max(d)')} + 0.0 AS ks_d
FROM dvals GROUP BY n, mu, sc
""")
def ks_logistic_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov distance between the daily-count ECDF and a
    logistic CDF fitted by moments (mu = mean, scale = sd*sqrt(3)/pi).
    Exact integer moments; ECDF from cumulative counts over the
    bounded value grid; D uses both ECDF one-sided gaps."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev).localCheckpoint(eager=False)
    mom = daily.agg(F.count("*").cast("long").alias("n"),
                    F.sum("cnt").cast("long").alias("s"),
                    F.sum(F.col("cnt") * F.col("cnt")).cast("long")
                    .alias("q"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    grid = (daily.groupBy(F.col("cnt").alias("v"))
            .agg(F.count("*").cast("long").alias("m"))
            .withColumn("cum", F.sum("m").over(wv).cast("long")))
    nd = F.col("n").cast("double")
    varnum = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    fit = mom.select(
        "n", (F.col("s").cast("double") / nd).alias("mu"),
        F.when(varnum <= 0, F.lit(None).cast("double"))
        .otherwise((F.sqrt(varnum.cast("double")) / nd)
                   * F.sqrt(F.lit(3.0)) / F.lit(math.pi)).alias("sc"))
    fv = 1.0 / (1.0 + F.exp(-(F.col("v").cast("double") - F.col("mu"))
                            / F.col("sc")))
    d = F.greatest(
        F.abs(F.col("cum").cast("double") / F.col("n") - fv),
        F.abs((F.col("cum") - F.col("m")).cast("double")
              / F.col("n") - fv))
    return (grid.crossJoin(F.broadcast(fit))
            .groupBy("n", "mu", "sc")
            .agg(F.max(d).alias("draw"))
            .select(F.col("n").alias("n_days"),
                    (F.round("mu", 6) + 0.0).alias("mu"),
                    (F.round("sc", 6) + 0.0).alias("scale"),
                    (F.round("draw", 6) + 0.0).alias("ks_d")))


@register("hodges_lehmann_daily", f"""
WITH daily AS ({_DAILY_SQL.format(where="")}),
walsh AS (
    SELECT a.cnt + b.cnt AS s
    FROM daily a JOIN daily b ON a.t <= b.t
),
bys AS (
    SELECT s, CAST(count(*) AS BIGINT) AS c,
           CAST(sum(count(*)) OVER (ORDER BY s) AS BIGINT) AS cum
    FROM walsh GROUP BY s
),
m AS (SELECT CAST(sum(c) AS BIGINT) AS m,
             (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days
      FROM bys),
sel AS (
    SELECT m.n_days, m.m,
           min(CASE WHEN cum >= (m.m + 1) // 2 THEN s END) AS s_lo,
           min(CASE WHEN cum >= (m.m + 2) // 2 THEN s END) AS s_hi
    FROM bys CROSS JOIN m GROUP BY m.n_days, m.m
)
SELECT n_days, m AS n_pairs,
       {round_sql('CAST(s_lo + s_hi AS DOUBLE) / 4.0')}
         + 0.0 AS hl_estimate
FROM sel
""")
def hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of daily counts: the median of
    all d(d+1)/2 Walsh averages (x_i+x_j)/2, i <= j. Walsh sums stay
    INTEGER (2x units); the median is an exact cumulative-count
    selection — the only division is the final /4."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev).localCheckpoint(eager=False)
    a = daily.select(F.col("t").alias("ta"), F.col("cnt").alias("ca"))
    b = daily.select(F.col("t").alias("tb"), F.col("cnt").alias("cb"))
    walsh = (a.join(F.broadcast(b), F.col("ta") <= F.col("tb"))
             .select((F.col("ca") + F.col("cb")).alias("s")))
    ws = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    bys = (walsh.groupBy("s").agg(F.count("*").cast("long").alias("c"))
           .withColumn("cum", F.sum("c").over(ws).cast("long")))
    nd = daily.agg(F.count("*").cast("long").alias("n_days"))
    m = (bys.agg(F.sum("c").cast("long").alias("m"))
         .crossJoin(F.broadcast(nd)))
    sel = (bys.crossJoin(F.broadcast(m))
           .groupBy("n_days", "m")
           .agg(F.min(F.when(F.col("cum") >= F.expr("(m + 1) DIV 2"),
                             F.col("s"))).alias("s_lo"),
                F.min(F.when(F.col("cum") >= F.expr("(m + 2) DIV 2"),
                             F.col("s"))).alias("s_hi")))
    return sel.select(
        "n_days", F.col("m").alias("n_pairs"),
        (F.round((F.col("s_lo") + F.col("s_hi")).cast("double")
                 / 4.0, 6) + 0.0).alias("hl_estimate"))


_BW_NUM_FOLD = ("list_reduce(list_prepend(0.0, list(nt ORDER BY v)), "
                "(x, y) -> x + y)")
_BW_DEN_FOLD = ("list_reduce(list_prepend(0.0, list(dt ORDER BY v)), "
                "(x, y) -> x + y)")


@register("biweight_midvariance_daily", f"""
WITH daily AS ({_DAILY_SQL.format(where="")}),
grid AS (
    SELECT cnt AS v, CAST(count(*) AS BIGINT) AS m,
           CAST(sum(count(*)) OVER (ORDER BY cnt) AS BIGINT) AS cum
    FROM daily GROUP BY cnt
),
n1 AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM grid),
med AS (
    SELECT min(CASE WHEN cum >= (n1.n + 1) // 2 THEN v END)
           + min(CASE WHEN cum >= (n1.n + 2) // 2 THEN v END) AS m2
    FROM grid CROSS JOIN n1 GROUP BY n1.n
),
dev AS (
    SELECT abs(2 * g.v - med.m2) AS dv, CAST(sum(g.m) AS BIGINT) AS c
    FROM grid g CROSS JOIN med GROUP BY 1
),
devc AS (
    SELECT dv, CAST(sum(c) OVER (ORDER BY dv) AS BIGINT) AS cum
    FROM dev
),
mad AS (
    SELECT min(CASE WHEN cum >= (n1.n + 1) // 2 THEN dv END)
           + min(CASE WHEN cum >= (n1.n + 2) // 2 THEN dv END) AS mad4
    FROM devc CROSS JOIN n1 GROUP BY n1.n
),
terms AS (
    SELECT g.v,
           CASE WHEN abs(2.0 * (2 * g.v - med.m2)
                         / (9.0 * mad.mad4)) < 1.0
                THEN g.m * (CAST((2 * g.v - med.m2)
                                 * (2 * g.v - med.m2) AS DOUBLE) / 4.0)
                     * pow(1.0 - pow(2.0 * (2 * g.v - med.m2)
                                     / (9.0 * mad.mad4), 2), 4)
                ELSE 0.0 END AS nt,
           CASE WHEN abs(2.0 * (2 * g.v - med.m2)
                         / (9.0 * mad.mad4)) < 1.0
                THEN g.m * (1.0 - pow(2.0 * (2 * g.v - med.m2)
                                      / (9.0 * mad.mad4), 2))
                     * (1.0 - 5.0 * pow(2.0 * (2 * g.v - med.m2)
                                        / (9.0 * mad.mad4), 2))
                ELSE 0.0 END AS dt
    FROM grid g CROSS JOIN med CROSS JOIN mad
    WHERE mad.mad4 > 0
)
SELECT n1.n AS n_days,
       {round_sql('CAST(med.m2 AS DOUBLE) / 2.0')} + 0.0 AS median,
       {round_sql('CAST(mad.mad4 AS DOUBLE) / 4.0')} + 0.0 AS mad,
       CASE WHEN mad.mad4 = 0 THEN NULL
            ELSE {round_sql(f'n1.n * ({_BW_NUM_FOLD})'
                            f' / (({_BW_DEN_FOLD})'
                            f' * ({_BW_DEN_FOLD}))')} + 0.0
       END AS biweight_midvar
FROM n1 CROSS JOIN med CROSS JOIN mad LEFT JOIN terms ON TRUE
GROUP BY n1.n, med.m2, mad.mad4
""")
def biweight_midvariance_daily(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Tukey biweight midvariance of daily counts. Median and MAD are
    exact integer cumulative-count selections (2x / 4x units); u
    weights and the two folds are shared-spelling doubles over the
    bounded value grid, folded in value order."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev).localCheckpoint(eager=False)
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    grid = (daily.groupBy(F.col("cnt").alias("v"))
            .agg(F.count("*").cast("long").alias("m"))
            .withColumn("cum", F.sum("m").over(wv).cast("long"))
            .localCheckpoint(eager=False))
    n1 = grid.agg(F.sum("m").cast("long").alias("n"))
    med = (grid.crossJoin(F.broadcast(n1)).groupBy("n")
           .agg((F.min(F.when(F.col("cum")
                              >= F.expr("(n + 1) DIV 2"), F.col("v")))
                 + F.min(F.when(F.col("cum")
                                >= F.expr("(n + 2) DIV 2"),
                                F.col("v")))).alias("m2"))
           .select("m2"))
    dev = (grid.crossJoin(F.broadcast(med))
           .groupBy(F.abs(2 * F.col("v") - F.col("m2")).alias("dv"))
           .agg(F.sum("m").cast("long").alias("c")))
    wd = Window.orderBy("dv").rowsBetween(Window.unboundedPreceding, 0)
    devc = dev.withColumn("cum", F.sum("c").over(wd).cast("long"))
    mad = (devc.crossJoin(F.broadcast(n1)).groupBy("n")
           .agg((F.min(F.when(F.col("cum")
                              >= F.expr("(n + 1) DIV 2"), F.col("dv")))
                 + F.min(F.when(F.col("cum")
                                >= F.expr("(n + 2) DIV 2"),
                                F.col("dv")))).alias("mad4"))
           .select("mad4"))
    base = (grid.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(mad))
            .crossJoin(F.broadcast(n1)))
    dd = (2 * F.col("v") - F.col("m2"))
    u = 2.0 * dd / (9.0 * F.col("mad4"))
    inb = F.abs(u) < 1.0
    nt = F.when(inb & (F.col("mad4") > 0),
                F.col("m") * ((dd * dd).cast("double") / 4.0)
                * F.pow(1.0 - u * u, 4)).otherwise(F.lit(0.0))
    dt = F.when(inb & (F.col("mad4") > 0),
                F.col("m") * (1.0 - u * u)
                * (1.0 - 5.0 * u * u)).otherwise(F.lit(0.0))
    folded = (base.select("n", "m2", "mad4", "v",
                          nt.alias("nt"), dt.alias("dt"))
              .groupBy("n", "m2", "mad4")
              .agg(F.aggregate(
                  F.array_sort(F.collect_list(
                      F.struct("v", F.col("nt").alias("a")))),
                  F.lit(0.0), lambda a, x: a + x["a"]).alias("sn"),
                  F.aggregate(
                  F.array_sort(F.collect_list(
                      F.struct("v", F.col("dt").alias("a")))),
                  F.lit(0.0), lambda a, x: a + x["a"]).alias("sd")))
    return folded.select(
        F.col("n").alias("n_days"),
        (F.round(F.col("m2").cast("double") / 2.0, 6) + 0.0)
        .alias("median"),
        (F.round(F.col("mad4").cast("double") / 4.0, 6) + 0.0)
        .alias("mad"),
        F.when(F.col("mad4") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("n") * F.col("sn")
                           / (F.col("sd") * F.col("sd")), 6) + 0.0)
        .alias("biweight_midvar"))


@register("quartile_skew_daily", f"""
WITH daily AS ({_DAILY_SQL.format(where="")}),
grid AS (
    SELECT cnt AS v, CAST(count(*) AS BIGINT) AS m,
           CAST(sum(count(*)) OVER (ORDER BY cnt) AS BIGINT) AS cum
    FROM daily GROUP BY cnt
),
n1 AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM grid),
qs AS (
    SELECT n1.n,
           min(CASE WHEN cum >= (1 * n1.n + 3) // 4 THEN v END)
           + min(CASE WHEN cum >= least((1 * n1.n) // 4 + 1, n1.n)
                      THEN v END) AS q1_2,
           min(CASE WHEN cum >= (2 * n1.n + 3) // 4 THEN v END)
           + min(CASE WHEN cum >= least((2 * n1.n) // 4 + 1, n1.n)
                      THEN v END) AS q2_2,
           min(CASE WHEN cum >= (3 * n1.n + 3) // 4 THEN v END)
           + min(CASE WHEN cum >= least((3 * n1.n) // 4 + 1, n1.n)
                      THEN v END) AS q3_2
    FROM grid CROSS JOIN n1 GROUP BY n1.n
)
SELECT n AS n_days,
       CAST(q1_2 AS DOUBLE) / 2.0 AS q1,
       CAST(q2_2 AS DOUBLE) / 2.0 AS q2,
       CAST(q3_2 AS DOUBLE) / 2.0 AS q3,
       CASE WHEN q3_2 = q1_2 THEN NULL
            ELSE {round_sql('CAST(q3_2 + q1_2 - 2 * q2_2 AS DOUBLE)'
                            ' / CAST(q3_2 - q1_2 AS DOUBLE)')} + 0.0
       END AS bowley_skew
FROM qs
""")
def quartile_skew_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley quartile skewness of daily counts. Quartiles use the
    dual-rank convention qk = (v@ceil(kn/4) + v@(floor(kn/4)+1))/2 —
    exact integer selections in 2x units; the skew ratio is
    unit-free so no division by 2 ever happens."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev).localCheckpoint(eager=False)
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    grid = (daily.groupBy(F.col("cnt").alias("v"))
            .agg(F.count("*").cast("long").alias("m"))
            .withColumn("cum", F.sum("m").over(wv).cast("long")))
    n1 = grid.agg(F.sum("m").cast("long").alias("n"))

    def q2x(k: int):
        return (F.min(F.when(
            F.col("cum") >= F.expr(f"({k} * n + 3) DIV 4"),
            F.col("v")))
            + F.min(F.when(
                F.col("cum") >= F.least(
                    F.expr(f"({k} * n) DIV 4") + 1, F.col("n")),
                F.col("v"))))

    qs = (grid.crossJoin(F.broadcast(n1)).groupBy("n")
          .agg(q2x(1).alias("q1_2"), q2x(2).alias("q2_2"),
               q2x(3).alias("q3_2")))
    num = (F.col("q3_2") + F.col("q1_2") - 2 * F.col("q2_2"))
    den = (F.col("q3_2") - F.col("q1_2"))
    return qs.select(
        F.col("n").alias("n_days"),
        (F.col("q1_2").cast("double") / 2.0).alias("q1"),
        (F.col("q2_2").cast("double") / 2.0).alias("q2"),
        (F.col("q3_2").cast("double") / 2.0).alias("q3"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num.cast("double") / den.cast("double"), 6)
                   + 0.0).alias("bowley_skew"))


@register("runs_up_down_daily", f"""
WITH daily AS ({_DAILY_SQL.format(where="")}),
diffs AS (
    SELECT t, cnt - lag(cnt) OVER (ORDER BY t) AS d
    FROM daily
),
signs AS (
    SELECT t, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sg
    FROM diffs WHERE d IS NOT NULL AND d <> 0
),
runs AS (
    SELECT t, sg, lag(sg) OVER (ORDER BY t) AS prev
    FROM signs
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS m,
           CAST(sum(CASE WHEN prev IS NULL OR sg <> prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS r
    FROM runs
)
SELECT m + 1 AS n_obs, r AS n_runs,
       CASE WHEN 16 * (m + 1) - 29 <= 0 THEN NULL
            ELSE {round_sql('(CAST(r AS DOUBLE)'
                            ' - (2.0 * (m + 1) - 1.0) / 3.0)'
                            ' / sqrt((16.0 * (m + 1) - 29.0) / 90.0)')}
                 + 0.0
       END AS z
FROM agg
""")
def runs_up_down_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz up/down runs test on the daily count series:
    maximal blocks of equal difference sign (ties dropped) vs the
    exact randomness moments E = (2n-1)/3, V = (16n-29)/90."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev)
    wt = Window.orderBy("t")
    diffs = daily.select(
        "t", (F.col("cnt") - F.lag("cnt").over(wt)).alias("d"))
    signs = (diffs.filter(F.col("d").isNotNull() & (F.col("d") != 0))
             .select("t", F.when(F.col("d") > 0, 1).otherwise(-1)
                     .alias("sg")))
    runs = signs.select("sg", F.lag("sg").over(wt).alias("prev"))
    agg = runs.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.when(F.col("prev").isNull()
                     | (F.col("sg") != F.col("prev")), 1)
              .otherwise(0)).cast("long").alias("r"))
    nobs = F.col("m") + 1
    e = (2.0 * nobs - 1.0) / 3.0
    v = (16.0 * nobs - 29.0) / 90.0
    return agg.select(
        nobs.alias("n_obs"), F.col("r").alias("n_runs"),
        F.when(16 * nobs - 29 <= 0, F.lit(None).cast("double"))
        .otherwise(F.round((F.col("r").cast("double") - e)
                           / F.sqrt(v), 6) + 0.0).alias("z"))
