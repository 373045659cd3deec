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
    SELECT CAST(((i - 1) * 10) / n AS INT) AS decile,
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
           .select((((F.col("i") - 1) * 10) / F.col("n"))
                   .cast("int").alias("decile"), "r")
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
           CAST(SUM(CASE WHEN i > n - n / 10
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
                     F.col("i") > F.col("n")
                     - (F.col("n") / 10).cast("long"), rdec))
                 .cast("double").alias("t10")))
    return sums.select(
        F.col("n").alias("n_customers"),
        (F.round(F.col("t10") / F.col("s"), 6) + 0.0)
        .alias("share_top10"),
        (F.round(F.col("b40") / F.col("s"), 6) + 0.0)
        .alias("share_bottom40"),
        (F.round(F.col("t10") / F.col("b40"), 6) + 0.0)
        .alias("palma_ratio"))
