"""Flight-price pipeline recomposed Spark-first — SURVEY.md §3.3 / §7.

The reference's flight leg is: nested-JSON flatten
(_archive/flight_price_preprocessing.py:3-49) -> pd.concat union
(_archive/function_app.py:182-183) -> monthly-avg join + scoring + top-1
(_archive/flight_avg_merge.py:22-123). Here it is one declarative plan.

The flagship **flight-value query** (SURVEY.md §7 minimum slice) runs
the same shape on the driver's star schema: lineitem+orders as the
flight-shaped fact, part as the destination dimension:

    "for each destination (part), the cheapest current offer (lineitem)
     and its % deviation from that month's average price"

scan -> A3 grouped avg -> J4 multi-key left join -> X13 pct-change +
X15 direction -> W2 row_number top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions import scores
from travel_data_pipeline_spark.sources.readers import load_table


def flight_value_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: cheapest offer per part + deviation from monthly mean.

    Plan shape (verified with .explain("formatted")): ONE fact-fact
    join on l_orderkey, then ONE exchange on l_partkey serving BOTH
    window passes — the monthly mean as a window aggregate over
    (l_partkey, o_month) (HashPartitioning(l_partkey) satisfies that
    clustering) and the WindowGroupLimit-pushed row_number top-1.
    Decimal accumulation keeps the mean order-independent (oracle
    parity). No Python UDFs anywhere.

    A/B-measured against the two-stage min_by aggregation
    (flight_value_agg_query): this window form wins on a single node
    (1.9s vs 3.5s at sf0.1 — struct-buffer ObjectHashAggregate costs
    more than sorting 600k rows); the aggregation form wins at cluster
    scale (shuffles pre-aggregated rows instead of sorting the fact).
    Both are registered and oracle-verified.
    """
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    fact = (lineitem
            .join(orders.select("o_orderkey", "o_orderdate"),
                  lineitem["l_orderkey"] == orders["o_orderkey"])
            .select("l_orderkey", "l_linenumber", "l_partkey",
                    "l_extendedprice",
                    F.month("o_orderdate").alias("o_month"))
            .repartition("l_partkey"))

    w_month = Window.partitionBy("l_partkey", "o_month")
    avg_price = (F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .over(w_month).cast("double")
                 / F.count("l_extendedprice").over(w_month))

    from travel_data_pipeline_spark.operators.windows import topk_per_group

    joined = (fact
              .withColumn("avg_price", avg_price)
              .withColumn("pct_diff",
                          scores.flight_price_pct_diff(F.col("l_extendedprice"),
                                                       F.col("avg_price")))
              .withColumn("direction", scores.flight_direction(F.col("pct_diff")))
              .withColumn("value_score", scores.flight_score(F.col("pct_diff"))))
    cheapest = topk_per_group(
        joined, ["l_partkey"],
        [F.col("l_extendedprice").asc(), F.col("l_orderkey").asc(),
         F.col("l_linenumber").asc()],
        k=1)
    return cheapest.select(
        "l_partkey", "o_month",
        F.col("l_extendedprice").alias("best_price"),
        "avg_price", "pct_diff", "direction", "value_score")


def flight_value_agg_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scale formulation of the flagship: pure TWO-STAGE HASH
    AGGREGATION, no window sorts anywhere.

      stage 1: groupBy(l_partkey, o_month) computing the decimal-exact
               monthly mean AND the month's cheapest offer via
               min_by(payload, struct(price, orderkey, linenumber))
               (the struct comparator is the total order the window
               form sorts by);
      stage 2: groupBy(l_partkey) min_by over the per-month champions.

    Both stages are partial-aggregatable (map-side combine): at 100 TB
    this shuffles one pre-aggregated row per (part, month) instead of
    sorting every lineitem. Identical output to flight_value_query
    (same oracle).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    fact = (lineitem
            .join(orders.select("o_orderkey", "o_orderdate"),
                  lineitem["l_orderkey"] == orders["o_orderkey"])
            .select("l_orderkey", "l_linenumber", "l_partkey",
                    "l_extendedprice",
                    F.month("o_orderdate").alias("o_month")))

    order_key = F.struct("l_extendedprice", "l_orderkey", "l_linenumber")
    monthly = (fact.groupBy("l_partkey", "o_month")
               .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                     .cast("double") / F.count("l_extendedprice"))
                    .alias("avg_price"),
                    F.min_by(order_key, order_key).alias("best")))

    champion = F.struct(F.col("best"), F.col("o_month"), F.col("avg_price"))
    per_part = (monthly.groupBy("l_partkey")
                .agg(F.min_by(champion, F.col("best")).alias("c")))

    best_price = F.col("c.best.l_extendedprice")
    avg_price = F.col("c.avg_price")
    pct_diff = scores.flight_price_pct_diff(best_price, avg_price)
    return per_part.select(
        "l_partkey",
        F.col("c.o_month").alias("o_month"),
        best_price.alias("best_price"),
        avg_price.alias("avg_price"),
        pct_diff.alias("pct_diff"),
        scores.flight_direction(pct_diff).alias("direction"),
        scores.flight_score(pct_diff).alias("value_score"))


# P4 — the reference's Korean display-name dictionary, applied at the
# output EDGE only (_archive/flight_avg_merge.py:59-64 renames
# city_code/month/avg_price; :109 renames final_city_code). Internal
# plan columns stay ASCII everywhere; display names exist solely in
# the final projection, so no join key or filter ever sees one.
DISPLAY_RENAMES = {
    "l_partkey": "도착_도시코드",
    "o_month": "월",
    "avg_price": "평균가격",
    "final_city_code": "도착_도시코드_3자리",
}


def edge_rename(df: DataFrame,
                mapping: dict[str, str] | None = None) -> DataFrame:
    """Rename internal columns to display names at the output edge.
    Missing columns are skipped (the reference's rename_dict behaves
    the same way — pandas.rename ignores absent keys)."""
    mapping = DISPLAY_RENAMES if mapping is None else mapping
    cols = set(df.columns)
    return df.select(*[
        F.col(c).alias(mapping[c]) if c in mapping else F.col(c)
        for c in df.columns if c in cols])


def flight_monthly_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 monthly mean + the P4 edge rename layer: the per-destination
    monthly average price table the reference publishes, with its
    Korean display headers. Decimal accumulation keeps the mean
    order-independent (oracle parity)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    monthly = (lineitem
               .join(orders.select("o_orderkey", "o_orderdate"),
                     lineitem["l_orderkey"] == orders["o_orderkey"])
               .groupBy(F.col("l_partkey"),
                        F.month("o_orderdate").alias("o_month"))
               .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                     .cast("double") / F.count("l_extendedprice"))
                    .alias("avg_price")))
    return edge_rename(monthly)


FLIGHT_MONTHLY_DISPLAY_ORACLE = """
SELECT l.l_partkey AS "도착_도시코드",
       CAST(EXTRACT(month FROM o.o_orderdate) AS INT) AS "월",
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         / COUNT(l.l_extendedprice) AS "평균가격"
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


FLIGHT_VALUE_ORACLE = """
WITH fact AS (
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_extendedprice,
           EXTRACT(month FROM o.o_orderdate) AS o_month
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), monthly_avg AS (
    SELECT l_partkey, o_month,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(l_extendedprice) AS avg_price
    FROM fact GROUP BY l_partkey, o_month
), joined AS (
    SELECT f.*, m.avg_price,
           ROUND((f.l_extendedprice - m.avg_price) / m.avg_price * 100.0, 2)
             AS pct_diff
    FROM fact f LEFT JOIN monthly_avg m
      ON f.l_partkey = m.l_partkey AND f.o_month = m.o_month
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_partkey
        ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) AS rn
    FROM joined
)
SELECT l_partkey, CAST(o_month AS INT) AS o_month,
       l_extendedprice AS best_price, avg_price, pct_diff,
       CASE WHEN pct_diff > 0 THEN '상승'
            WHEN pct_diff < 0 THEN '하락' ELSE '동일' END AS direction,
       CASE WHEN pct_diff > 0 THEN -1
            WHEN pct_diff < 0 THEN 1 ELSE 0 END AS value_score
FROM ranked WHERE rn = 1
"""
