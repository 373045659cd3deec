"""Round-6 candidate queries (written in round 5; they enter the
driver sample head in round 6) — graph traversal, Pareto/ABC
classification, session path mining, DAU/WAU/MAU, readability
scoring, windowed funnel stages, per-source distinctive terms
(log-odds), and user lifecycle states.

Same discipline as every other module: exact integer/decimal moments,
order-pinned folds for float sums, shared per-row double spellings,
Spark-parity rounding (functions/parity.round_sql) on rounded oracle
doubles, broadcast for every dimension-sized side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions.parity import round_sql
from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# NOTE: queries_affinity is imported lazily (inside the BFS oracle
# lambda and query body) — an eager module-level import would be
# circular whenever queries_affinity itself is the entry module
# (affinity -> registry -> round6 -> partially-initialized affinity).

# ---------------------------------------------------------------------------
# BFS hop distance over the co-purchase graph: the classic bounded
# graph traversal (GraphX/Pregel shape) — K unrolled frontier joins,
# min-hop per vertex, from a deterministic source (the highest-degree
# part, ties -> smallest partkey). All integers, so the oracle is a
# bounded recursive CTE with UNION dedup.
# ---------------------------------------------------------------------------

_BFS_HOPS = 3


def _bfs_oracle() -> str:
    from travel_data_pipeline_spark.queries_affinity import (
        _PAIRS_SQL,
    )

    return f"""
WITH RECURSIVE {_PAIRS_SQL},
edges AS (
    SELECT part_a AS s, part_b AS d FROM pair_counts
    UNION ALL
    SELECT part_b AS s, part_a AS d FROM pair_counts
),
deg AS (SELECT s, count(*) AS degree FROM edges GROUP BY s),
src AS (
    SELECT s FROM deg ORDER BY degree DESC, s LIMIT 1
),
walk(part, hop) AS (
    SELECT s, 0 FROM src
    UNION
    SELECT e.d, w.hop + 1
    FROM walk w JOIN edges e ON e.s = w.part
    WHERE w.hop < {_BFS_HOPS}
)
SELECT part AS l_partkey, CAST(min(hop) AS INT) AS hop
FROM walk GROUP BY part
"""


@register("copurchase_bfs_hops", _bfs_oracle)
def copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop count from the highest-degree part to every part
    within 3 hops of the support-filtered co-purchase graph.

    The edge relation is localCheckpointed once (Pregel's "load the
    graph once"); each hop is one frontier join + one min-hop
    aggregate + one anti-join keyed on the vertex — the shuffle count
    is the hop bound, independent of graph size. The traversal itself
    is the general operators.graph.bfs_hops iterative loop (VERDICT
    r05 #4: convergence check + periodic lineage checkpoint, depth a
    parameter); this query pins it at max_hops=3 as the recursive-CTE
    oracle anchor, and the unbounded/deep form is pytest-pinned in
    tests/test_round6.py."""
    from travel_data_pipeline_spark.operators.graph import bfs_hops
    from travel_data_pipeline_spark.queries_affinity import (
        _order_items,
        _pair_counts,
    )

    items = _order_items(spark, sf_dir)
    pairs = _pair_counts(items)
    edges = (pairs.select(F.col("part_a").alias("s"),
                          F.col("part_b").alias("d"))
             .unionAll(pairs.select(F.col("part_b").alias("s"),
                                    F.col("part_a").alias("d")))
             .localCheckpoint(eager=True))
    deg = edges.groupBy("s").agg(F.count("*").alias("degree"))
    src = (deg.orderBy(F.col("degree").desc(), "s").limit(1)
           .select(F.col("s").alias("vertex"), F.lit(0).alias("hop")))

    reached = bfs_hops(edges, src, max_hops=_BFS_HOPS)
    return reached.select(F.col("vertex").alias("l_partkey"),
                          F.col("hop").cast("int").alias("hop"))


# ---------------------------------------------------------------------------
# ABC / Pareto classification of parts by revenue: sort by exact
# decimal revenue, cumulative share thresholds 80% / 95%. The BI
# classic; money stays DECIMAL until the final share division.
# ---------------------------------------------------------------------------


@register("abc_pareto_classes", """
WITH rev AS (
    SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(revenue) AS total FROM rev),
ranked AS (
    SELECT l_partkey, revenue,
           SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum
    FROM rev
),
classed AS (
    SELECT l_partkey, revenue,
           CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.80
                THEN 'A'
                WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.95
                THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked CROSS JOIN tot
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(revenue) AS DOUBLE) AS class_revenue
FROM classed GROUP BY abc_class
""")
def abc_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto ABC classes over part revenue (A: first 80% of revenue,
    B: to 95%, C: tail).

    Revenue and the running total are exact DECIMAL sums (order-
    independent, then a deterministic (revenue DESC, partkey)
    cumulative order); the only doubles are the two threshold
    comparisons, spelled identically in the oracle.

    The running revenue is TWO-PHASE (two_phase_ordered, VERDICT r05
    #2 — the earlier docstring's "still small at 100 TB" was wrong:
    |part| = SF x 200k, ~20B rows at the 100 TB design point):
    quantile buckets on -revenue, bucket-local cumsum, broadcast
    per-bucket sum offsets — no SinglePartition sort anywhere."""
    from travel_data_pipeline_spark.operators.windows import (
        two_phase_ordered)

    li = load_table(spark, sf_dir, "lineitem")
    # r14: the part-grain decimal aggregation feeds FOUR passes (the
    # two-phase quantile probe, per-bucket stats, the tagged cumsum
    # pass, and the grand total) — materialize it once instead of
    # re-running the lineitem groupBy per consumer
    rev = (li.groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                      * (1 - F.col("l_discount").cast("decimal(18,2)")))
                .alias("revenue"))
           .localCheckpoint(eager=True))
    tot = rev.agg(F.sum("revenue").alias("total"))
    cum = two_phase_ordered(
        rev, [F.col("revenue").desc(), F.col("l_partkey").asc()],
        -F.col("revenue").cast("double") + F.col("l_partkey") / F.lit(1e18),
        cumsum_cols={"revenue": "cum"}, materialize=False)
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    classed = (cum.crossJoin(F.broadcast(tot))
               .select("l_partkey", "revenue",
                       F.when(share <= 0.80, "A")
                       .when(share <= 0.95, "B")
                       .otherwise("C").alias("abc_class")))
    return (classed.groupBy("abc_class")
            .agg(F.count("*").cast("long").alias("n_parts"),
                 F.sum("revenue").cast("double").alias("class_revenue")))


# ---------------------------------------------------------------------------
# Session path mining: sessionize (30-min gap), take each session's
# first 3 event types as its path signature, report the top-10 paths.
# The product-analytics "sankey" feeder. Paths are ordered-fold
# strings — (ts, event_id)-sorted so the signature is deterministic.
# ---------------------------------------------------------------------------

_PATH_LEN, _PATH_TOPK = 3, 10


@register("session_top_paths", f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
    SELECT user_id, ts, event_id, event_type,
           CAST(SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_seq
    FROM flagged
),
paths AS (
    SELECT user_id, session_seq,
           array_to_string(
               (list(event_type ORDER BY ts, event_id))[1:{_PATH_LEN}],
               '>') AS path
    FROM numbered GROUP BY user_id, session_seq
),
counted AS (
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
)
SELECT path, n_sessions FROM counted
ORDER BY n_sessions DESC, path LIMIT {_PATH_TOPK}
""")
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session-opening paths (first 3 event types per 30-min
    session).

    Sessionization is the engine's standard lag+cumsum spelling keyed
    on the user; the path signature folds a (ts, event_id)-sorted
    list, so ties at the same timestamp are pinned. The final top-k
    is a TakeOrderedAndProject over the tiny path-count relation."""
    ev = load_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(F.unix_micros("ts")
               - F.unix_micros(F.lag("ts").over(wlag)) > 1_800_000_000,
               1).otherwise(0).alias("new_session"))
    wcum = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    numbered = flagged.withColumn(
        "session_seq", F.sum("new_session").over(wcum).cast("long"))
    paths = (numbered.groupBy("user_id", "session_seq")
             .agg(F.array_join(
                 F.slice(F.transform(
                     F.array_sort(F.collect_list(F.struct(
                         "ts", "event_id", "event_type"))),
                     lambda s: s["event_type"]), 1, _PATH_LEN),
                 ">").alias("path")))
    counted = paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions"))
    return (counted.orderBy(F.col("n_sessions").desc(), "path")
            .limit(_PATH_TOPK))


# ---------------------------------------------------------------------------
# DAU / WAU / MAU: exact distinct actives per day with trailing 7- and
# 30-day windows. Distinct-over-range-frame isn't expressible as a
# window, so the scalable spelling is the (day, user) activity
# relation range-joined against the (tiny, broadcast) day grid —
# blowup is bounded by 30x the DAILY activity relation, never the raw
# events.
# ---------------------------------------------------------------------------


@register("dau_wau_mau", """
WITH activity AS (
    SELECT DISTINCT
           date_diff('day', DATE '1970-01-01',
                     CAST(date_trunc('day', ts) AS DATE)) AS day,
           user_id
    FROM events
),
grid AS (SELECT DISTINCT day FROM activity),
joined AS (
    SELECT g.day AS day, a.day AS a_day, a.user_id
    FROM grid g JOIN activity a
      ON a.day BETWEEN g.day - 29 AND g.day
)
SELECT strftime(DATE '1970-01-01' + day * INTERVAL 1 DAY, '%Y-%m-%d')
         AS day,
       CAST(count(DISTINCT CASE WHEN a_day = day THEN user_id END)
            AS BIGINT) AS dau,
       CAST(count(DISTINCT CASE WHEN a_day >= day - 6 THEN user_id END)
            AS BIGINT) AS wau,
       CAST(count(DISTINCT user_id) AS BIGINT) AS mau
FROM joined GROUP BY day
""")
def dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    activity = (ev.select(
        F.datediff(F.date_trunc("day", "ts").cast("date"),
                   F.lit("1970-01-01").cast("date")).alias("day"),
        "user_id").distinct())
    grid = activity.select("day").distinct() \
        .withColumnRenamed("day", "g_day")
    joined = activity.join(
        F.broadcast(grid),
        (F.col("day") >= F.col("g_day") - 29)
        & (F.col("day") <= F.col("g_day")))
    out = joined.groupBy("g_day").agg(
        F.count_distinct(F.when(F.col("day") == F.col("g_day"),
                                F.col("user_id"))).cast("long")
        .alias("dau"),
        F.count_distinct(F.when(F.col("day") >= F.col("g_day") - 6,
                                F.col("user_id"))).cast("long")
        .alias("wau"),
        F.count_distinct("user_id").cast("long").alias("mau"))
    return out.select(
        F.date_format(F.date_add(F.lit("1970-01-01").cast("date"),
                                 F.col("g_day").cast("int")),
                      "yyyy-MM-dd").alias("day"),
        "dau", "wau", "mau")


# ---------------------------------------------------------------------------
# Readability scoring (Flesch reading ease with the standard
# vowel-group syllable heuristic) — corpus quality filtering signal.
# Counts are exact integers from shared-semantics regexes ('[.!?]+'
# sentence runs, '[aeiouy]+' vowel groups — identical character-class
# behavior in Java and RE2/DuckDB); the score is one per-row double
# expression, parity-rounded.
# ---------------------------------------------------------------------------


@register("text_readability_scores", f"""
WITH counts AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split(trim(regexp_replace(
               lower(text), '\\s+', ' ', 'g')), ' '), x -> x <> ''))
             AS BIGINT) AS n_words,
           CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
             AS BIGINT) AS n_sents,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
             AS BIGINT) AS n_syllables
    FROM documents
)
SELECT doc_id, n_words, n_sents, n_syllables,
       CASE WHEN n_words = 0 THEN NULL
            ELSE {round_sql(
                "206.835 - 1.015 * (CAST(n_words AS DOUBLE)"
                " / CAST(n_sents AS DOUBLE))"
                " - 84.6 * (CAST(n_syllables AS DOUBLE)"
                " / CAST(n_words AS DOUBLE))")} + 0.0
       END AS flesch
FROM counts
""")
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_pipeline_spark.operators.text import token_array

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id",
        F.size(token_array(F.col("text"))).cast("long").alias("n_words"),
        F.greatest(F.lit(1), F.size(
            F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))))
        .cast("long").alias("n_sents"),
        F.size(F.regexp_extract_all(F.lower("text"),
                                    F.lit("[aeiouy]+"), F.lit(0)))
        .cast("long").alias("n_syllables"))
    flesch = (206.835
              - 1.015 * (F.col("n_words").cast("double")
                         / F.col("n_sents").cast("double"))
              - 84.6 * (F.col("n_syllables").cast("double")
                        / F.col("n_words").cast("double")))
    return counts.select(
        "doc_id", "n_words", "n_sents", "n_syllables",
        F.when(F.col("n_words") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(flesch, 6) + 0.0).alias("flesch"))


# ---------------------------------------------------------------------------
# Windowed funnel stages: view -> click within 7 days of the first
# view -> purchase within 7 days of that click. Stage timestamps are
# exact integer microseconds; each stage is one grouped min + one key
# join — the sequential-constraint funnel real product analytics run.
# ---------------------------------------------------------------------------

_STAGE_WINDOW_US = 7 * 86_400_000_000


@register("funnel_windowed_stages", f"""
WITH first_view AS (
    SELECT user_id, min(epoch_us(ts)) AS v_us
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
first_click AS (
    SELECT f.user_id, f.v_us, min(epoch_us(e.ts)) AS c_us
    FROM first_view f
    JOIN events e ON e.user_id = f.user_id AND e.event_type = 'click'
     AND epoch_us(e.ts) >= f.v_us
     AND epoch_us(e.ts) <= f.v_us + {_STAGE_WINDOW_US}
    GROUP BY f.user_id, f.v_us
),
first_purchase AS (
    SELECT c.user_id, min(epoch_us(e.ts)) AS p_us
    FROM first_click c
    JOIN events e ON e.user_id = c.user_id
     AND e.event_type = 'purchase'
     AND epoch_us(e.ts) >= c.c_us
     AND epoch_us(e.ts) <= c.c_us + {_STAGE_WINDOW_US}
    GROUP BY c.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM first_view) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM first_click) AS n_click_7d,
       (SELECT CAST(count(*) AS BIGINT) FROM first_purchase)
         AS n_purchase_7d
""")
def funnel_windowed_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"))
    first_view = (ev.filter(F.col("event_type") == "view")
                  .groupBy("user_id").agg(F.min("tus").alias("v_us")))
    clicks = ev.filter(F.col("event_type") == "click")
    first_click = (first_view.join(clicks, "user_id")
                   .filter((F.col("tus") >= F.col("v_us"))
                           & (F.col("tus")
                              <= F.col("v_us") + _STAGE_WINDOW_US))
                   .groupBy("user_id", "v_us")
                   .agg(F.min("tus").alias("c_us")))
    purchases = ev.filter(F.col("event_type") == "purchase")
    first_purchase = (first_click.join(purchases, "user_id")
                      .filter((F.col("tus") >= F.col("c_us"))
                              & (F.col("tus")
                                 <= F.col("c_us") + _STAGE_WINDOW_US))
                      .groupBy("user_id")
                      .agg(F.min("tus").alias("p_us")))
    nv = first_view.agg(F.count("*").cast("long").alias("n_view"))
    nc = first_click.agg(F.count("*").cast("long").alias("n_click_7d"))
    np_ = first_purchase.agg(
        F.count("*").cast("long").alias("n_purchase_7d"))
    return (F.broadcast(nv).crossJoin(F.broadcast(nc))
            .crossJoin(np_))


# ---------------------------------------------------------------------------
# Distinctive terms per source: +1-smoothed log-odds of each term's
# in-source vs rest-of-corpus rate, top-5 per source — the corpus-
# contrast readout used to audit source mixture composition. All
# counts exact integers; the log-odds is one per-row double
# expression over them.
# ---------------------------------------------------------------------------

_LO_TOPK = 5


@register("source_term_log_odds", f"""
WITH toks AS (
    SELECT source, unnest(list_filter(string_split(trim(regexp_replace(
               lower(text), '\\s+', ' ', 'g')), ' '), x -> x <> ''))
             AS term
    FROM documents
),
cell AS (SELECT source, term, count(*) AS y_s FROM toks GROUP BY 1, 2),
src_tot AS (SELECT source, sum(y_s) AS n_s FROM cell GROUP BY source),
term_tot AS (SELECT term, sum(y_s) AS y_t FROM cell GROUP BY term),
all_tot AS (SELECT sum(y_s) AS n_t FROM cell),
scored AS (
    SELECT c.source, c.term, CAST(c.y_s AS BIGINT) AS y_s,
           {round_sql(
               "ln((CAST(c.y_s AS DOUBLE) + 1.0)"
               " / (CAST(s.n_s AS DOUBLE) - CAST(c.y_s AS DOUBLE) + 1.0))"
               " - ln((CAST(t.y_t AS DOUBLE) - CAST(c.y_s AS DOUBLE) + 1.0)"
               " / (CAST(a.n_t AS DOUBLE) - CAST(s.n_s AS DOUBLE)"
               "    - (CAST(t.y_t AS DOUBLE) - CAST(c.y_s AS DOUBLE))"
               "    + 1.0))")} + 0.0 AS log_odds
    FROM cell c
    JOIN src_tot s USING (source)
    JOIN term_tot t USING (term)
    CROSS JOIN all_tot a
)
SELECT source, term, y_s, log_odds FROM (
    SELECT source, term, y_s, log_odds,
           row_number() OVER (PARTITION BY source
                              ORDER BY log_odds DESC, term) AS rk
    FROM scored
) WHERE rk <= {_LO_TOPK}
""")
def source_term_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from travel_data_pipeline_spark.operators.text import token_array

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(token_array(F.col("text"))).alias("term"))
    cell = toks.groupBy("source", "term").agg(F.count("*").alias("y_s"))
    src_tot = cell.groupBy("source").agg(F.sum("y_s").alias("n_s"))
    term_tot = cell.groupBy("term").agg(F.sum("y_s").alias("y_t"))
    all_tot = cell.agg(F.sum("y_s").alias("n_t"))
    ys = F.col("y_s").cast("double")
    ns = F.col("n_s").cast("double")
    yt = F.col("y_t").cast("double")
    nt = F.col("n_t").cast("double")
    lo = (F.log((ys + 1.0) / (ns - ys + 1.0))
          - F.log((yt - ys + 1.0) / (nt - ns - (yt - ys) + 1.0)))
    scored = (cell
              .join(F.broadcast(src_tot), "source")
              .join(term_tot, "term")
              .crossJoin(F.broadcast(all_tot))
              .select("source", "term",
                      F.col("y_s").cast("long").alias("y_s"),
                      (F.round(lo, 6) + 0.0).alias("log_odds")))
    w = Window.partitionBy("source").orderBy(F.col("log_odds").desc(),
                                             "term")
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _LO_TOPK)
            .select("source", "term", "y_s", "log_odds"))


# ---------------------------------------------------------------------------
# User lifecycle states per active day: 'new' on the first day,
# 'resurrected' after a >14-day gap, else 'active' — the growth-
# accounting classification. One lag window over the per-(user, day)
# relation, then a tiny (day, state) rollup.
# ---------------------------------------------------------------------------

_RESURRECT_GAP_DAYS = 14


@register("user_lifecycle_states", f"""
WITH days AS (
    SELECT DISTINCT user_id,
           date_diff('day', DATE '1970-01-01',
                     CAST(date_trunc('day', ts) AS DATE)) AS day
    FROM events
),
lagged AS (
    SELECT user_id, day,
           lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
    FROM days
),
states AS (
    SELECT day,
           CASE WHEN prev_day IS NULL THEN 'new'
                WHEN day - prev_day > {_RESURRECT_GAP_DAYS}
                THEN 'resurrected'
                ELSE 'active' END AS state
    FROM lagged
)
SELECT strftime(DATE '1970-01-01' + day * INTERVAL 1 DAY, '%Y-%m-%d')
         AS day,
       state, CAST(count(*) AS BIGINT) AS n_users
FROM states GROUP BY day, state
""")
def user_lifecycle_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = (ev.select(
        "user_id",
        F.datediff(F.date_trunc("day", "ts").cast("date"),
                   F.lit("1970-01-01").cast("date")).alias("day"))
        .distinct())
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = days.withColumn("prev_day", F.lag("day").over(w))
    states = lagged.select(
        "day",
        F.when(F.col("prev_day").isNull(), "new")
        .when(F.col("day") - F.col("prev_day") > _RESURRECT_GAP_DAYS,
              "resurrected")
        .otherwise("active").alias("state"))
    return (states.groupBy("day", "state")
            .agg(F.count("*").cast("long").alias("n_users"))
            .select(F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"),
                           F.col("day").cast("int")),
                "yyyy-MM-dd").alias("day"),
                "state", "n_users"))
