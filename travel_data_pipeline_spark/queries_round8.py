"""Round-8 candidate queries (written in round 7) — measurement and
platform gaps per VERDICT r06:

- ivf_recall_at_k: the promised-but-missing ANN recall audit
  (operators/similarity.py docstring) — recall@k of the IVF pruned
  scan AND the int8-rerank path against brute-force ground truth,
  over a k x n_probe grid. The IVF sibling of the MinHash
  estimate-vs-exact calibration: the single number a 100 TB user
  needs before trusting a pruned scan.
- bpe_apply_learned: closes the BPE loop — applies the merge table
  learned by bpe_train_merges to a held-out slice and reports
  fertility / OOV vs the whitespace baseline.
- further batch entries follow (quantile sketch merge, incremental
  recompute planning, cross-source contamination matrix, ...), each
  section carrying its own scale-shape note.

Same discipline as every other module: exact integer/decimal moments,
order-pinned folds for float sums, shared per-row double spellings,
Spark-parity rounding (functions/parity.round_sql) on rounded oracle
doubles, broadcast for every dimension/query-sized side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from travel_data_pipeline_spark.functions.parity import round_sql
from travel_data_pipeline_spark.functions.oracle_fragments import (
    INT_DOT as _INT_DOT,
    Q8_CTE as _Q8_CTE,
)
from travel_data_pipeline_spark.operators import similarity
from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# ANN recall@k audit — IVF (exact scoring) and int8-rerank paths vs
# brute-force ground truth.
#
# Scale shape: ground truth is a broadcast of the 5-query set against
# the corpus (the one full scan — the thing IVF avoids, run here ONCE
# as the measurement baseline); every audited path reuses a single
# candidate relation (probed-cluster members with probe_rnk <= 4,
# exact cosine AND int8 approx dot computed side by side), exploded
# against the literal (k, n_probe) grid — a bounded 9x multiplier on a
# per-query candidate relation, never on the corpus. All windows are
# per-(grid cell, query); nothing global. At 100 TB the audit costs
# one brute-force pass over a FIXED query sample plus the pruned scans
# it certifies.
#
# Grid: k in {1,5,10} x n_probe in {1,2,4}; the rerank path keeps the
# registered rerank_keep=20 from ivf_quantized_rerank.
# ---------------------------------------------------------------------------

_RECALL_KS = (1, 5, 10)
_RECALL_PROBES = (1, 2, 4)

_COS = ("ROUND(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * "
        "sqrt(list_dot_product({b}, {b}))), 6)")


@register("ivf_recall_at_k", f"""
WITH cent AS (
    SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
    FROM embeddings WHERE vec_id % 50 = 0
),
{_Q8_CTE.strip()},
q AS (SELECT vec_id AS query_id, v AS qv_full, qv, scale AS scale_a
      FROM quant WHERE vec_id < 5),
nq AS (SELECT COUNT(*) AS nq FROM q),
truth AS (
    SELECT query_id, neighbor_id, rnk AS truth_rnk FROM (
        SELECT q.query_id, n.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                   {_COS.format(a='q.qv_full', b='n.v')} DESC,
                   n.vec_id ASC) AS rnk
        FROM quant n CROSS JOIN q WHERE q.query_id <> n.vec_id
    ) WHERE rnk <= {max(_RECALL_KS)}
),
assigned AS (
    SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
                   {_COS.format(a='c.cv', b='b.v')} DESC,
                   c.centroid_id ASC) AS rnk
        FROM quant b CROSS JOIN cent c
    ) WHERE rnk = 1
),
probes AS (
    SELECT query_id, centroid_id, rnk AS probe_rnk FROM (
        SELECT q.query_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                   {_COS.format(a='q.qv_full', b='c.cv')} DESC,
                   c.centroid_id ASC) AS rnk
        FROM q CROSS JOIN cent c
    ) WHERE rnk <= {max(_RECALL_PROBES)}
),
scored AS (
    SELECT a.query_id, b.vec_id AS neighbor_id, p.probe_rnk,
           {_COS.format(a='a.qv_full', b='b.v')} AS cosine_sim,
           ROUND(CAST({_INT_DOT} AS DOUBLE) * a.scale_a * b.scale, 6)
               AS approx_dot
    FROM probes p
    JOIN assigned x ON x.centroid_id = p.centroid_id
    JOIN quant b ON b.vec_id = x.vec_id
    JOIN q a ON a.query_id = p.query_id
    WHERE b.vec_id <> p.query_id
),
grid AS (
    SELECT k, n_probe
    FROM (VALUES {', '.join(f'({k})' for k in _RECALL_KS)}) ks(k)
    CROSS JOIN (VALUES {', '.join(f'({p})' for p in _RECALL_PROBES)})
         ps(n_probe)
),
ivf_topk AS (
    SELECT k, n_probe, query_id, neighbor_id FROM (
        SELECT g.k, g.n_probe, s.query_id, s.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY g.k, g.n_probe, s.query_id
                   ORDER BY s.cosine_sim DESC, s.neighbor_id ASC) AS rnk
        FROM scored s CROSS JOIN grid g
        WHERE s.probe_rnk <= g.n_probe
    ) WHERE rnk <= k
),
kept AS (
    SELECT n_probe, query_id, neighbor_id, cosine_sim FROM (
        SELECT p.n_probe, s.query_id, s.neighbor_id, s.cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY p.n_probe, s.query_id
                   ORDER BY s.approx_dot DESC, s.neighbor_id ASC) AS rnk1
        FROM scored s
        CROSS JOIN (VALUES {', '.join(f'({p})' for p in _RECALL_PROBES)})
             p(n_probe)
        WHERE s.probe_rnk <= p.n_probe
    ) WHERE rnk1 <= 20
),
rr_topk AS (
    SELECT k, n_probe, query_id, neighbor_id FROM (
        SELECT ks.k, kp.n_probe, kp.query_id, kp.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY ks.k, kp.n_probe, kp.query_id
                   ORDER BY kp.cosine_sim DESC, kp.neighbor_id ASC) AS rnk
        FROM kept kp
        CROSS JOIN (VALUES {', '.join(f'({k})' for k in _RECALL_KS)}) ks(k)
    ) WHERE rnk <= k
),
ivf_hits AS (
    SELECT i.k, i.n_probe, COUNT(*) AS n_hits
    FROM ivf_topk i JOIN truth t
      ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
     AND t.truth_rnk <= i.k
    GROUP BY i.k, i.n_probe
),
rr_hits AS (
    SELECT r.k, r.n_probe, COUNT(*) AS n_hits
    FROM rr_topk r JOIN truth t
      ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
     AND t.truth_rnk <= r.k
    GROUP BY r.k, r.n_probe
),
unioned AS (
    SELECT 'ivf_exact' AS path, g.k, g.n_probe,
           COALESCE(h.n_hits, 0) AS n_hits
    FROM grid g LEFT JOIN ivf_hits h USING (k, n_probe)
    UNION ALL
    SELECT 'int8_rerank' AS path, g.k, g.n_probe,
           COALESCE(h.n_hits, 0) AS n_hits
    FROM grid g LEFT JOIN rr_hits h USING (k, n_probe)
)
SELECT path, CAST(k AS INT) AS k, CAST(n_probe AS INT) AS n_probe,
       CAST(n_hits AS BIGINT) AS n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / (k * (SELECT nq FROM nq)), 6)
           AS recall_at_k
FROM unioned
""")
def ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF pruned scan vs brute-force ground truth.

    Two audited paths share ONE candidate relation (members of the 4
    nearest clusters per query, exact cosine and int8 approx-dot both
    computed): 'ivf_exact' ranks candidates with probe_rnk <= n_probe
    by exact cosine; 'int8_rerank' first keeps the top-20 by the
    quantized dot (the ivf_quantized_rerank configuration), then ranks
    those by exact cosine. recall@k = |top-k ∩ brute top-k| / (k ×
    n_queries). Recall is monotone in n_probe (pytest-pinned): more
    probed clusters only add candidates.

    Division denominators (k × nq ∈ {{5,25,50}}) render in <= 6
    decimal digits, so plain ROUND is parity-safe."""
    from travel_data_pipeline_spark.operators import ml

    emb = load_table(spark, sf_dir, "embeddings")
    v = ml.as_double_vec(F.col("embedding"))
    scale_c, q_c, _, _ = ml.quantize_int8(v)
    quant = emb.select("vec_id", v.alias("v"), scale_c.alias("scale"),
                       q_c.alias("qv"))
    cent = (emb.filter(F.col("vec_id") % 50 == 0)
            .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))

    truth = (similarity.brute_force_topk(emb, queries, k=max(_RECALL_KS))
             .select("query_id", "neighbor_id",
                     F.col("rnk").alias("truth_rnk")))

    assigned = similarity.assign_clusters(emb, cent)
    qv = quant.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_vec"),
        F.col("qv").alias("qa"), F.col("scale").alias("scale_a"))
    cq = cent.select("centroid_id",
                     ml.as_double_vec(F.col("embedding")).alias("c_vec"))
    probes = (qv.crossJoin(F.broadcast(cq))
              .select("query_id", "centroid_id",
                      F.round(similarity.cosine(F.col("q_vec"),
                                                F.col("c_vec")), 6)
                      .alias("sim")))
    wp = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                                F.asc("centroid_id"))
    probed = (probes.withColumn("probe_rnk", F.row_number().over(wp))
              .filter(F.col("probe_rnk") <= max(_RECALL_PROBES))
              .select("query_id", "centroid_id", "probe_rnk"))

    indexed = quant.join(assigned.select("vec_id", "centroid_id"), "vec_id")
    cand = (indexed.join(probed.hint("broadcast"), "centroid_id")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "probe_rnk", F.col("v").alias("n_vec"),
                    F.col("qv").alias("qb"), F.col("scale").alias("scale_b")))
    int_dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: (x.cast("long") * y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = (cand.join(F.broadcast(qv), "query_id")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id", "probe_rnk",
                      F.round(similarity.cosine(F.col("q_vec"),
                                                F.col("n_vec")), 6)
                      .alias("cosine_sim"),
                      F.round(int_dot.cast("double")
                              * F.col("scale_a") * F.col("scale_b"), 6)
                      .alias("approx_dot")))

    combos = (spark.range(1).select(F.explode(F.array(*[
        F.struct(F.lit(k).alias("k"), F.lit(p).alias("n_probe"))
        for k in _RECALL_KS for p in _RECALL_PROBES])).alias("c"))
        .select("c.k", "c.n_probe"))
    pgrid = spark.range(1).select(F.explode(F.array(
        *[F.lit(p) for p in _RECALL_PROBES])).alias("n_probe"))
    kgrid = spark.range(1).select(F.explode(F.array(
        *[F.lit(k) for k in _RECALL_KS])).alias("k"))

    wg = Window.partitionBy("k", "n_probe", "query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id"))
    ivf_rows = (scored.crossJoin(F.broadcast(combos))
                .filter(F.col("probe_rnk") <= F.col("n_probe"))
                .withColumn("rnk", F.row_number().over(wg))
                .filter(F.col("rnk") <= F.col("k")))

    w1 = Window.partitionBy("n_probe", "query_id").orderBy(
        F.desc("approx_dot"), F.asc("neighbor_id"))
    kept = (scored.crossJoin(F.broadcast(pgrid))
            .filter(F.col("probe_rnk") <= F.col("n_probe"))
            .withColumn("rnk1", F.row_number().over(w1))
            .filter(F.col("rnk1") <= 20))
    rr_rows = (kept.crossJoin(F.broadcast(kgrid))
               .withColumn("rnk", F.row_number().over(wg))
               .filter(F.col("rnk") <= F.col("k")))

    nq = qv.agg(F.count("*").alias("nq"))

    def recall(rows: DataFrame, path: str) -> DataFrame:
        hits = (rows.join(truth, ["query_id", "neighbor_id"])
                .filter(F.col("truth_rnk") <= F.col("k"))
                .groupBy("k", "n_probe").agg(F.count("*").alias("n_hits")))
        return (combos.join(hits, ["k", "n_probe"], "left")
                .crossJoin(F.broadcast(nq))
                .select(F.lit(path).alias("path"),
                        F.col("k").cast("int").alias("k"),
                        F.col("n_probe").cast("int").alias("n_probe"),
                        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                        .alias("n_hits"),
                        F.round(F.coalesce(F.col("n_hits"), F.lit(0))
                                .cast("double")
                                / (F.col("k") * F.col("nq")), 6)
                        .alias("recall_at_k")))

    return recall(ivf_rows, "ivf_exact").unionAll(recall(rr_rows,
                                                         "int8_rerank"))


# ---------------------------------------------------------------------------
# BPE induction -> application: tokenize a HELD-OUT slice with the
# merge table learned on the training slice, closing the
# bpe_train_merges loop (VERDICT r06 #4 — nothing consumed the learned
# merges).
#
# Split: doc_id % 10 == 7 is held out; training runs the exact
# bpe_train_merges loop on the other 90%. Application replays the
# merges IN RANK ORDER over the held-out token arrays (the same
# leftmost-greedy JVM fold/flatten the trainer uses — no UDF); the
# per-rank application count is the token-count drop at that step, so
# every output number is an exact integer (no float parity surface).
# The 5 per-step actions mirror the training loop's lag-1 persist
# discipline; each step is one linear pass over the 10% slice.
# ---------------------------------------------------------------------------

def _bpe_apply_oracle() -> str:
    """LAZY oracle: independent pure-python train-on-90 / apply-on-10
    off the oracle-SF parquet, rendered as VALUES. Same normalize /
    tokenize / tie-break spellings as _bpe_train_oracle."""
    import os
    import re
    from collections import Counter

    import duckdb

    from travel_data_pipeline_spark.queries_round7 import (
        _BPE_SEP,
        _BPE_TRAIN_MERGES,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    rows = con.execute(
        "SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchall()
    con.close()

    def toks(t: str) -> list[str]:
        return [x for x in
                re.sub(r"\s+", " ", t.lower()).strip().split(" ") if x]

    train = [toks(t) for d, t in rows if d % 10 != 7]
    train = [t for t in train if len(t) >= 2]
    held = [toks(t) for d, t in rows if d % 10 == 7]
    held = [t for t in held if len(t) >= 1]

    def apply_merge(docs: list[list[str]], a: str, b: str) -> list[list[str]]:
        m = a + _BPE_SEP + b
        nxt = []
        for tk in docs:
            out: list[str] = []
            for t in tk:
                if out and out[-1] == a and t == b:
                    out[-1] = m
                else:
                    out.append(t)
            nxt.append(out)
        return nxt

    total = sum(len(t) for t in held)
    values = []
    for rank in range(1, _BPE_TRAIN_MERGES + 1):
        c: Counter = Counter()
        for tk in train:
            c.update(zip(tk, tk[1:]))
        if not c:
            break
        (a, b), n = min(c.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        train = apply_merge(train, a, b)
        held = apply_merge(held, a, b)
        new_total = sum(len(t) for t in held)
        values.append((rank, (a + " " + b).replace("'", "''"), n,
                       total - new_total, new_total))
        total = new_total
    if not values:
        return ("SELECT CAST(0 AS BIGINT) AS merge_rank, '' AS pair, "
                "CAST(0 AS BIGINT) AS n_train_pairs, "
                "CAST(0 AS BIGINT) AS n_applied_heldout, "
                "CAST(0 AS BIGINT) AS heldout_tokens_after WHERE 1 = 0")
    body = ",\n".join(
        f"(CAST({r} AS BIGINT), '{p}', CAST({n} AS BIGINT), "
        f"CAST({ap} AS BIGINT), CAST({tot} AS BIGINT))"
        for r, p, n, ap, tot in values)
    return (f"SELECT * FROM (VALUES\n{body}\n) AS t(merge_rank, pair, "
            "n_train_pairs, n_applied_heldout, heldout_tokens_after)")


@register("bpe_apply_learned", _bpe_apply_oracle)
def bpe_apply_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply merges learned on 90% of the corpus to the held-out 10%.

    Output per merge rank: the training-time pair count and the
    held-out application count + running held-out token total — the
    fertility-improvement curve of the induced tokenizer on unseen
    text (rank-0 baseline = the whitespace token count,
    reconstructable as heldout_tokens_after + cumulative applied)."""
    from travel_data_pipeline_spark.operators import text as _text
    from travel_data_pipeline_spark.queries_round7 import (
        _bpe_train,
        _merge_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    train_toks = (docs.filter(F.col("doc_id") % 10 != 7)
                  .select(_text.token_array(F.col("text")).alias("t"))
                  .filter(F.size("t") >= 2))
    merges = _bpe_train(train_toks)

    cur = (docs.filter(F.col("doc_id") % 10 == 7)
           .select(_text.token_array(F.col("text")).alias("t"))
           .filter(F.size("t") >= 1).persist())
    prev = None
    rows: list[tuple] = []
    try:
        total = int(cur.select(F.coalesce(F.sum(F.size("t")), F.lit(0)))
                    .first()[0])
        for rank, pair, n_train in merges:
            a, b = pair.split(" ")
            prev, cur = cur, (cur.select(_merge_tokens(F.col("t"), a, b)
                                         .alias("t")).persist())
            new_total = int(cur.select(
                F.coalesce(F.sum(F.size("t")), F.lit(0))).first()[0])
            prev.unpersist()
            prev = None
            rows.append((rank, pair, n_train, total - new_total, new_total))
            total = new_total
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return spark.createDataFrame(
        rows, "merge_rank long, pair string, n_train_pairs long, "
              "n_applied_heldout long, heldout_tokens_after long")
