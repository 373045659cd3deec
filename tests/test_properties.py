"""Property-based checks (SURVEY.md §5.4) via hypothesis.

Each property evaluates a BATCH of generated examples in one Spark job
(hypothesis drives the data generation; Spark evaluates vectorized) —
one JVM round-trip per property, not per example.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions import scalars as X
from travel_data_pipeline_spark.functions import scores

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e12, max_value=1e12)
small = st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e6, max_value=1e6)


def _eval_batch(spark, rows, schema, col):
    df = spark.createDataFrame(rows, schema)
    return [r.v for r in df.select(col.alias("v")).collect()]


@settings(max_examples=1, deadline=None)
@given(st.lists(finite, min_size=50, max_size=50))
def test_clamp_bounds_property(spark, xs):
    got = _eval_batch(spark, [(x,) for x in xs], "x double",
                      X.clamp(F.col("x"), 0.0, 100.0))
    for x, v in zip(xs, got):
        assert 0.0 <= v <= 100.0
        if 0.0 <= x <= 100.0:
            assert v == x


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(small, small), min_size=50, max_size=50))
def test_growth_rate_total_function(spark, pairs):
    """growth_rate never yields NULL/NaN for finite inputs, and matches
    the reference's three-branch definition."""
    got = _eval_batch(spark, list(pairs), "recent double, prior double",
                      scores.growth_rate(F.col("recent"), F.col("prior")))
    for (recent, prior), v in zip(pairs, got):
        assert v is not None and not math.isnan(v)
        if prior > 0:
            assert v == (recent - prior) / prior
        elif recent > 0:
            assert v == recent / 1e-6
        else:
            assert v == 0.0


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(small, st.floats(min_value=0, max_value=100)),
                min_size=50, max_size=50))
def test_trend_score_range_property(spark, pairs):
    got = _eval_batch(spark, list(pairs), "g double, i double",
                      scores.trend_score(F.col("g"), F.col("i")))
    assert all(0.0 <= v <= 100.0 for v in got)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(
    st.one_of(st.none(), st.floats(min_value=0, max_value=1e9,
                                   allow_nan=False)),
    st.one_of(st.none(), st.floats(min_value=-10, max_value=1e9,
                                   allow_nan=False))),
    min_size=50, max_size=50))
def test_exchange_score_gate_property(spark, pairs):
    """Score is 0.0 exactly when gated (null input or yearly<=0), else
    in [0,100] — F6's contract for every input combination."""
    got = _eval_batch(spark, list(pairs), "rt double, yr double",
                      scores.exchange_score(F.col("rt"), F.col("yr")))
    for (rt, yr), v in zip(pairs, got):
        valid = rt is not None and yr is not None and yr > 0
        if not valid:
            assert v == 0.0
        else:
            assert 0.0 <= v <= 100.0


@settings(max_examples=1, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=30, max_size=30))
def test_parse_rate_thousands_roundtrip(spark, vals):
    """parse_rate inverts thousands-separator formatting for any value
    (X2's contract beyond the fixture cases)."""
    rows = [(f"{v:,}",) for v in vals]
    got = _eval_batch(spark, rows, "c string", X.parse_rate("c"))
    assert got == [float(v) for v in vals]


@settings(max_examples=1, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs")),
    min_size=0, max_size=200), min_size=20, max_size=20))
def test_shingles_count_property(spark, texts):
    """word_shingles yields max(0, n_words - 2) shingles of exactly 3
    words each, for arbitrary unicode word-soup."""
    from travel_data_pipeline_spark.operators.dedup import (
        normalize_text,
        word_shingles,
    )

    rows = [(t,) for t in texts]
    df = spark.createDataFrame(rows, "t string")
    got = df.select(
        F.size(F.split(normalize_text(F.col("t")), " ")).alias("n_words"),
        F.size(word_shingles(F.col("t"))).alias("n_shingles"),
        F.col("t")).collect()
    for r in got:
        expected = max(0, r.n_words - 2)
        assert r.n_shingles == expected, r.t


_words = st.lists(st.sampled_from(["a", "b", "cat", "dog", "fish", "x"]),
                  min_size=0, max_size=30)


@settings(max_examples=1, deadline=None)
@given(st.lists(_words, min_size=20, max_size=20))
def test_repetition_signal_invariants(spark, docs):
    from travel_data_pipeline_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string")
    for r in repetition_signals(df).collect():
        ws = docs[r["doc_id"]]
        assert r["n_tokens"] == len(ws)
        assert r["n_types"] == len(set(ws)) <= max(len(ws), 1)
        assert 0.0 <= r["ttr"] <= 1.0
        assert 0.0 <= r["top_2gram_frac"] <= 1.0
        assert 0.0 <= r["dup_2gram_frac"] <= 1.0
        # a doc of all-identical tokens is maximally repetitive
        if len(ws) >= 2 and len(set(ws)) == 1:
            assert r["top_2gram_frac"] == 1.0 and r["dup_2gram_frac"] == 1.0
        # no bigram repeats -> dup share is zero
        grams = [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        if grams and len(set(grams)) == len(grams):
            assert r["dup_2gram_frac"] == 0.0


@settings(max_examples=1, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=120),
                min_size=30, max_size=30))
def test_pack_shards_monotone_property(spark, token_counts):
    # one synthetic stream; shard ids must be nondecreasing in doc order.
    # Contiguity additionally needs every doc <= budget (an oversized
    # doc legitimately skips shard ids), so the generator caps at the
    # budget (TOKEN_BUDGET = 120).
    from pyspark.sql import Window
    from travel_data_pipeline_spark.queries_curation import TOKEN_BUDGET

    rows = [(i, "s", "en", n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_tokens int")
    w = (Window.partitionBy("source", "lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    got = (df.select("doc_id", "n_tokens", cum.alias("cum"),
                     F.floor((cum - F.col("n_tokens")) / float(TOKEN_BUDGET))
                      .cast("long").alias("shard"))
           .orderBy("doc_id").collect())
    prev_shard = 0
    for r in got:
        assert r["shard"] >= prev_shard
        prev_shard = r["shard"]
    # shards partition the stream: every doc assigned, ids contiguous
    shards = sorted({r["shard"] for r in got})
    assert shards == list(range(len(shards)))


@settings(max_examples=1, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2000),
                min_size=30, max_size=60))
def test_bin_packing_matches_python_model(spark, sizes):
    """Greedy in-order bin packing (compaction planner's window form)
    equals the sequential python reference on random file sizes."""
    from pyspark.sql import Window

    target = 500
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "file_id long, size long")
    w = (Window.orderBy("file_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    got = {r.file_id: r.bin for r in df.withColumn(
        "bin", F.floor((F.sum("size").over(w) - F.col("size"))
                       .cast("double") / target)).collect()}

    prefix, want = 0, {}
    for i, s in enumerate(sizes):
        want[i] = prefix // target
        prefix += s
    assert got == want


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 100)),
                min_size=20, max_size=60))
def test_asof_strict_matches_python_model(spark, rows):
    """asof_join(strict=True) returns the latest quote strictly before
    each fact ts, exactly as the naive python scan does — including
    equal-timestamp collisions."""
    from travel_data_pipeline_spark.operators.joins import asof_join

    facts = [(i, ts) for i, (side, ts) in enumerate(rows) if side == 0]
    quotes = {}
    for i, (side, ts) in enumerate(rows):
        if side == 1:
            # one quote per ts: keep max id (mirrors the dedup the
            # engine queries apply before as-of)
            quotes[ts] = max(quotes.get(ts, -1), i)
    if not facts or not quotes:
        return
    f = spark.createDataFrame(facts, "fact_id long, ts long")
    qdf = spark.createDataFrame(
        [(ts, qid) for ts, qid in quotes.items()], "q_ts long, q_id long") \
        .withColumn("key", F.lit(1))
    f = f.withColumn("key", F.lit(1))
    out = asof_join(f, qdf, "key", "ts", "q_ts", ["q_id"], strict=True)
    got = {r.fact_id: r.q_id for r in out.collect()}

    for fid, fts in facts:
        prior = [qid for ts, qid in quotes.items() if ts < fts]
        best = None
        if prior:
            best_ts = max(ts for ts in quotes if ts < fts)
            best = quotes[best_ts]
        assert got[fid] == best, (fid, fts, got[fid], best)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10), st.integers(0, 1)),
                min_size=10, max_size=40))
def test_kaplan_meier_matches_python_model(spark, rows):
    """The sorted-fold KM survival product equals the classical
    sequential product-limit computation on random (lifetime,
    censored) pairs."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "t long, censored int")
    byt = (df.groupBy("t")
           .agg(F.sum(1 - F.col("censored")).alias("d"),
                F.sum("censored").alias("c")))
    total = len(rows)
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = (byt.withColumn(
        "n_risk", F.lit(total)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w), F.lit(0)))
        .filter(F.col("d") > 0))
    folded = risk.agg(F.array_sort(F.collect_list(
        F.struct("t", "d", "n_risk"))).alias("ss"))
    walk = F.aggregate(
        F.col("ss"),
        F.array().cast("array<struct<t:bigint,d:bigint,n_risk:bigint,"
                       "s:double>>"),
        lambda acc, x: F.array_append(acc, F.struct(
            x["t"].alias("t"), x["d"].alias("d"),
            x["n_risk"].alias("n_risk"),
            (F.when(F.size(acc) == 0, F.lit(1.0))
              .otherwise(F.element_at(acc, -1)["s"])
             * (F.lit(1.0) - x["d"].cast("double")
                / x["n_risk"].cast("double"))).alias("s"))))
    got = {r.e.t: r.e.s for r in
           folded.select(F.explode(walk).alias("e")).collect()}

    # python reference: classical sequential product-limit
    from collections import Counter

    deaths, removed = Counter(), Counter()
    for t, cen in rows:
        removed[t] += 1
        if cen == 0:
            deaths[t] += 1
    s, n, want = 1.0, total, {}
    for t in sorted(removed):
        if deaths[t] > 0:
            s *= 1.0 - deaths[t] / n
            want[t] = s
        n -= removed[t]
    assert set(got) == set(want)
    for t in want:
        assert abs(got[t] - want[t]) < 1e-12


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                min_size=40, max_size=80))
def test_merge_intervals_matches_python_model(spark, rows):
    """merge_intervals unions arbitrary overlapping/touching/nested
    intervals per key exactly as the classic python sweep does."""
    from travel_data_pipeline_spark.operators.windows import (
        merge_intervals,
    )

    data = [(k, s, s + 1 + (i % 7)) for i, (k, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, s long, e long")
    got = sorted((r.k, r.s, r.e)
                 for r in merge_intervals(df, "k", "s", "e").collect())

    by_key: dict[int, list] = {}
    for k, s, e in data:
        by_key.setdefault(k, []).append((s, e))
    want = []
    for k, ivs in by_key.items():
        merged: list[list[int]] = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want += [(k, s, e) for s, e in merged]
    assert got == sorted(want)


@settings(max_examples=1, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 60)),
                min_size=20, max_size=60))
def test_nearest_join_matches_python_model(spark, rows):
    """nearest_join picks the quote with the smallest |delta| within
    tolerance, preferring the at-or-before side on equal distance and
    resolving equal-timestamp quotes by id — exactly as the naive
    python scan does, including same-instant collisions."""
    from travel_data_pipeline_spark.operators.joins import nearest_join

    facts = [(i, 1, ts) for i, (side, ts) in enumerate(rows) if side == 0]
    quotes = [(i, 1, ts) for i, (side, ts) in enumerate(rows) if side == 1]
    if not facts or not quotes:
        return
    f = spark.createDataFrame(facts, "fact_id long, k int, ts long")
    q = spark.createDataFrame(quotes, "q_id long, k int, q_ts long")
    tol = 10
    out = nearest_join(f, q, "k", "ts", "q_ts", "q_id", tolerance=tol)
    got = {r.fact_id: (r.nearest_id, r.nearest_ts)
           for r in out.collect()}

    for fid, _, fts in facts:
        back = max(((ts, qid) for qid, _, ts in quotes if ts <= fts),
                   key=lambda t: (t[0], t[1]), default=None)
        fwd = min(((ts, qid) for qid, _, ts in quotes if ts >= fts),
                  key=lambda t: (t[0], t[1]), default=None)
        if back is not None and (fwd is None
                                 or fts - back[0] <= fwd[0] - fts):
            pick = back
        else:
            pick = fwd
        if pick is not None and abs(pick[0] - fts) <= tol:
            assert got[fid] == (pick[1], pick[0]), (fid, fts)
        else:
            assert got[fid] == (None, None), (fid, fts)


@settings(max_examples=3, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=30),
                          st.integers(min_value=0, max_value=100_000_000)),
                min_size=1, max_size=300),
       st.integers(min_value=2, max_value=17))
def test_two_phase_ordered_property(spark, pairs, buckets):
    """For ANY data (heavy ties included) and ANY bucket count, the
    two-phase rank and inclusive cumsum equal the naive global
    window's, exactly. Values ride DECIMAL(18,6) — the operator's
    documented cumsum contract (exact types only: offset +
    bucket-local scan re-parenthesizes a raw-double addition, which
    hypothesis proved differs in the last ulp; every production call
    site cumsums longs or decimals)."""
    from pyspark.sql import Window

    from travel_data_pipeline_spark.operators import windows as W

    rows = [(i, k, v) for i, (k, v) in enumerate(pairs)]
    df = (spark.createDataFrame(rows, "id long, k long, micros long")
          .select("id", "k", (F.col("micros")
                              .cast("decimal(18,6)") / 1_000_000)
                  .cast("decimal(18,6)").alias("v")))
    order = [F.col("k").asc(), F.col("id").asc()]
    got = {r.id: (r.rk, r.cum) for r in W.two_phase_ordered(
        df, order, F.col("k") + F.col("id") / 1e9,
        rank_col="rk", cumsum_cols={"v": "cum"},
        num_buckets=buckets).collect()}
    w = Window.orderBy(*order)
    truth = {r.id: (r.rk, r.cum) for r in df.select(
        "id", F.row_number().over(w).cast("long").alias("rk"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
         .alias("cum")).collect()}
    assert got == truth


@settings(max_examples=3, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c"]),
                         min_size=2, max_size=8),
                min_size=5, max_size=15))
def test_bpe_train_matches_python_model(spark, corpora):
    """Two BPE merge rounds over tiny 3-letter corpora equal a
    sequential python reference: raw adjacent counts, argmax on
    (count DESC, joined-pair-string ASC), leftmost-greedy
    non-overlapping merge. Overlap runs ('a a a') and ties are the
    interesting cases a fixed fixture misses."""
    from travel_data_pipeline_spark.queries_round7 import (
        _BPE_SEP,
        _bpe_train,
    )

    df = spark.createDataFrame([(t,) for t in corpora], "t array<string>")
    got = _bpe_train(df, n_merges=2)

    docs = [list(t) for t in corpora]
    want = []
    for rank in range(1, 3):
        counts: dict[tuple, int] = {}
        for toks in docs:
            for pair in zip(toks, toks[1:]):
                counts[pair] = counts.get(pair, 0) + 1
        if not counts:
            break
        (a, b), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        want.append((rank, a + " " + b, n))
        m = a + _BPE_SEP + b
        nxt = []
        for toks in docs:
            out: list = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = m
                else:
                    out.append(t)
            nxt.append(out)
        docs = nxt
    assert got == want


@settings(max_examples=3, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(-50, 50)),
                min_size=10, max_size=80))
def test_two_phase_cummax_matches_python_model(spark, rows):
    """Two-phase running max over random tie-heavy (grp, v) rows must
    equal the sequential python scan in (grp, id) order."""
    from travel_data_pipeline_spark.operators import windows as W

    data = [(i, g, float(v)) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, grp int, v double")
    got = {r.id: r.rmax for r in W.two_phase_ordered(
        df, [F.col("grp").asc(), F.col("id").asc()],
        F.col("grp") + F.col("id") / 1e9,
        cummax_cols={"v": "rmax"}, num_buckets=4).collect()}
    best = float("-inf")
    want = {}
    for i, g, v in sorted(data, key=lambda r: (r[1], r[0])):
        best = max(best, v)
        want[i] = best
    assert got == want
