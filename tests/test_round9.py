"""Round-9 candidate queries (authored round 7) — invariants and
sequential python models the oracle comparison can't see."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from decimal import Decimal, ROUND_HALF_UP

from pyspark.sql import functions as F


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm_words(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            if w != ""]


def _round6(x: float) -> float:
    # Spark's HALF_UP on the shortest decimal rendering
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# ab_sprt_curve
# ---------------------------------------------------------------------------

def test_sprt_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _SPRT_LA,
        _SPRT_LB,
        _SPRT_LOWER,
        _SPRT_UPPER,
        ab_sprt_curve,
    )

    rows = sorted(ab_sprt_curve(spark, sf_smoke).collect(),
                  key=lambda r: r.day)
    assert rows
    cn = cx = 0
    for r in rows:
        cn += r.n_trials
        cx += r.n_success
        assert (r.cum_n, r.cum_x) == (cn, cx)
        assert 0 <= r.n_success <= r.n_trials
        llr = float(cx) * _SPRT_LA + float(cn - cx) * _SPRT_LB
        assert r.cum_llr == _round6(llr) + 0.0
        want = ("accept_h1" if llr >= _SPRT_UPPER
                else "accept_h0" if llr <= _SPRT_LOWER else "continue")
        assert r.decision == want


def test_sprt_boundaries_are_wald():
    from travel_data_pipeline_spark.queries_round9 import (
        _SPRT_LOWER,
        _SPRT_UPPER,
    )

    assert _SPRT_UPPER == math.log(19.0)
    assert _SPRT_LOWER == -_SPRT_UPPER


# ---------------------------------------------------------------------------
# substring_dup_spans
# ---------------------------------------------------------------------------

def test_substring_spans_match_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _SPAN_N,
        substring_dup_spans,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    docs = {r.doc_id: r.text
            for r in load_table(spark, sf_smoke, "documents")
            .select("doc_id", "text").collect()}
    grams: dict[int, list[str]] = {}
    for did, text in docs.items():
        # word_shingles splits WITHOUT dropping empties (normalized
        # text has none) — mirror that
        words = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        grams[did] = [" ".join(words[i:i + _SPAN_N])
                      for i in range(len(words) - _SPAN_N + 1)]
    by_gram: dict[str, set[int]] = defaultdict(set)
    for did, gs in grams.items():
        for g in gs:
            by_gram[g].add(did)
    expected = {}
    for did, gs in grams.items():
        dup_pos = [i + 1 for i, g in enumerate(gs)
                   if len(by_gram[g]) >= 2]
        if not dup_pos:
            continue
        spans, cur = [], 1
        for a, b in zip(dup_pos, dup_pos[1:]):
            if b == a + 1:
                cur += 1
            else:
                spans.append(cur)
                cur = 1
        spans.append(cur)
        expected[did] = (len(gs), sum(spans), len(spans), max(spans))

    got = {r.doc_id: (r.n_grams, r.dup_grams, r.n_spans,
                      r.max_span_grams)
           for r in substring_dup_spans(spark, sf_smoke).collect()}
    assert got == expected
    assert expected, "corpus has no duplicated 5-gram — degenerate"


# ---------------------------------------------------------------------------
# cdc_chunk_dedup
# ---------------------------------------------------------------------------

def test_cdc_chunks_match_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _CDC_DIV,
        cdc_chunk_dedup,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "documents")
            .select("doc_id", "source", "text").collect())
    chunk_keys: list[tuple[str, str, int]] = []  # (source, key, n_toks)
    for r in rows:
        toks = _norm_words(r.text)
        cur: list[str] = []
        for t in toks:
            cur.append(t)
            if _md5_long("cdc:" + t) % _CDC_DIV == 0:
                chunk_keys.append((r.source, " ".join(cur), len(cur)))
                cur = []
        if cur:
            chunk_keys.append((r.source, " ".join(cur), len(cur)))
    freq: dict[str, int] = defaultdict(int)
    for _, key, _ in chunk_keys:
        freq[key] += 1
    expected: dict[str, tuple[int, int, int]] = {}
    for src in {s for s, _, _ in chunk_keys}:
        mine = [(k, n) for s, k, n in chunk_keys if s == src]
        expected[src] = (len(mine), len({k for k, _ in mine}),
                         sum(1 for k, _ in mine if freq[k] >= 2))

    got = {r.source: (r.n_chunks, r.n_unique_keys, r.n_dup_chunks)
           for r in cdc_chunk_dedup(spark, sf_smoke).collect()}
    assert got == expected
    assert any(d for _, _, d in expected.values()), \
        "no duplicate chunks anywhere — degenerate corpus"


# ---------------------------------------------------------------------------
# median_of_means_value
# ---------------------------------------------------------------------------

def test_median_of_means_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _MOM_BUCKETS,
        median_of_means_value,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    events = (load_table(spark, sf_smoke, "events")
              .select("event_type", "event_id", "value").collect())
    buckets: dict[tuple[str, int], list[tuple[float, int]]] = defaultdict(list)
    for r in events:
        bkt = _md5_long(f"mom:{r.event_id}") % _MOM_BUCKETS
        buckets[(r.event_type, bkt)].append((r.value, r.event_id))
    med_sum: dict[str, Decimal] = defaultdict(Decimal)
    med_cnt: dict[str, int] = defaultdict(int)
    for (etype, _), vals in buckets.items():
        vals.sort()
        lower_med = vals[(len(vals) + 1) // 2 - 1][0]
        med_sum[etype] += Decimal(repr(_round6(lower_med)))
        med_cnt[etype] += 1

    out = {r.event_type: r for r in
           median_of_means_value(spark, sf_smoke).collect()}
    assert set(out) == set(med_cnt)
    for etype, r in out.items():
        assert r.n_buckets == med_cnt[etype]
        want = _round6(float(med_sum[etype]) / med_cnt[etype])
        assert r.mom_mean == want, etype
        lo = min(v for (t, _), vs in buckets.items() if t == etype
                 for v, _ in vs)
        hi = max(v for (t, _), vs in buckets.items() if t == etype
                 for v, _ in vs)
        assert lo <= r.mom_mean <= hi
        assert abs(r.rel_diff) < 1.0


# ---------------------------------------------------------------------------
# cosine_threshold_sweep / semantic_contamination_audit / knn_label_noise
# ---------------------------------------------------------------------------

def test_threshold_sweep_monotone(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _SWEEP_TAUS,
        cosine_threshold_sweep,
    )

    rows = sorted(cosine_threshold_sweep(spark, sf_smoke).collect(),
                  key=lambda r: r.threshold)
    assert [r.threshold for r in rows] == sorted(_SWEEP_TAUS)
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_dropped >= b.n_docs_dropped
    assert rows[0].n_pairs > 0, "no candidate pair clears tau=0.1"
    for r in rows:
        assert r.n_docs_dropped <= r.n_pairs or r.n_pairs == 0
        assert 0.0 <= r.removal_share <= 1.0


def test_contamination_bands_consistent(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _CONTAM_EVAL_N,
        _CONTAM_TAU,
        semantic_contamination_audit,
    )

    rows = semantic_contamination_audit(spark, sf_smoke).collect()
    assert len(rows) == _CONTAM_EVAL_N
    assert {r.query_id for r in rows} == set(range(_CONTAM_EVAL_N))
    for r in rows:
        assert r.nearest_train_id >= _CONTAM_EVAL_N
        assert r.band == math.floor(r.max_cos * 10)
        assert r.contaminated == (r.max_cos >= _CONTAM_TAU)


def test_knn_label_noise_ranges(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        knn_label_noise,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    n_sample = emb.filter(F.col("vec_id") % 10 == 0).count()
    rows = knn_label_noise(spark, sf_smoke).collect()
    assert sum(r.n_audited for r in rows) == n_sample
    for r in rows:
        assert 0.0 <= r.mean_disagree <= 1.0
        assert 0 <= r.n_suspect <= r.n_audited
        assert r.n_disagree <= 5 * r.n_audited


# ---------------------------------------------------------------------------
# quantile_normalize_lengths / neyman_allocation_plan /
# neardup_source_matrix / fano_burstiness_by_type
# ---------------------------------------------------------------------------

def test_quantile_normalize_bins(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _QN_BINS,
        quantile_normalize_lengths,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    n_docs = load_table(spark, sf_smoke, "documents").count()
    rows = quantile_normalize_lengths(spark, sf_smoke).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    # the global ventile means must agree across sources for one bin
    by_bin: dict[int, set[float]] = defaultdict(set)
    for r in rows:
        assert 0 <= r.bin < _QN_BINS
        by_bin[r.bin].add(r.mean_len_global)
        assert r.shift == _round6(r.mean_len_global
                                  - r.mean_len_source) + 0.0
    assert all(len(v) == 1 for v in by_bin.values())


def test_neyman_allocation_totals(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _NEYMAN_BUDGET,
        neyman_allocation_plan,
    )

    rows = neyman_allocation_plan(spark, sf_smoke).collect()
    assert rows
    assert sum(r.neyman_n for r in rows) <= _NEYMAN_BUDGET
    assert sum(r.prop_n for r in rows) <= _NEYMAN_BUDGET
    share = sum(r.neyman_share for r in rows)
    assert abs(share - 1.0) < 1e-3
    for r in rows:
        assert r.sd_chars >= 0.0
        assert r.neyman_n >= 0 and r.prop_n >= 0
    # allocations must actually differ somewhere, else the plan
    # measures nothing on this corpus
    assert any(r.neyman_n != r.prop_n for r in rows)


def test_neardup_source_matrix_canonical(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        _SRC_PAIR_TAU,
        neardup_source_matrix,
    )

    rows = neardup_source_matrix(spark, sf_smoke).collect()
    assert rows, "no near-dup pair at tau=0.3 — degenerate corpus"
    for r in rows:
        assert r.source_a <= r.source_b
        assert r.n_pairs >= 1
        assert r.max_jaccard >= _SRC_PAIR_TAU


def test_fano_classification_consistent(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        fano_burstiness_by_type,
    )

    rows = fano_burstiness_by_type(spark, sf_smoke).collect()
    n_days = {r.n_days for r in rows}
    assert len(n_days) == 1  # every type sees the SAME global grid
    for r in rows:
        assert r.total_events > 0 and r.fano is not None
        assert r.fano >= 0.0
        # classification runs on the UNROUNDED fano; stay clear of the
        # 6-dp rounding boundary when asserting from the rounded output
        if r.fano >= 1.2 + 1e-6:
            assert r.arrival_class == "bursty"
        elif r.fano <= 0.9 - 1e-6:
            assert r.arrival_class == "regular"


# ---------------------------------------------------------------------------
# count_min_stream (the non-idempotent sketch twin)
# ---------------------------------------------------------------------------

def test_count_min_stream_matches_batch_and_replay_noop(spark, sf_smoke,
                                                        tmp_path):
    """Streamed CM cells over a 2-batch split are bit-equal to the
    batch user_cm_cells over the union; wiping the checkpoint but
    keeping its PATH (epochs restart at 0 in the SAME lineage) makes
    every redelivered batch a strict no-op; probe estimates never
    underestimate the exact counts."""
    import os
    import shutil

    from travel_data_pipeline_spark.queries_round8 import user_cm_cells
    from travel_data_pipeline_spark.sources import versioned
    from travel_data_pipeline_spark.sources.readers import load_table
    from travel_data_pipeline_spark.streaming import jobs

    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id")
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    feed = tmp_path / "cmfeed"
    feed.mkdir()
    for i, part in enumerate([ev.filter(F.col("event_id") <= mid),
                              ev.filter(F.col("event_id") > mid)]):
        p = str(feed / f"b{i}.parquet")
        part.toPandas().to_parquet(p)
        os.utime(p, (1700000000 + i * 60, 1700000000 + i * 60))

    state_p = str(tmp_path / "cmstate")
    ckpt = str(tmp_path / "cmckpt")

    def run() -> None:
        stream = (spark.readStream.schema("event_id long, user_id long")
                  .option("maxFilesPerTrigger", 1).parquet(str(feed)))
        q = jobs.count_min_stream(stream, state_p, ckpt)
        q.awaitTermination(180)

    run()
    got = {(r.seed, r.bucket): r.c
           for r in versioned.read_table(spark, state_p)
           .select("seed", "bucket", "c").collect()}
    want = {(r.seed, r.bucket): r.c for r in user_cm_cells(ev).collect()}
    assert got == want and want

    # same-lineage replay: wipe the checkpoint DIR, keep its path
    shutil.rmtree(ckpt)
    run()
    after = {(r.seed, r.bucket): r.c
             for r in versioned.read_table(spark, state_p)
             .select("seed", "bucket", "c").collect()}
    assert after == want  # adds are gated — no double-count

    # probe parity: estimate >= exact for every user (CM never
    # underestimates), equality for at least one light user
    exact = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    est = jobs.cm_stream_probe(spark, state_p,
                               exact.select("user_id"))
    joined = exact.join(est, "user_id").collect()
    assert joined
    assert all(r.cm_estimate >= r.n for r in joined)


# ---------------------------------------------------------------------------
# markov_stationary_distribution / hll_sliding_window_distinct /
# source_loo_influence / l_diversity_audit
# ---------------------------------------------------------------------------

def test_markov_stationary_matches_python_model(spark, sf_smoke):
    """Re-run the 8-step decimal power iteration sequentially in
    python from the raw event log and compare bit-for-bit."""
    from travel_data_pipeline_spark.queries_round9 import (
        _MARKOV_ITERS,
        markov_stationary_distribution,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = sorted(load_table(spark, sf_smoke, "events")
                .select("user_id", "ts", "event_id", "event_type")
                .collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    trans: dict[tuple[str, str], int] = defaultdict(int)
    for a, b in zip(ev, ev[1:]):
        if a.user_id == b.user_id:
            trans[(a.event_type, b.event_type)] += 1
    tot: dict[str, int] = defaultdict(int)
    for (f_t, _), n in trans.items():
        tot[f_t] += n
    p6 = {k: Decimal(repr(_round6(n / tot[k[0]])))
          for k, n in trans.items()}
    types = sorted(tot)
    v = {t: Decimal(repr(_round6(1.0 / len(types)))) for t in types}
    for _ in range(_MARKOV_ITERS):
        nxt: dict[str, Decimal] = defaultdict(Decimal)
        for (f_t, t_t), p in p6.items():
            if f_t in v:
                nxt[t_t] += v[f_t] * p
        v = {t: x.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
             for t, x in nxt.items()}

    got = {r.event_type: r.stationary_p
           for r in markov_stationary_distribution(spark,
                                                   sf_smoke).collect()}
    for t in got:
        assert got[t] == float(v.get(t, 0)), t
    # the long-run mix must concentrate SOME mass everywhere reachable
    assert abs(sum(got.values()) - 1.0) < 1e-3


def test_hll_sliding_window_reasonable(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        hll_sliding_window_distinct,
    )

    rows = sorted(hll_sliding_window_distinct(spark, sf_smoke).collect(),
                  key=lambda r: r.day_idx)
    assert rows
    for r in rows:
        assert r.exact_window_users > 0
        # m = 64 registers: keep a loose error envelope
        assert abs(r.rel_err) < 0.5, (r.day_idx, r.rel_err)
    # a 7-day window must cover at least as many users as any single
    # day once the window is warm
    assert rows[-1].exact_window_users >= rows[0].exact_window_users / 2


def test_source_loo_influence_identity(spark, sf_smoke):
    """Sum over sources of (N - N_s)*delta_s telescopes to 0 exactly
    in the unrounded algebra; assert it within rounding slack, plus
    both influence signs exist on this corpus."""
    from travel_data_pipeline_spark.queries_round9 import (
        source_loo_influence,
    )

    rows = source_loo_influence(spark, sf_smoke).collect()
    assert rows
    total = sum((sum(x.n_docs for x in rows) - r.n_docs) * r.loo_delta
                for r in rows)
    assert abs(total) < 0.01
    assert any(r.loo_delta > 0 for r in rows)
    assert any(r.loo_delta < 0 for r in rows)


def test_l_diversity_bounds(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import (
        l_diversity_audit,
    )

    rows = l_diversity_audit(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 1 <= r.min_l
        assert r.weak_cells <= r.n_cells
        assert r.weak_rows <= r.n_rows
        assert 0.0 <= r.weak_share <= 1.0


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci / did_estimator / cuped_variance_reduction
# ---------------------------------------------------------------------------

def test_poisson_bootstrap_matches_python_model(spark, sf_smoke):
    """Replicate means for one event type recomputed sequentially in
    python (same md5 weights, decimal folds) must match the query's
    band selections bit-for-bit."""
    from travel_data_pipeline_spark.queries_round9 import (
        _BOOT_B,
        _BOOT_CDF,
        _BOOT_SCALE,
        poisson_bootstrap_ci,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("event_type", "event_id", "value").collect())
    etype = "purchase"
    mine = [(r.event_id, r.value) for r in rows if r.event_type == etype]
    means = []
    for b in range(_BOOT_B):
        s, n = Decimal(0), 0
        for eid, v in mine:
            u = _md5_long(f"boot:{b}:{eid}") / _BOOT_SCALE
            w = 5
            for k, t in enumerate(_BOOT_CDF):
                if u < t:
                    w = k
                    break
            s += w * Decimal(repr(_round6(v)))
            n += w
        if n > 0:
            means.append((_round6(float(s) / n), b))
    means.sort()
    got = {r.event_type: r for r in
           poisson_bootstrap_ci(spark, sf_smoke).collect()}
    r = got[etype]
    assert r.n_reps == len(means)
    assert r.boot_lo == means[1][0]
    assert r.boot_hi == means[_BOOT_B - 2][0]
    assert r.boot_se > 0
    assert r.boot_lo <= r.boot_hi


def test_did_consistent_across_cells(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round9 import did_estimator

    rows = did_estimator(spark, sf_smoke).collect()
    assert len(rows) == 4
    assert len({r.did for r in rows}) == 1
    cells = {(r.arm, r.period): r.mean_spend for r in rows}
    approx = ((cells[("treatment", "post")] - cells[("treatment", "pre")])
              - (cells[("control", "post")] - cells[("control", "pre")]))
    assert abs(rows[0].did - approx) < 1e-4  # cells are rounded


def test_cuped_mass_conservation(spark, sf_smoke):
    """Global-mean centering makes the user-weighted sum of the CUPED
    adjustment zero: sum n_a * adj_a == sum n_a * raw_a (within
    rounding); rho^2 in [0, 1]; one pooled theta."""
    from travel_data_pipeline_spark.queries_round9 import (
        cuped_variance_reduction,
    )

    rows = cuped_variance_reduction(spark, sf_smoke).collect()
    assert len(rows) == 2
    assert len({r.theta for r in rows}) == 1
    raw = sum(r.n_users * r.mean_post for r in rows)
    adj = sum(r.n_users * r.adj_mean_post for r in rows)
    assert abs(raw - adj) < 0.01
    for r in rows:
        assert 0.0 <= r.var_reduction <= 1.0
