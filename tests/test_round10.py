"""Round-10 candidate queries (authored round 7) — invariants and
python models the oracle comparison can't see."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.lower()).strip()


def _docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet").collect()


# ---------------------------------------------------------------------------
# length_drift_wasserstein
# ---------------------------------------------------------------------------

def test_wasserstein_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _LD_BIN,
        length_drift_wasserstein,
    )

    docs = _docs(spark, sf_smoke)
    bins = [(r.source, int(math.floor(r.n_chars / float(_LD_BIN))))
            for r in docs]
    grid = sorted({b for _, b in bins})
    tot_all = len(bins)
    by_src = defaultdict(Counter)
    for s, b in bins:
        by_src[s][b] += 1
    all_c = Counter(b for _, b in bins)

    got = {r.source: r for r in
           length_drift_wasserstein(spark, sf_smoke).collect()}
    assert set(got) == set(by_src)
    for s, cnts in by_src.items():
        tot_s = sum(cnts.values())
        cum_s = cum_a = 0
        w1 = 0.0
        for b in grid:
            cum_s += cnts.get(b, 0)
            cum_a += all_c[b]
            w1 += abs(float(cum_s) / float(tot_s)
                      - float(cum_a) / float(tot_all))
        r = got[s]
        assert r.n_docs == tot_s
        assert r.n_bins == len(grid)
        assert r.w1_bins == _round6(w1)
        # W1 on a shared grid is bounded by the grid span
        assert 0.0 <= r.w1_bins <= len(grid)


# ---------------------------------------------------------------------------
# ab_power_mde
# ---------------------------------------------------------------------------

def test_ab_power_mde_model_and_monotone(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _POWER_Z,
        _Z_ALPHA,
        ab_power_mde,
    )

    events = spark.read.parquet(f"{sf_smoke}/events.parquet").collect()
    n = [0, 0]
    x = [0, 0]
    for e in events:
        a = _md5_long(f"ab:{e.user_id}") % 2
        n[a] += 1
        x[a] += 1 if e.event_type == "purchase" else 0

    rows = {r.power_level: r for r in ab_power_mde(spark, sf_smoke).collect()}
    assert set(rows) == {lbl for lbl, _ in _POWER_Z}
    zmap = dict(_POWER_Z)
    mdes = []
    for lbl, r in rows.items():
        assert (r.n_ctrl, r.n_treat, r.x_ctrl, r.x_treat) == (
            n[0], n[1], x[0], x[1])
        assert 0 < r.x_ctrl < r.n_ctrl and 0 < r.x_treat < r.n_treat
        p = float(r.x_ctrl + r.x_treat) / float(r.n_ctrl + r.n_treat)
        mde = ((_Z_ALPHA + zmap[lbl])
               * math.sqrt(p * (1.0 - p)
                           * (1.0 / float(r.n_ctrl)
                              + 1.0 / float(r.n_treat))))
        assert r.p_pool == _round6(p)
        assert r.mde_abs == _round6(mde)
        assert r.mde_rel == _round6(mde / p)
        mdes.append((zmap[lbl], r.mde_abs))
    # higher power demands a larger detectable effect
    mdes.sort()
    assert mdes[0][1] < mdes[1][1] < mdes[2][1]


# ---------------------------------------------------------------------------
# dp_noisy_event_counts
# ---------------------------------------------------------------------------

def test_dp_noise_matches_inverse_cdf_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _DP_EPS,
        dp_noisy_event_counts,
    )

    rows = dp_noisy_event_counts(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        u = (_md5_long(f"dp:{r.event_type}") % 1000000 + 0.5) / 1000000.0
        noise = (-(1.0 / _DP_EPS) * math.copysign(1.0, u - 0.5)
                 * math.log(1.0 - 2.0 * abs(u - 0.5)))
        assert r.noise == _round6(noise) + 0.0
        assert r.noisy_count == _round6(r.n + noise) + 0.0
        assert r.epsilon == _DP_EPS
        assert r.epsilon_total == _DP_EPS * len(rows)


def test_dp_noise_is_replayable(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        dp_noisy_event_counts,
    )

    a = sorted(map(tuple, dp_noisy_event_counts(spark, sf_smoke).collect()))
    b = sorted(map(tuple, dp_noisy_event_counts(spark, sf_smoke).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# ipw_ate_stratified
# ---------------------------------------------------------------------------

def test_ipw_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        ipw_ate_stratified,
    )

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").collect()
    cust = {r.c_custkey: r.c_mktsegment for r in
            spark.read.parquet(f"{sf_smoke}/customer.parquet").collect()}
    y = defaultdict(Decimal)
    for o in orders:
        y[o.o_custkey] += Decimal(repr(o.o_totalprice)).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP)
    strata = defaultdict(lambda: [0, 0, Decimal(0), Decimal(0)])
    for ck, yv in y.items():
        seg = cust[ck]
        arm = _md5_long(f"exp:{ck}") % 2
        st = strata[seg]
        st[0] += 1
        if arm == 1:
            st[1] += 1
            st[2] += yv
        else:
            st[3] += yv

    rows = {r.segment: r for r in
            ipw_ate_stratified(spark, sf_smoke).collect()}
    big_n = sum(st[0] for st in strata.values())
    terms = []
    for seg in sorted(strata):
        n, n_t, sy_t, sy_c = strata[seg]
        mean_t = float(sy_t) / float(n_t)
        mean_c = float(sy_c) / float(n - n_t)
        r = rows[seg]
        assert (r.n, r.n_treat) == (n, n_t)
        assert r.e_hat == _round6(float(n_t) / float(n))
        assert r.mean_treat == _round6(mean_t)
        assert r.mean_ctrl == _round6(mean_c)
        assert r.ate == _round6(mean_t - mean_c) + 0.0
        terms.append((float(n) / float(big_n)) * (mean_t - mean_c))
    allr = rows["ALL"]
    assert allr.n == big_n
    assert allr.mean_treat is None and allr.mean_ctrl is None
    assert allr.ate == _round6(_seq_sum(terms)) + 0.0


def _seq_sum(xs):
    acc = 0.0
    for x in xs:
        acc += x
    return acc


# ---------------------------------------------------------------------------
# conformal_interval_coverage
# ---------------------------------------------------------------------------

def test_conformal_q_is_exact_order_statistic(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        conformal_interval_coverage,
    )

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").collect()
    split = [(o.o_orderkey, o.o_orderpriority, o.o_totalprice,
              _md5_long(f"cf:{o.o_orderkey}") % 10) for o in orders]
    model = {}
    sums = defaultdict(lambda: [Decimal(0), 0])
    for k, pri, y, b in split:
        if b <= 5:
            s = sums[pri]
            s[0] += Decimal(repr(y)).quantize(Decimal("0.01"),
                                              rounding=ROUND_HALF_UP)
            s[1] += 1
    for pri, (sy, n) in sums.items():
        model[pri] = float(sy) / float(n)
    calib = sorted((abs(y - model[pri]), k)
                   for k, pri, y, b in split if 6 <= b <= 8)
    n_cal = len(calib)
    k_idx = (9 * (n_cal + 1) + 9) // 10
    q_hat = calib[k_idx - 1][0]
    test = [(pri, abs(y - model[pri]) <= q_hat)
            for k, pri, y, b in split if b == 9]

    rows = {r.priority: r for r in
            conformal_interval_coverage(spark, sf_smoke).collect()}
    assert rows["ALL"].q_hat == _round6(q_hat)
    n_test = len(test)
    n_cov = sum(1 for _, c in test if c)
    assert rows["ALL"].n_test == n_test
    assert rows["ALL"].n_covered == n_cov
    assert rows["ALL"].coverage == _round6(float(n_cov) / float(n_test))
    # split-conformal guarantee is >= 1 - alpha in expectation; allow
    # generous finite-sample slack at smoke scale
    assert rows["ALL"].coverage >= 0.75


# ---------------------------------------------------------------------------
# negative_sampling_table
# ---------------------------------------------------------------------------

def test_negative_sampling_model_and_boost_order(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        negative_sampling_table,
    )

    docs = _docs(spark, sf_smoke)
    freq = Counter()
    for d in docs:
        freq.update(w for w in _norm(d.text).split(" ") if w)
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    ws = {t: math.sqrt(f * math.sqrt(f)) for t, f in top}
    z = _seq_sum([w for _, w in sorted(ws.items())])
    f_tot = sum(f for _, f in top)

    rows = {r.token: r for r in
            negative_sampling_table(spark, sf_smoke).collect()}
    assert set(rows) == {t for t, _ in top}
    for t, f in top:
        r = rows[t]
        assert r.freq == f
        assert r.prob_smoothed == _round6(ws[t] / z)
        assert r.prob_freq == _round6(float(f) / float(f_tot))
        assert r.boost == _round6((ws[t] / z) / (float(f) / float(f_tot)))
    # boost is monotone non-increasing in frequency (f^{-1/4} shape)
    by_freq = sorted(rows.values(), key=lambda r: (-r.freq, r.token))
    for a, b in zip(by_freq, by_freq[1:]):
        if a.freq > b.freq:
            assert a.boost <= b.boost
    # probabilities sum to ~1 (rounding tolerance only)
    assert abs(sum(r.prob_smoothed for r in rows.values()) - 1.0) < 1e-3
    assert abs(sum(r.prob_freq for r in rows.values()) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------

def test_hill_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _HILL_K,
        hill_tail_index,
    )

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").collect()
    top = sorted(((o.o_totalprice, o.o_orderkey) for o in orders),
                 key=lambda t: (-t[0], t[1]))[:_HILL_K]
    k = len(top)
    x_k = top[-1][0]
    terms = [(i + 1, math.log(x) - math.log(x_k))
             for i, (x, _) in enumerate(top[:-1])]
    s = _seq_sum([t for _, t in sorted(terms)])
    gamma = s / float(k - 1)

    r = hill_tail_index(spark, sf_smoke).collect()
    assert len(r) == 1
    r = r[0]
    assert r.k == k
    assert r.x_k == x_k
    assert r.hill_gamma == _round6(gamma)
    assert r.hill_alpha == _round6(float(k - 1) / s)
    assert r.hill_gamma > 0


# ---------------------------------------------------------------------------
# vocab_jaccard_source_matrix
# ---------------------------------------------------------------------------

def test_vocab_jaccard_bounds_and_pair_count(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        vocab_jaccard_source_matrix,
    )

    rows = vocab_jaccard_source_matrix(spark, sf_smoke).collect()
    assert rows
    sources = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_inter <= min(r.size_a, r.size_b) or r.n_inter == 0
        assert 0.0 <= r.jaccard <= 1.0
        expected = r.n_inter / float(r.size_a + r.size_b - r.n_inter)
        assert r.jaccard == _round6(expected)
        sources.update((r.source_a, r.source_b))
    # every unordered pair appears at most once
    pairs = {(r.source_a, r.source_b) for r in rows}
    assert len(pairs) == len(rows)
    assert len(rows) <= len(sources) * (len(sources) - 1) // 2


# ---------------------------------------------------------------------------
# dup_pairs_cross_shard
# ---------------------------------------------------------------------------

def test_dup_cross_shard_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _DPX_SHARDS,
        dup_pairs_cross_shard,
    )
    from travel_data_pipeline_spark.queries_northstar import PLANT_OFFSET

    docs = _docs(spark, sf_smoke)
    aug = [(d.doc_id, d.text) for d in docs]
    aug += [(d.doc_id + PLANT_OFFSET, d.text) for d in docs if d.doc_id < 5]
    groups = defaultdict(list)
    for doc_id, text in aug:
        key = hashlib.md5(_norm(text).encode()).hexdigest()
        groups[key].append(_md5_long(f"shard:{doc_id}") % _DPX_SHARDS)
    n_groups = n_docs = total = same = 0
    for shards in groups.values():
        n = len(shards)
        if n <= 1:
            continue
        n_groups += 1
        n_docs += n
        total += n * (n - 1) // 2
        c = Counter(shards)
        same += sum(v * (v - 1) // 2 for v in c.values())

    r = dup_pairs_cross_shard(spark, sf_smoke).collect()[0]
    assert r.n_dup_groups == n_groups
    assert r.n_dup_docs == n_docs
    assert r.pairs_total == total
    assert r.pairs_same_shard == same
    assert r.pairs_cross_shard == total - same
    assert r.pairs_total == r.pairs_same_shard + r.pairs_cross_shard
    if total:
        assert r.cross_share == _round6((total - same) / float(total))
    # the smoke corpus has the 5 planted dup groups
    assert n_groups >= 1


# ---------------------------------------------------------------------------
# image_ahash_neardup
# ---------------------------------------------------------------------------

def _ahash_bands(payload: bytes) -> list[int]:
    px = []
    for s in range(4):
        px.extend(hashlib.md5(payload + b":" + str(s).encode()).digest())
    total = sum(px)
    bands = [0, 0, 0, 0]
    for i, p in enumerate(px):
        if 64 * p > total:
            bands[i // 16] |= 1 << (i % 16)
    return bands


def test_ahash_finds_planted_copies_with_zero_hamming(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _AH_HAM,
        image_ahash_neardup,
    )
    from travel_data_pipeline_spark.queries_northstar import PLANT_OFFSET

    rows = image_ahash_neardup(spark, sf_smoke).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    # the five planted byte-identical copies collide at hamming 0
    for d in range(5):
        assert pairs.get((d, d + PLANT_OFFSET)) == 0
    for (a, b), h in pairs.items():
        assert a < b
        assert 0 <= h <= _AH_HAM


def test_ahash_fingerprints_match_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.operators.multimodal import (
        ahash_fingerprints,
        documents_as_media,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(20)
    fps = {r.media_id: r for r in
           ahash_fingerprints(documents_as_media(docs)).collect()}
    for d in docs.collect():
        bands = _ahash_bands(d.text.encode("utf-8"))
        r = fps[d.doc_id]
        assert [r.band0, r.band1, r.band2, r.band3] == bands
        for b in bands:
            assert 0 <= b <= 0xFFFF


# ---------------------------------------------------------------------------
# neardup_chain_inflation
# ---------------------------------------------------------------------------

def test_chain_inflation_invariants_and_edge_conservation(spark, sf_smoke):
    from travel_data_pipeline_spark.operators import dedup
    from travel_data_pipeline_spark.queries_round10 import (
        _CHAIN_THR,
        neardup_chain_inflation,
    )
    from travel_data_pipeline_spark.queries_northstar import (
        BANDS,
        MAX_BUCKET,
        NUM_HASHES,
        _augmented_docs,
    )

    docs = _augmented_docs(spark, sf_smoke)
    sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=NUM_HASHES,
                                      bands=BANDS, max_bucket=MAX_BUCKET)
    edges = [(r.doc_a, r.doc_b) for r in
             dedup.jaccard_pairs(docs, pairs,
                                 threshold=_CHAIN_THR).collect()]
    # union-find model
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_of = {x: find(x) for x in parent}
    sizes = Counter(comp_of.values())
    direct = Counter(comp_of[a] for a, _ in edges)

    rows = neardup_chain_inflation(spark, sf_smoke).collect()
    assert {r.component for r in rows} == set(sizes)
    for r in rows:
        assert r.cluster_size == sizes[r.component] >= 2
        assert r.direct_pairs == direct[r.component]
        assert r.implied_pairs == (r.cluster_size
                                   * (r.cluster_size - 1) // 2)
        assert r.chained_pairs == r.implied_pairs - r.direct_pairs
        assert r.chained_pairs >= 0
    assert sum(r.direct_pairs for r in rows) == len(edges)


# ---------------------------------------------------------------------------
# t_closeness_audit
# ---------------------------------------------------------------------------

def test_t_closeness_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _LD_BIN,
        _TC_T,
        t_closeness_audit,
    )

    docs = _docs(spark, sf_smoke)
    rows = [(d.lang, d.source, int(math.floor(d.n_chars / float(_LD_BIN))))
            for d in docs]
    grid = sorted({b for _, _, b in rows})
    tot_all = len(rows)
    all_c = Counter(b for _, _, b in rows)
    cells = defaultdict(Counter)
    for lang, src, b in rows:
        cells[(lang, src)][b] += 1

    got = {(r.lang, r.source): r for r in
           t_closeness_audit(spark, sf_smoke).collect()}
    assert set(got) == set(cells)
    for key, cnts in cells.items():
        n = sum(cnts.values())
        cum_c = cum_a = 0
        emd = 0.0
        for b in grid:
            cum_c += cnts.get(b, 0)
            cum_a += all_c[b]
            emd += (abs(float(cum_c) / float(n)
                        - float(cum_a) / float(tot_all))
                    / float(len(grid) - 1))
        r = got[key]
        assert r.n == n
        assert r.emd == _round6(emd)
        assert 0.0 <= r.emd <= 1.0
        assert r.within_t == (1 if _round6(emd) <= _TC_T else 0)


# ---------------------------------------------------------------------------
# bm25_ndcg_at_k
# ---------------------------------------------------------------------------

def test_ndcg_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _NDCG_DISC,
        _NDCG_K,
        bm25_ndcg_at_k,
    )
    from travel_data_pipeline_spark.queries_search import (
        _B,
        _K1,
        _QUERY_TERMS,
    )

    docs = _docs(spark, sf_smoke)
    toks = {d.doc_id: [w for w in _norm(d.text).split(" ") if w]
            for d in docs}
    dls = {k: len(v) for k, v in toks.items()}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / float(n_docs)
    tf = defaultdict(Counter)
    for k, ws in toks.items():
        for w in ws:
            if w in _QUERY_TERMS:
                tf[k][w] += 1
    dfreq = Counter()
    for k, c in tf.items():
        dfreq.update(c.keys())
    graded = {}
    for k, c in tf.items():
        terms = []
        for term in sorted(c):
            idf = math.log((n_docs - dfreq[term] + 0.5)
                           / (dfreq[term] + 0.5) + 1.0)
            tfn = (c[term] * (_K1 + 1.0)
                   / (c[term] + _K1 * (1.0 - _B + _B * dls[k] / avgdl)))
            terms.append(idf * tfn)
        s_tot = _seq_sum(terms)
        nt = len(c)
        gain = 7 if nt >= 3 else (3 if nt == 2 else 1)
        graded[k] = (s_tot, gain)

    ranking = sorted(graded.items(),
                     key=lambda kv: (-kv[1][0], kv[0]))[:_NDCG_K]
    ideal = sorted(graded.items(),
                   key=lambda kv: (-kv[1][1], kv[0]))[:_NDCG_K]
    cs = [g * _NDCG_DISC[i + 1] for i, (_, (_, g)) in enumerate(ranking)]
    ics = [g * _NDCG_DISC[i + 1] for i, (_, (_, g)) in enumerate(ideal)]

    got = {r.k: r for r in bm25_ndcg_at_k(spark, sf_smoke).collect()}
    assert set(got) == set(range(1, len(cs) + 1))
    for k in got:
        dcg = _seq_sum(cs[:k])
        idcg = _seq_sum(ics[:k])
        r = got[k]
        assert r.dcg == _round6(dcg)
        assert r.idcg == _round6(idcg)
        assert r.ndcg == _round6(dcg / idcg)
        assert r.dcg <= r.idcg + 1e-9
        assert 0.0 < r.ndcg <= 1.0
    # IDCG is monotone non-decreasing in k
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[a].idcg <= got[b].idcg


# ---------------------------------------------------------------------------
# brier_decomposition
# ---------------------------------------------------------------------------

def test_brier_decomposition_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        brier_decomposition,
    )

    docs = _docs(spark, sf_smoke)
    probs = []
    feats = []
    for d in docs:
        n_chars = len(d.text)
        alpha = len(re.sub(r"[^A-Za-z]", "", d.text))
        n_tokens = len([w for w in _norm(d.text).split(" ") if w])
        ar = _round6(alpha / max(n_chars, 1))
        sr = _round6((n_chars - alpha) / max(n_chars, 1))
        mwl = _round6(alpha / max(n_tokens, 1))
        ll = _round6(math.log10(float(n_chars) + 1.0))
        score = _round6(-2.0 + 3.5 * ar - 6.0 * (1.0 - ar)
                        + 0.08 * mwl + 0.9 * ll) + 0.0
        truth = n_tokens >= 10 and mwl <= 12.0 and sr <= 0.35
        feats.append((score, truth))
    mn = min(s for s, _ in feats)
    mx = max(s for s, _ in feats)
    for s, t in feats:
        p = 0.5 if mx == mn else _round6((s - mn) / (mx - mn))
        probs.append((p, t))

    n = len(probs)
    n_pos = sum(1 for _, t in probs if t)
    obar = float(n_pos) / float(n)
    # exact Brier via 6-dp decimals (the engines' decimal row sums)
    sq = sum((Decimal(repr(p)).quantize(Decimal("0.000001"),
                                        rounding=ROUND_HALF_UP)
              - (1 if t else 0)) ** 2 for p, t in probs)
    brier = float(sq) / float(n)
    bins = defaultdict(lambda: [0, Decimal(0), 0])
    for p, t in probs:
        b = min(int(math.floor(p * 10)), 9)
        cell = bins[b]
        cell[0] += 1
        cell[1] += Decimal(repr(p)).quantize(Decimal("0.000001"),
                                             rounding=ROUND_HALF_UP)
        cell[2] += 1 if t else 0
    rel = res = 0.0
    for b in sorted(bins):
        nb, sp, npos = bins[b]
        pbar = float(sp) / float(nb)
        ok = float(npos) / float(nb)
        w = float(nb) / float(n)
        rel += w * (pbar - ok) * (pbar - ok)
        res += w * (ok - obar) * (ok - obar)

    r = brier_decomposition(spark, sf_smoke).collect()[0]
    assert r.n == n
    assert r.o_bar == _round6(obar)
    assert r.brier == _round6(brier)
    assert r.uncertainty == _round6(obar * (1.0 - obar))
    assert r.reliability == _round6(rel)
    assert r.resolution == _round6(res)
    assert r.brier_binned == _round6(obar * (1.0 - obar) - res + rel) + 0.0
    # the binned decomposition under-counts by the within-bin variance
    assert r.brier >= r.brier_binned - 1e-6
    assert 0.0 <= r.resolution <= r.uncertainty + 1e-9


# ---------------------------------------------------------------------------
# hash_split_uniformity_audit
# ---------------------------------------------------------------------------

def test_hash_uniformity_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _CHI2_CRIT_15,
        _SPLIT_BUCKETS,
        hash_split_uniformity_audit,
    )

    users = {e.user_id for e in
             spark.read.parquet(f"{sf_smoke}/events.parquet").collect()}
    counts = Counter(_md5_long(f"ab:{u}") % _SPLIT_BUCKETS for u in users)
    n = len(users)
    exp = float(n) / float(_SPLIT_BUCKETS)
    # full grid: EMPTY buckets contribute (0 - E)^2/E
    chi2 = _seq_sum([
        (float(counts.get(b, 0)) - exp) * (float(counts.get(b, 0)) - exp)
        / exp
        for b in range(_SPLIT_BUCKETS)])

    rows = {r.split_name: r for r in
            hash_split_uniformity_audit(spark, sf_smoke).collect()}
    assert set(rows) == {"ab", "exp", "cf"}
    ab = rows["ab"]
    assert ab.n_units == n
    assert ab.chi2 == _round6(chi2)
    assert ab.dof == _SPLIT_BUCKETS - 1
    assert ab.uniform_ok == (1 if chi2 <= _CHI2_CRIT_15 else 0)
    for r in rows.values():
        assert r.min_bucket <= r.max_bucket
        assert r.chi2 >= 0.0


# ---------------------------------------------------------------------------
# markov_removal_attribution
# ---------------------------------------------------------------------------

def _dec6(x) -> Decimal:
    return Decimal(repr(float(x))).quantize(Decimal("0.000001"),
                                            rounding=ROUND_HALF_UP)


def test_markov_removal_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _MRA_ITERS,
        markov_removal_attribution,
    )

    events = sorted(
        spark.read.parquet(f"{sf_smoke}/events.parquet").collect(),
        key=lambda e: (e.user_id, e.ts, e.event_id))
    # journeys truncated at the first purchase
    journeys = defaultdict(list)
    for e in events:
        seq = journeys[e.user_id]
        if any(s == "conv" for s in seq):
            continue
        seq.append("conv" if e.event_type == "purchase" else e.event_type)
    trans = Counter()
    for seq in journeys.values():
        trans[("start", seq[0])] += 1
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
        if seq[-1] != "conv":
            trans[(seq[-1], "null")] += 1
    tot = Counter()
    for (f, t), n in trans.items():
        tot[f] += n
    p6 = {(f, t): _dec6(n / float(tot[f])) for (f, t), n in trans.items()}
    states = sorted(tot)
    channels = [s for s in states if s != "start"]

    def p_conv(removed):
        dom = [s for s in states if s != removed]
        b = {s: p6.get((s, "conv"), Decimal(0)) for s in dom}
        x = dict(b)
        for _ in range(_MRA_ITERS - 1):
            nx = {}
            for s in dom:
                acc = Decimal(0)
                for t in channels:
                    if t == removed or t in ("conv", "null", "start"):
                        continue
                    acc += p6.get((s, t), Decimal(0)) * x.get(t, Decimal(0))
                nx[s] = Decimal(b[s] + acc).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP)
            x = nx
        return x["start"]

    p_all = p_conv(None)
    rows = {r.channel: r for r in
            markov_removal_attribution(spark, sf_smoke).collect()}
    assert set(rows) == set(channels)
    res = {}
    for ch in channels:
        p_rm = p_conv(ch)
        res[ch] = 1.0 - float(p_rm) / float(p_all)
        r = rows[ch]
        assert r.p_conv_all == _round6(float(p_all))
        assert r.p_conv_removed == _round6(float(p_rm))
        assert r.removal_effect == _round6(res[ch]) + 0.0
        # deleting a channel cannot help conversion (up to rounding)
        assert r.p_conv_removed <= r.p_conv_all + 1e-6
    s_re = _seq_sum([res[ch] for ch in sorted(res)])
    for ch in channels:
        assert rows[ch].attribution_share == _round6(res[ch] / s_re) + 0.0
    assert abs(sum(r.attribution_share for r in rows.values()) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# holt_backtest_mape
# ---------------------------------------------------------------------------

def test_holt_backtest_matches_published_states(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _HBT_BURN,
        holt_backtest_mape,
    )
    from travel_data_pipeline_spark.queries_timeseries import (
        holt_linear_daily,
    )

    base = sorted(holt_linear_daily(spark, sf_smoke).collect(),
                  key=lambda r: (r.event_type, r.day))
    series = defaultdict(list)
    for r in base:
        series[r.event_type].append(r)
    rows = {r.event_type: r for r in
            holt_backtest_mape(spark, sf_smoke).collect()}
    assert set(rows) == set(series)
    for et, seq in series.items():
        apes, naive = [], []
        for i in range(_HBT_BURN, len(seq)):
            prev, cur = seq[i - 1], seq[i]
            apes.append(abs(float(cur.cnt) - (prev.level + prev.trend))
                        / float(cur.cnt))
            naive.append(abs(float(cur.cnt) - float(prev.cnt))
                         / float(cur.cnt))
        r = rows[et]
        assert r.n_eval == len(apes)
        mape = _seq_sum(apes) / float(len(apes))
        mnaive = _seq_sum(naive) / float(len(naive))
        assert r.mape == _round6(mape)
        assert r.mape_naive == _round6(mnaive)
        assert r.skill_vs_naive == _round6(1.0 - mape / mnaive) + 0.0


# ---------------------------------------------------------------------------
# ipf_raking_weights
# ---------------------------------------------------------------------------

def test_ipf_converges_toward_both_margins(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        ipf_raking_weights,
    )

    docs = _docs(spark, sf_smoke)
    t_lang = Counter(d.lang for d in docs)
    t_src = Counter(d.source for d in docs)
    rows = ipf_raking_weights(spark, sf_smoke).collect()
    assert rows
    # weighted cell counts should reproduce both margins closely
    # (IPF converges geometrically; 4 rounds is plenty at this size)
    got_lang = defaultdict(float)
    got_src = defaultdict(float)
    for r in rows:
        assert r.weight > 0
        got_lang[r.lang] += r.weight * r.n_sample
        got_src[r.source] += r.weight * r.n_sample
    for lang, t in t_lang.items():
        assert abs(got_lang[lang] - t) / t < 0.02, (lang, got_lang[lang], t)
    for src, t in t_src.items():
        assert abs(got_src[src] - t) / t < 0.05, (src, got_src[src], t)


# ---------------------------------------------------------------------------
# eval_scorecard
# ---------------------------------------------------------------------------

def test_scorecard_matches_component_queries(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_cleaning import (
        classifier_auc_rank,
    )
    from travel_data_pipeline_spark.queries_round8 import (
        cdf_calibration_bins,
    )
    from travel_data_pipeline_spark.queries_round10 import (
        bm25_ndcg_at_k,
        brier_decomposition,
        eval_scorecard,
    )

    card = {r.metric: r.value for r in
            eval_scorecard(spark, sf_smoke).collect()}
    assert set(card) == {"auc", "brier", "reliability", "ece",
                         "ndcg_at_10"}
    auc = classifier_auc_rank(spark, sf_smoke).collect()[0].auc
    bd = brier_decomposition(spark, sf_smoke).collect()[0]
    bins = sorted(cdf_calibration_bins(spark, sf_smoke).collect(),
                  key=lambda r: r.bin)
    ndcg = {r.k: r.ndcg for r in bm25_ndcg_at_k(spark, sf_smoke).collect()}
    assert card["auc"] == auc
    assert card["brier"] == bd.brier
    assert card["reliability"] == bd.reliability
    assert card["ece"] == _round6(_seq_sum([r.ece_term for r in bins]))
    assert card["ndcg_at_10"] == ndcg[10]
    for v in card.values():
        assert 0.0 <= v <= 1.0


# ---------------------------------------------------------------------------
# quantization_distortion_bins
# ---------------------------------------------------------------------------

def test_quantization_distortion_matches_python_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        _QD_BIN,
        _QD_CAP,
        quantization_distortion_bins,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").collect()
    cells = defaultdict(lambda: [0, 0.0])
    for r in emb:
        v = [float(x) for x in r.embedding]
        mx = max(abs(x) for x in v) / 127.0
        scale = 1.0 if mx == 0.0 else mx
        qv = [int(max(-127.0, min(127.0, _round0(x / scale)))) for x in v]
        dq = [qi * scale for qi in qv]
        dot = _seq_sum([a * (b) for a, b in zip(v, dq)])
        nv2 = _seq_sum([a * a for a in v])
        nq2 = _seq_sum([b * b for b in dq])
        den = math.sqrt(nv2) * math.sqrt(nq2)
        if den == 0.0:
            continue
        gap = 1.0 - dot / den
        b = min(int(math.floor(gap * _QD_BIN)), _QD_CAP)
        cell = cells[(r.label, b)]
        cell[0] += 1
        cell[1] = max(cell[1], gap)

    rows = {(r.label, r.bin): r for r in
            quantization_distortion_bins(spark, sf_smoke).collect()}
    assert set(rows) == set(cells)
    for key, (n, mx) in cells.items():
        assert rows[key].n == n
        assert rows[key].max_gap == _round6(mx) + 0.0
    # distortion is tiny but NOT zero — int8 really moves the vectors
    assert sum(n for n, _ in cells.values()) == len(emb)
    assert any(b > 0 for _, b in cells)


def _round0(x: float) -> float:
    # Spark F.round(x) == HALF_UP on the shortest decimal rendering
    return float(Decimal(repr(x)).quantize(Decimal("1"),
                                           rounding=ROUND_HALF_UP))
