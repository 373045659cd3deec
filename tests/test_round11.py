"""Round-11 candidate queries (authored round 8) — invariants and
python models the oracle comparison can't see."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# aipw_doubly_robust
# ---------------------------------------------------------------------------

def _all_row(df, col):
    rows = {r.segment: r for r in df.collect()}
    assert "ALL" in rows
    return rows["ALL"][col], rows


def test_aipw_saturated_equals_stratified_ate(spark, sf_smoke):
    """The VERDICT r07 identity: under a SATURATED outcome model the
    augmentation terms vanish and AIPW == the stratified ATE."""
    from travel_data_pipeline_spark.queries_round10 import (
        ipw_ate_stratified,
    )
    from travel_data_pipeline_spark.queries_round11 import _aipw_frame

    aipw, rows = _all_row(_aipw_frame(spark, sf_smoke, saturated=True),
                          "aipw_term")
    ipw_all = {r.segment: r for r in
               ipw_ate_stratified(spark, sf_smoke).collect()}["ALL"]
    assert abs(aipw - ipw_all.ate) <= 1e-4, (aipw, ipw_all.ate)
    # saturated corrections are float-cancellation zeros per stratum
    for seg, r in rows.items():
        if seg == "ALL" or r.aug_treat is None:
            continue
        assert abs(r.aug_treat) <= 1e-4 and abs(r.aug_ctrl) <= 1e-4, r


def test_aipw_model_independence_given_exact_propensity(spark, sf_smoke):
    """Double-robustness, the strong form: with the EXACT propensity
    e_s = n_t/n the outcome model cancels algebraically, so even the
    deliberately coarse registered model lands on the stratified ATE
    (up to float cancellation) — while its per-stratum corrections
    are genuinely non-zero (the model is wrong; the weighting fixes
    it)."""
    from travel_data_pipeline_spark.queries_round10 import (
        ipw_ate_stratified,
    )
    from travel_data_pipeline_spark.queries_round11 import (
        aipw_doubly_robust,
    )

    aipw, rows = _all_row(aipw_doubly_robust(spark, sf_smoke),
                          "aipw_term")
    ipw_all = {r.segment: r for r in
               ipw_ate_stratified(spark, sf_smoke).collect()}["ALL"]
    assert abs(aipw - ipw_all.ate) <= 1e-3, (aipw, ipw_all.ate)
    nonzero = [r for seg, r in rows.items()
               if seg != "ALL" and r.aug_treat is not None
               and abs(r.aug_treat) > 1.0]
    assert nonzero, "coarse-model corrections should do real work"


# ---------------------------------------------------------------------------
# gap_sequence_patterns — brute-force python recomputation
# ---------------------------------------------------------------------------

def test_gap_patterns_match_bruteforce(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round11 import (
        _GSP_GAP,
        _GSP_MAXLEN,
        _GSP_TOPK,
        gap_sequence_patterns,
    )

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type))
    support = defaultdict(int)
    for rows in by_user.values():
        rows.sort()
        sessions, cur, prev_ts = [], [], None
        for ts, _eid, et in rows:
            if prev_ts is not None and (
                    (ts - prev_ts).total_seconds() > 1800):
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev_ts = ts
        sessions.append(cur)
        for s in sessions:
            a = s[:_GSP_MAXLEN]
            pats = set()
            for i in range(len(a)):
                for d1 in range(1, _GSP_GAP + 2):
                    for d2 in range(1, _GSP_GAP + 2):
                        # engine is 1-based (i+d1+d2 <= len); 0-based here
                        if i + d1 + d2 <= len(a) - 1:
                            pats.add(f"{a[i]}>{a[i + d1]}"
                                     f">{a[i + d1 + d2]}")
            for p in pats:
                support[p] += 1
    want = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))
    want = want[:_GSP_TOPK]
    got = [(r.pattern, r.n_sessions)
           for r in gap_sequence_patterns(spark, sf_smoke).collect()]
    assert got == want, (got[:3], want[:3])


# ---------------------------------------------------------------------------
# holt_winters_daily — exact-decimal python walk
# ---------------------------------------------------------------------------

def _d6(x) -> Decimal:
    return Decimal(x).quantize(Decimal("0.000001"),
                               rounding=ROUND_HALF_UP)


def test_holt_winters_matches_decimal_model(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round11 import (
        _HW_CONST,
        _HW_M,
        holt_winters_daily,
    )

    got = holt_winters_daily(spark, sf_smoke).collect()
    by_type = defaultdict(list)
    for r in got:
        by_type[r.event_type].append(r)
    a = Decimal(_HW_CONST["A"])
    a1 = Decimal(_HW_CONST["A1"])
    b = Decimal(_HW_CONST["B"])
    b1 = Decimal(_HW_CONST["B1"])
    g = Decimal(_HW_CONST["G"])
    g1 = Decimal(_HW_CONST["G1"])
    m = _HW_M
    assert by_type, "no event types emitted"
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r.day)
        assert len(rows) > m, (et, len(rows))
        cnts = [Decimal(r.cnt) for r in rows]
        # init: double mean of first m, 6-dp HALF_UP (engine spelling)
        mean = float(sum(int(c) for c in cnts[:m])) / float(m)
        l0 = _d6(repr(mean))
        lvl, trd = l0, Decimal(0)
        seas = [_d6(c - l0) for c in cnts[:m]]
        for i, r in enumerate(rows):
            if i < m:
                assert Decimal(repr(r.level)) == l0, (et, r)
                assert r.trend == 0.0 and r.forecast is None
                assert Decimal(repr(r.season)) == seas[i], (et, r)
                continue
            sm = seas[i - m]
            fc = lvl + trd + sm
            lt = _d6(a * (cnts[i] - sm) + a1 * (lvl + trd))
            bt = _d6(b * (lt - lvl) + b1 * trd)
            st = _d6(g * (cnts[i] - lt) + g1 * sm)
            assert Decimal(repr(r.level)) == lt, (et, r.day, r.level, lt)
            assert Decimal(repr(r.trend)) == bt
            assert Decimal(repr(r.season)) == st
            assert Decimal(repr(r.forecast)) == fc
            lvl, trd = lt, bt
            seas.append(st)


def test_holt_winters_backtest_reconciles_with_states(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round11 import (
        _hw_states,
        holt_winters_backtest,
    )

    states = _hw_states(spark, sf_smoke).collect()
    by_type = defaultdict(list)
    for r in states:
        by_type[r.event_type].append(r)
    got = {r.event_type: r
           for r in holt_winters_backtest(spark, sf_smoke).collect()}
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r.day)
        serr = serr_n = 0.0
        actual = n_eval = 0
        for prev, r in zip(rows, rows[1:]):
            if r.forecast is None:
                continue
            serr += abs(float(r.cnt) - r.forecast)
            serr_n += abs(float(r.cnt) - float(prev.cnt))
            actual += r.cnt
            n_eval += 1
        gr = got[et]
        assert gr.n_eval == n_eval
        assert abs(gr.wape - serr / actual) <= 2e-6, (et, gr)
        assert abs(gr.wape_naive - serr_n / actual) <= 2e-6
        if serr_n > 0:
            assert abs(gr.skill_vs_naive - (1.0 - serr / serr_n)) <= 2e-6


# ---------------------------------------------------------------------------
# weighted_reservoir_topk — exact python recomputation
# ---------------------------------------------------------------------------

def test_weighted_reservoir_matches_python_model(spark, sf_smoke):
    import hashlib
    import math

    from travel_data_pipeline_spark.queries_round11 import (
        _WR_K,
        weighted_reservoir_topk,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "n_chars").collect()
    keyed = []
    for r in docs:
        h = int(hashlib.md5(f"wr:{r.doc_id}".encode())
                .hexdigest()[:15], 16)
        u = (h % 1_000_000 + 0.5) / 1_000_000.0
        w = r.n_chars + 1
        keyed.append((math.log(u) / float(w), r.doc_id, w))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    want = [(i + 1, d, w) for i, (_, d, w) in enumerate(keyed[:_WR_K])]
    got = [(r.rank, r.doc_id, r.weight)
           for r in weighted_reservoir_topk(spark, sf_smoke)
           .orderBy("rank").collect()]
    assert got == want
    # weight-proportional selection pulls the mean weight UP
    corpus_mean = sum(r.n_chars + 1 for r in docs) / len(docs)
    sel_mean = sum(w for _, _, w in want) / len(want)
    assert sel_mean > corpus_mean, (sel_mean, corpus_mean)


# ---------------------------------------------------------------------------
# ratio_metric_delta_ci — python delta-method recomputation
# ---------------------------------------------------------------------------

def test_ratio_metric_delta_ci_matches_python(spark, sf_smoke):
    import hashlib
    import math

    from travel_data_pipeline_spark.queries_round11 import (
        ratio_metric_delta_ci,
    )

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_custkey", "o_totalprice").collect()
    per_cust = defaultdict(lambda: [0, Decimal(0)])
    for r in orders:
        c = per_cust[r.o_custkey]
        c[0] += 1
        c[1] += Decimal(str(r.o_totalprice)).quantize(Decimal("0.01"))
    arms = defaultdict(list)
    for ck, (x, y) in per_cust.items():
        h = int(hashlib.md5(f"exp:{ck}".encode()).hexdigest()[:15], 16)
        arms[h % 2].append((x, float(y)))
    got = {r.arm: r for r in
           ratio_metric_delta_ci(spark, sf_smoke).collect()}
    stats = {}
    for arm, xs in arms.items():
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        r_hat = sy / sx
        sxx = sum(x * x for x, _ in xs)
        syy = sum(y * y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        quad = (syy - sy * sy / n + r_hat * r_hat * (sxx - sx * sx / n)
                - 2.0 * r_hat * (sxy - sx * sy / n))
        var_r = max(0.0, quad / (n - 1)) / (n * (sx / n) ** 2)
        stats[str(arm)] = (n, r_hat, math.sqrt(var_r), var_r)
        g = got[str(arm)]
        assert g.n == n
        assert abs(g.ratio - r_hat) <= 1e-5
        assert abs(g.se - math.sqrt(var_r)) <= 1e-5
        assert g.ci_lo < g.ratio < g.ci_hi
    d = got["DIFF"]
    n0, r0, _, v0 = stats["0"]
    n1, r1, _, v1 = stats["1"]
    assert d.n == n0 + n1
    assert abs(d.ratio - (r1 - r0)) <= 1e-5
    assert abs(d.se - math.sqrt(v0 + v1)) <= 1e-5


# ---------------------------------------------------------------------------
# shard_balance_audit — reconciliation with the registered packer
# ---------------------------------------------------------------------------

def test_shard_balance_reconciles_with_packer(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_curation import (
        pack_token_shards,
    )
    from travel_data_pipeline_spark.queries_round11 import (
        shard_balance_audit,
    )

    packed = pack_token_shards(spark, sf_smoke).collect()
    shards = defaultdict(int)
    for r in packed:
        shards[(r.source, r.lang, r.shard_id)] += r.n_tokens
    groups = defaultdict(list)
    for (s, lg, _), tok in shards.items():
        groups[(s, lg)].append(tok)
    got = {(r.source, r.lang): r
           for r in shard_balance_audit(spark, sf_smoke).collect()}
    assert set(got) == set(groups)
    for key, toks in groups.items():
        g = got[key]
        assert g.n_shards == len(toks)
        assert g.total_tokens == sum(toks)
        assert g.max_tokens == max(toks) and g.min_tokens == min(toks)
        mean = sum(toks) / len(toks)
        if sum(toks) > 0:
            var = sum(t * t for t in toks) / len(toks) - mean * mean
            assert abs(g.cv - math.sqrt(max(0.0, var)) / mean) <= 1e-5
            assert abs(g.max_over_mean - max(toks) / mean) <= 1e-5


# ---------------------------------------------------------------------------
# crosslingual_semantic_pairs — reconciliation with the LSH operator
# ---------------------------------------------------------------------------

def test_crosslingual_cells_reconcile_with_lsh_pairs(spark, sf_smoke):
    from travel_data_pipeline_spark.operators import similarity
    from travel_data_pipeline_spark.queries_round11 import (
        _XL_TAU,
        crosslingual_semantic_pairs,
    )

    emb = (spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    planes = similarity.random_planes(16, 64)
    pairs = similarity.cosine_near_dup_lsh(
        emb, planes, bands=2, threshold=_XL_TAU,
        max_bucket=1000).collect()
    lang = {r.doc_id: r.lang for r in spark.read.parquet(
        f"{sf_smoke}/documents.parquet").select("doc_id",
                                                "lang").collect()}
    cells = defaultdict(list)
    for p in pairs:
        la, lb = lang[p.vec_a], lang[p.vec_b]
        if la == lb:
            continue
        cells[(min(la, lb), max(la, lb))].append(p.cosine_sim)
    got = {(r.lang_a, r.lang_b): r
           for r in crosslingual_semantic_pairs(spark,
                                                sf_smoke).collect()}
    assert set(got) == set(cells)
    for key, cos in cells.items():
        g = got[key]
        assert g.n_pairs == len(cos)
        assert abs(g.mean_cos - sum(cos) / len(cos)) <= 2e-6
        assert abs(g.max_cos - max(cos)) <= 1e-9
        assert g.mean_cos >= _XL_TAU - 1e-9


# ---------------------------------------------------------------------------
# kmv_overlap_audit — python sketch recomputation + accuracy bound
# ---------------------------------------------------------------------------

def test_kmv_overlap_matches_python_sketch(spark, sf_smoke):
    import hashlib

    from travel_data_pipeline_spark.queries_round11 import (
        _KMV_K,
        _KMV_M,
        kmv_overlap_audit,
    )

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "event_type", "user_id").distinct().collect()
    users = defaultdict(set)
    for r in ev:
        users[r.event_type].add(r.user_id)

    def h(u):
        return int(hashlib.md5(f"kmv:{u}".encode()).hexdigest()[:15], 16)

    sketches = {t: sorted(h(u) for u in us)[:_KMV_K]
                for t, us in users.items()}

    def est(sk):
        return (float(len(sk)) if len(sk) < _KMV_K
                else (_KMV_K - 1.0) * float(_KMV_M) / float(sk[-1]))

    got = {(r.type_a, r.type_b): r
           for r in kmv_overlap_audit(spark, sf_smoke).collect()}
    types = sorted(users)
    seen_pairs = set()
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            exact = len(users[ta] & users[tb])
            if exact == 0:
                assert (ta, tb) not in got
                continue
            seen_pairs.add((ta, tb))
            g = got[(ta, tb)]
            assert g.exact_inter == exact
            assert abs(g.est_a - est(sketches[ta])) <= 1e-4
            assert abs(g.est_b - est(sketches[tb])) <= 1e-4
            u = sorted(set(sketches[ta]) | set(sketches[tb]))
            kp = min(_KMV_K, len(u))
            su = u[:kp]
            d_u = (float(len(u)) if len(u) < _KMV_K
                   else (_KMV_K - 1.0) * float(_KMV_M) / float(su[-1]))
            sa, sb = set(sketches[ta]), set(sketches[tb])
            rho = sum(1 for x in su if x in sa and x in sb) / float(kp)
            assert abs(g.est_inter - rho * d_u) <= 1e-4, (ta, tb)
            # sketch accuracy: ~1/sqrt(K) class; loose 3-sigma bound
            if exact >= 50:
                assert abs(g.est_inter - exact) / exact < 0.5
    assert set(got) == seen_pairs


# ---------------------------------------------------------------------------
# embedding_outlier_mahalanobis — python recomputation
# ---------------------------------------------------------------------------

def test_mahalanobis_outliers_match_python(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_round11 import (
        _MAH_TOPK,
        embedding_outlier_mahalanobis,
    )

    rows = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").select(
        "vec_id", "label", "embedding").collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r.label].append((r.vec_id, [float(x) for x in r.embedding]))
    got = defaultdict(list)
    for r in embedding_outlier_mahalanobis(spark, sf_smoke) \
            .orderBy("label", "rank").collect():
        got[r.label].append((r.rank, r.vec_id, r.z2))
    for label, vecs in by_label.items():
        vecs.sort()  # vec_id order == the engines' pinned fold order
        dims = len(vecs[0][1])
        n = float(len(vecs))
        mus, sds = [], []
        for d in range(dims):
            s = 0.0
            for _, v in vecs:
                s += v[d]
            mu = s / n
            s2 = 0.0
            for _, v in vecs:
                s2 += v[d] * v[d]
            var = max(0.0, s2 / n - mu * mu)
            mus.append(mu)
            sds.append(math.sqrt(var))
        scored = []
        for vid, v in vecs:
            z2 = 0.0
            for d in range(dims):
                if sds[d] == 0.0:
                    continue
                t = (v[d] - mus[d]) / sds[d]
                z2 += t * t
            scored.append((vid, z2))
        scored.sort(key=lambda t: (-t[1], t[0]))
        want = [(i + 1, vid) for i, (vid, _) in
                enumerate(scored[:_MAH_TOPK])]
        assert [(rk, vid) for rk, vid, _ in got[label]] == want, label
        for (rk, vid, z2), (_, wz) in zip(
                got[label], [(vid, z) for vid, z in scored[:_MAH_TOPK]]):
            assert abs(z2 - wz) <= 1e-4, (label, rk)


# ---------------------------------------------------------------------------
# quantile_treatment_effects — python order-statistic recomputation
# ---------------------------------------------------------------------------

def test_qte_matches_python_order_stats(spark, sf_smoke):
    import hashlib

    from travel_data_pipeline_spark.queries_round11 import (
        quantile_treatment_effects,
    )

    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_custkey", "o_totalprice").collect()
    per = defaultdict(Decimal)
    for r in orders:
        per[r.o_custkey] += Decimal(str(r.o_totalprice)).quantize(
            Decimal("0.01"))
    arms = defaultdict(list)
    for ck, y in per.items():
        h = int(hashlib.md5(f"exp:{ck}".encode()).hexdigest()[:15], 16)
        arms[h % 2].append((y, ck))
    for a in arms.values():
        a.sort()
    got = {r.quartile: r for r in
           quantile_treatment_effects(spark, sf_smoke).collect()}
    assert set(got) == {1, 2, 3}
    for q in (1, 2, 3):
        want = {}
        for arm, ys in arms.items():
            k = -(-q * len(ys) // 4)  # ceil(q*n/4)
            want[arm] = float(ys[k - 1][0])
        g = got[q]
        assert g.y_treat == want[1] and g.y_ctrl == want[0], q
        assert abs(g.qte - (want[1] - want[0])) <= 1e-6


# ---------------------------------------------------------------------------
# james_stein_segment_lifts — shrinkage algebra
# ---------------------------------------------------------------------------

def test_james_stein_shrinkage_algebra(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round11 import (
        james_stein_segment_lifts,
    )

    rows = james_stein_segment_lifts(spark, sf_smoke).collect()
    assert rows
    live = [r for r in rows if r.raw_lift is not None]
    assert len(live) >= 2
    d_bar = live[0].grand_lift
    c = live[0].shrink_c
    assert all(r.grand_lift == d_bar and r.shrink_c == c for r in live)
    assert 0.0 <= c <= 1.0
    # shrunk = d_bar + c * (raw - d_bar), and shrinkage contracts
    # toward the grand lift
    for r in live:
        want = d_bar + c * (r.raw_lift - d_bar)
        assert abs(r.shrunk_lift - want) <= 1e-3, r
        assert (abs(r.shrunk_lift - d_bar)
                <= abs(r.raw_lift - d_bar) + 1e-9), r
        assert r.se is None or r.se > 0
    # precision-weighted grand lift lies inside the raw-lift envelope
    raws = [r.raw_lift for r in live]
    assert min(raws) - 1e-9 <= d_bar <= max(raws) + 1e-9


# ---------------------------------------------------------------------------
# ate_placebo_refutation — assignment independence
# ---------------------------------------------------------------------------

def test_placebo_refutation_shape_and_distinct_splits(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import (
        ipw_ate_stratified,
    )
    from travel_data_pipeline_spark.queries_round11 import (
        ate_placebo_refutation,
    )

    rows = {r.assignment: r
            for r in ate_placebo_refutation(spark, sf_smoke).collect()}
    assert set(rows) == {"real", "placebo1", "placebo2", "placebo3"}
    # the 'real' row IS the registered stratified ATE's ALL row
    ipw_all = {r.segment: r for r in
               ipw_ate_stratified(spark, sf_smoke).collect()}["ALL"]
    assert rows["real"].ate == ipw_all.ate
    assert rows["real"].n == ipw_all.n
    assert rows["real"].n_treat == ipw_all.n_treat
    # placebo splits are genuinely different assignments
    treats = {r.n_treat for r in rows.values()}
    ates = {r.ate for r in rows.values()}
    assert len(treats) >= 2 or len(ates) >= 2
    for r in rows.values():
        assert r.ate is not None and abs(r.ate) < 1e7


# ---------------------------------------------------------------------------
# dedup_scorecard — reconciliation with the component queries
# ---------------------------------------------------------------------------

def test_dedup_scorecard_reconciles_with_components(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_northstar import (
        containment_pairs,
        dedup_minhash_lsh,
        dedup_rate_by_source,
        simhash_near_pairs,
    )
    from travel_data_pipeline_spark.queries_round9 import (
        cosine_threshold_sweep,
    )
    from travel_data_pipeline_spark.queries_round11 import (
        _DS_TAU,
        dedup_scorecard,
    )

    got = {r.method: r for r in dedup_scorecard(spark, sf_smoke).collect()}
    assert set(got) == {"exact", "minhash_lsh", "simhash",
                        "containment", "semantic"}
    n_docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").count()

    exact_flagged = sum(r.n_dups for r in
                        dedup_rate_by_source(spark, sf_smoke).collect())
    assert got["exact"].n_docs_flagged == exact_flagged
    assert got["exact"].n_pairs is None

    for method, fn in [("minhash_lsh", dedup_minhash_lsh),
                       ("simhash", simhash_near_pairs),
                       ("containment", containment_pairs)]:
        pairs = fn(spark, sf_smoke).collect()
        assert got[method].n_pairs == len(pairs), method
        flagged = len({p.doc_b for p in pairs})
        assert got[method].n_docs_flagged == flagged, method
        assert abs(got[method].flag_rate - flagged / n_docs) <= 2e-6

    sw = {r.threshold: r for r in
          cosine_threshold_sweep(spark, sf_smoke).collect()}[_DS_TAU]
    assert got["semantic"].n_pairs == sw.n_pairs
    assert got["semantic"].n_docs_flagged == sw.n_docs_dropped
    assert got["semantic"].flag_rate == sw.removal_share


# ---------------------------------------------------------------------------
# ate_bootstrap_ci — python bootstrap recomputation
# ---------------------------------------------------------------------------

def test_ate_bootstrap_matches_python(spark, sf_smoke):
    import hashlib
    import math

    from travel_data_pipeline_spark.queries_round9 import (
        _BOOT_CDF,
        _BOOT_SCALE,
    )
    from travel_data_pipeline_spark.queries_round10 import ipw_units
    from travel_data_pipeline_spark.queries_round11 import (
        _ATE_B,
        _ATE_HI_RANK,
        _ATE_LO_RANK,
        ate_bootstrap_ci,
    )

    units = [(r.c_custkey, r.segment, r.arm, float(r.y))
             for r in ipw_units(spark, sf_smoke).collect()]

    def weight(b, ck):
        h = int(hashlib.md5(f"bate:{b}:{ck}".encode()).hexdigest()[:15],
                16)
        un = h / _BOOT_SCALE
        for k, t in enumerate(_BOOT_CDF):
            if un < t:
                return k
        return 5

    ates = []
    for b in range(_ATE_B):
        cells = defaultdict(lambda: [0, 0, 0.0, 0.0])
        for ck, seg, arm, y in units:
            w = weight(b, ck)
            c = cells[seg]
            c[0] += w
            if arm == 1:
                c[1] += w
                c[2] += w * y
            else:
                c[3] += w * y
        bign = sum(c[0] for c in cells.values())
        terms = []
        for seg in sorted(cells):
            nw, ntw, sytw, sycw = cells[seg]
            if ntw == 0 or nw - ntw == 0:
                continue
            terms.append((nw / bign)
                         * (sytw / ntw - sycw / (nw - ntw)))
        if terms:
            ates.append(sum(terms))
    ates.sort()
    got = ate_bootstrap_ci(spark, sf_smoke).first()
    assert got.n_reps == len(ates) == _ATE_B
    assert abs(got.boot_lo - ates[_ATE_LO_RANK - 1]) <= 1e-4
    assert abs(got.boot_hi - ates[_ATE_HI_RANK - 1]) <= 1e-4
    ms = [round(a, 6) for a in ates]
    mean = sum(ms) / len(ms)
    se = math.sqrt(sum((m - mean) ** 2 for m in ms) / (len(ms) - 1))
    assert abs(got.boot_se - se) <= 1e-3
    assert got.boot_lo <= got.boot_hi
    # the md5 split is a null effect: the point estimate sits inside
    # (or at least near) the bootstrap band
    assert got.boot_lo - 3 * got.boot_se <= got.point_ate \
        <= got.boot_hi + 3 * got.boot_se
