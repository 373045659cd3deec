"""Round-15 tests: independent python models for the survival,
isotonic-calibration, HITS, and randomized-response queries (oracle
parity proves engine agreement; these catch shared-blind-spot bugs)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import travel_data_pipeline_spark.registry  # noqa: F401  (import order)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_nelson_aalen_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round15 import (
        nelson_aalen_hazard,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = [(r.user_id, r.ts.date()) for r in
          load_table(spark, sf_smoke, "events")
          .select("user_id", "ts").collect()]
    first, last = {}, {}
    for u, d in ev:
        first[u] = min(first.get(u, d), d)
        last[u] = max(last.get(u, d), d)
    max_day = max(last.values())
    lives = [((last[u] - first[u]).days, 1 if last[u] == max_day else 0)
             for u in first]
    byt = defaultdict(lambda: [0, 0])
    for t, c in lives:
        byt[t][c] += 1  # [deaths, censored]
    n_risk = len(lives)
    h = vh = 0.0
    want = {}
    for t in sorted(byt):
        d, c = byt[t]
        if d > 0:
            h += d / n_risk
            vh += d / (n_risk * n_risk)
            want[t] = (d, n_risk, h, vh, math.exp(-h))
        n_risk -= d + c
    got = {r.t: r for r in nelson_aalen_hazard(spark, sf_smoke).collect()}
    assert set(got) == set(want)
    for t, (d, nr, hh, vv, s) in want.items():
        row = got[t]
        assert (row.d, row.n_risk) == (d, nr)
        assert abs(row.cum_hazard - hh) < 1e-6
        assert abs(row.var_hazard - vv) < 1e-6
        assert abs(row.fh_survival - s) < 1e-6
    # cumulative hazard must be nondecreasing in t
    hs = [got[t].cum_hazard for t in sorted(got)]
    assert hs == sorted(hs)


def _pava(y: list[float], w: list[int]) -> list[float]:
    """Classic sequential pool-adjacent-violators (the algorithm the
    minimax closed form must reproduce)."""
    blocks = [[y[i], w[i]] for i in range(len(y))]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-15:
            v1, w1 = blocks[i]
            v2, w2 = blocks[i + 1]
            blocks[i:i + 2] = [[(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2]]
            i = max(i - 1, 0)
        else:
            i += 1
    out = []
    for v, ww in blocks:
        out.extend([v] * ww)
    return out


def test_isotonic_minimax_equals_pava(spark, sf_smoke):
    """The relational minimax form must equal sequential PAVA on the
    actual bin relation, and the fit must be monotone."""
    from travel_data_pipeline_spark.queries_round15 import (
        isotonic_calibration_bins,
    )
    from travel_data_pipeline_spark.queries_round8 import (
        calibration_binned,
    )

    bins = sorted(
        [(r.bin, r.n, r.n_pos)
         for r in calibration_binned(spark, sf_smoke).collect()])
    rates = [p / n for _, n, p in bins]
    weights = [n for _, n, _ in bins]
    # _pava expands each weighted block back to weight-many entries;
    # the first entry of each bin's span is that bin's fitted value
    blocks = _pava(rates, weights)
    per_bin = []
    pos = 0
    for w in weights:
        per_bin.append(blocks[pos])
        pos += w
    got = {r.bin: r for r in
           isotonic_calibration_bins(spark, sf_smoke).collect()}
    assert sorted(got) == [b for b, _, _ in bins]
    for (b, _n, _p), fit in zip(bins, per_bin):
        assert abs(got[b].iso_rate - fit) < 1e-6, (b, got[b].iso_rate, fit)
    iso_seq = [got[b].iso_rate for b, _, _ in bins]
    assert iso_seq == sorted(iso_seq)
    # the fit must differ from the raw rates somewhere UNLESS the raw
    # rates are already monotone (otherwise the test proves nothing)
    if rates != sorted(rates):
        assert any(abs(got[b].iso_rate - got[b].pos_rate) > 1e-9
                   for b, _, _ in bins)


def test_hits_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round15 import (
        _HITS_ITER,
        hits_supplier_part,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    li = [(r.l_suppkey, r.l_partkey) for r in
          load_table(spark, sf_smoke, "lineitem")
          .select("l_suppkey", "l_partkey").collect()]
    w = defaultdict(int)
    for s, p in li:
        w[(s, p)] += 1
    hub = {s: 1.0 for s, _ in w}
    auth = {}
    for _ in range(_HITS_ITER):
        auth = defaultdict(float)
        # sorted by s within each p: mirror the pinned fold order
        by_p = defaultdict(list)
        for (s, p), ww in w.items():
            by_p[p].append((s, ww))
        for p, lst in by_p.items():
            acc = 0.0
            for s, ww in sorted(lst):
                acc += ww * hub[s]
            auth[p] = acc
        m = max(auth.values())
        auth = {p: v / m for p, v in auth.items()}
        by_s = defaultdict(list)
        for (s, p), ww in w.items():
            by_s[s].append((p, ww))
        hub = {}
        for s, lst in by_s.items():
            acc = 0.0
            for p, ww in sorted(lst):
                acc += ww * auth[p]
            hub[s] = acc
        m = max(hub.values())
        hub = {s: v / m for s, v in hub.items()}
    got = hits_supplier_part(spark, sf_smoke).collect()
    got_hub = {r.node_id: r.score for r in got if r.role == "hub"}
    got_auth = {r.node_id: r.score for r in got if r.role == "authority"}
    assert set(got_hub) == set(hub) and set(got_auth) == set(auth)
    for s, v in hub.items():
        assert abs(got_hub[s] - v) < 1e-5
    for p, v in auth.items():
        assert abs(got_auth[p] - v) < 1e-5
    # normalization contract: max score is exactly 1 on both roles
    assert max(got_hub.values()) == 1.0
    assert max(got_auth.values()) == 1.0


def test_randomized_response_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round15 import (
        _RR_KEEP_DEN,
        _RR_KEEP_NUM,
        _RR_THRESH,
        randomized_response_debias,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = [(r.event_id, r.event_type, r.value) for r in
          load_table(spark, sf_smoke, "events")
          .select("event_id", "event_type", "value").collect()]
    agg = defaultdict(lambda: [0, 0, 0])  # n, n_true, n_reported
    for eid, et, v in ev:
        truth = 1 if v is not None and v > _RR_THRESH else 0
        keep = _md5_long(f"rrkeep:{eid}") % _RR_KEEP_DEN
        coin = _md5_long(f"rrcoin:{eid}") % 2
        rep = truth if keep < _RR_KEEP_NUM else coin
        a = agg[et]
        a[0] += 1
        a[1] += truth
        a[2] += rep
    p_keep = _RR_KEEP_NUM / _RR_KEEP_DEN
    got = {r.event_type: r
           for r in randomized_response_debias(spark, sf_smoke).collect()}
    assert set(got) == set(agg)
    for et, (n, nt, nr) in agg.items():
        row = got[et]
        assert (row.n, row.n_true, row.n_reported) == (n, nt, nr)
        deb = (nr / n - (1 - p_keep) * 0.5) / p_keep
        assert abs(row.debiased_rate - deb) < 1e-6
        assert abs(row.true_rate - nt / n) < 1e-6
        # the debiased estimate should sit near the hidden true rate
        # (binomial noise at n~200: generous 0.25 tolerance)
        assert abs(deb - nt / n) < 0.25
