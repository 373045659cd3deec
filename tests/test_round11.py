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
