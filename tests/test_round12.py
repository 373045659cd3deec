"""Round-12 candidate queries (authored round 8) — python models and
invariants the oracle comparison can't see."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

from pyspark.sql import functions as F  # noqa: F401  (fixture parity)


def _units(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round10 import ipw_units

    return [(r.c_custkey, r.arm, Decimal(str(r.y)))
            for r in ipw_units(spark, sf_smoke).collect()]


def test_mann_whitney_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round12 import (
        mann_whitney_arms,
    )

    units = _units(spark, sf_smoke)
    groups = defaultdict(lambda: [0, 0])
    for _, arm, y in units:
        g = groups[y]
        g[0] += 1
        if arm == 1:
            g[1] += 1
    n = len(units)
    n_t = sum(1 for _, arm, _ in units if arm == 1)
    n_c = n - n_t
    cum = 0
    r2 = 0
    ties = 0
    tie_groups = 0
    for y in sorted(groups):
        cnt, cnt_t = groups[y]
        r2 += cnt_t * (2 * cum + cnt + 1)
        ties += cnt ** 3 - cnt
        if cnt > 1:
            tie_groups += 1
        cum += cnt
    u = (r2 - n_t * (n_t + 1)) / 2.0
    mean_u = n_t * n_c / 2.0
    var_u = (n_t * n_c / 12.0
             * ((n + 1) - ties / (n * (n - 1.0))))
    z = (u - mean_u) / math.sqrt(var_u)
    got = mann_whitney_arms(spark, sf_smoke).first()
    assert got.n_treat == n_t and got.n_ctrl == n_c
    assert got.tie_groups == tie_groups
    assert abs(got.u_stat - u) <= 1e-3
    assert abs(got.mean_u - mean_u) <= 1e-6
    assert abs(got.z - z) <= 1e-5
    # the md5 split is a null effect: |z| should not be extreme
    assert abs(got.z) < 5.0


def test_trimmed_mean_ate_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round12 import (
        _TRIM_DENOM,
        trimmed_mean_ate,
    )

    units = _units(spark, sf_smoke)
    got = trimmed_mean_ate(spark, sf_smoke).first()
    want = {}
    for arm in (0, 1):
        ys = sorted((y, ck) for ck, a, y in units if a == arm)
        k = len(ys) // _TRIM_DENOM
        kept = ys[k:len(ys) - k]
        want[arm] = (len(ys), len(kept),
                     float(sum(y for y, _ in kept)) / len(kept))
    assert got.n_treat == want[1][0] and got.n_ctrl == want[0][0]
    assert got.kept_treat == want[1][1] and got.kept_ctrl == want[0][1]
    assert abs(got.mean_treat - want[1][2]) <= 1e-4
    assert abs(got.mean_ctrl - want[0][2]) <= 1e-4
    assert abs(got.trimmed_ate - (want[1][2] - want[0][2])) <= 1e-4


def test_markov_entropy_reconciles_with_components(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_core import (
        event_transition_matrix,
    )
    from travel_data_pipeline_spark.queries_round9 import (
        markov_stationary_distribution,
    )
    from travel_data_pipeline_spark.queries_round12 import (
        markov_entropy_rate,
    )

    tm = event_transition_matrix(spark, sf_smoke).collect()
    sd = {r.event_type: r.stationary_p
          for r in markov_stationary_distribution(spark,
                                                  sf_smoke).collect()}
    h = -sum(sd[r.from_type] * r.p * math.log(r.p)
             for r in tm if r.p > 0)
    got = markov_entropy_rate(spark, sf_smoke).first()
    assert got.n_states == len(sd)
    assert abs(got.entropy_nats - h) <= 1e-5
    assert abs(got.entropy_bits - h / math.log(2.0)) <= 1e-5
    # entropy rate of a |S|-state chain is bounded by ln|S|
    assert 0.0 <= got.entropy_nats <= math.log(len(sd)) + 1e-9


def test_forecast_ensemble_dominates_and_weights_sum(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round12 import (
        forecast_ensemble_wape,
    )

    rows = forecast_ensemble_wape(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert abs(r.w_naive + r.w_snaive + r.w_hw - 1.0) <= 2e-6, r
        assert min(r.w_naive, r.w_snaive, r.w_hw) >= 0.0
        # triangle inequality: the convex combination's absolute
        # error is at most the weighted average of the components'
        comps = [r.wape_naive, r.wape_snaive, r.wape_hw]
        assert r.wape_ensemble <= max(comps) + 1e-6, r
        wavg = (r.w_naive * r.wape_naive + r.w_snaive * r.wape_snaive
                + r.w_hw * r.wape_hw)
        assert r.wape_ensemble <= wavg + 1e-6, r


def test_seasonal_strength_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round11 import _hw_states
    from travel_data_pipeline_spark.queries_round12 import (
        seasonal_strength,
    )

    states = _hw_states(spark, sf_smoke).collect()
    by_type = defaultdict(list)
    for r in states:
        by_type[r.event_type].append(r)
    got = {r.event_type: r
           for r in seasonal_strength(spark, sf_smoke).collect()}
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r.day)
        seasons = [r.season for r in rows]
        rs, srs, trs = [], [], []
        for i, r in enumerate(rows):
            if r.forecast is None:
                continue
            s_lag = seasons[i - 7]
            rr = float(r.cnt) - r.forecast
            rs.append(rr)
            srs.append(rr + s_lag)
            trs.append(float(r.cnt) - s_lag)

        def var(xs):
            n = len(xs)
            m = sum(xs) / n
            return sum(x * x for x in xs) / n - m * m

        g = got[et]
        assert g.n_eval == len(rs)
        assert abs(g.var_resid - var(rs)) <= 1e-4
        if var(srs) > 0:
            want = max(0.0, 1.0 - var(rs) / var(srs))
            assert abs(g.strength_seasonal - want) <= 1e-5
        if var(trs) > 0:
            want = max(0.0, 1.0 - var(rs) / var(trs))
            assert abs(g.strength_trend - want) <= 1e-5
        assert g.strength_seasonal is None or \
            0.0 <= g.strength_seasonal <= 1.0
        assert g.strength_trend is None or 0.0 <= g.strength_trend <= 1.0


def test_dedup_token_savings_reconciles(spark, sf_smoke):
    import hashlib
    import re

    from travel_data_pipeline_spark.queries_round12 import (
        dedup_token_savings,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "source", "text").collect()
    keeper = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        tk = hashlib.md5(r.text.encode()).hexdigest()
        keeper.setdefault(tk, r.doc_id)
    per = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        toks = [t for t in
                re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
                if t]
        tk = hashlib.md5(r.text.encode()).hexdigest()
        c = per[r.source]
        c[0] += 1
        c[1] += len(toks)
        if keeper[tk] != r.doc_id:
            c[2] += 1
            c[3] += len(toks)
    got = {r.source: r
           for r in dedup_token_savings(spark, sf_smoke).collect()}
    assert set(got) == set(per)
    for src, (n, tot, dd, dt) in per.items():
        g = got[src]
        assert (g.n_docs, g.total_tokens, g.dup_docs,
                g.dup_tokens) == (n, tot, dd, dt), src
        if tot:
            assert abs(g.token_savings_share - dt / tot) <= 2e-6
