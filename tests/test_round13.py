"""Round-13 candidate queries (authored round 9) — python models and
invariants the oracle comparison can't see (shared-blind-spot guard:
the models below recompute the statistics independently, including a
brute-force dominance check for the skyline)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F  # noqa: F401  (fixture parity)


def _md5_arm(salt: str, key: int) -> int:
    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()
    return int(h[:15], 16) % 2


def test_srm_audit_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round11 import _PLACEBO_SALTS
    from travel_data_pipeline_spark.queries_round13 import (
        srm_assignment_audit,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    keys = [r.c_custkey
            for r in load_table(spark, sf_smoke, "customer")
            .select("c_custkey").collect()]
    got = {r.assignment: r
           for r in srm_assignment_audit(spark, sf_smoke).collect()}
    assert set(got) == {label for label, _ in _PLACEBO_SALTS}
    for label, salt in _PLACEBO_SALTS:
        n1 = sum(_md5_arm(salt, k) for k in keys)
        n0 = len(keys) - n1
        chi2 = (n0 - n1) ** 2 / len(keys)
        row = got[label]
        assert (row.n_ctrl, row.n_treat) == (n0, n1)
        assert abs(row.chi2 - chi2) < 1e-6
        # an md5 split is designed 50/50: no salt should flag at a
        # real scale factor
        assert row.status == ("srm" if chi2 > 3.841458820694124 else "ok")


def test_ucb_scores_match_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import ucb_arm_scores
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = [(r.event_type, round(r.value, 6))
          for r in load_table(spark, sf_smoke, "events")
          .select("event_type", "value").collect()]
    arms = defaultdict(lambda: [0, 0.0])
    for t, v in ev:
        arms[t][0] += 1
        arms[t][1] += v
    big_n = len(ev)
    ref = {}
    for t, (n, s) in arms.items():
        mean = s / n
        ref[t] = (n, mean, mean + math.sqrt(2 * math.log(big_n) / n))
    best = max(v[2] for v in ref.values())
    got = {r.event_type: r
           for r in ucb_arm_scores(spark, sf_smoke).collect()}
    assert set(got) == set(ref)
    n_pull = 0
    for t, (n, mean, ucb) in ref.items():
        row = got[t]
        assert row.n_pulls == n
        assert abs(row.mean_reward - mean) < 1e-5
        assert abs(row.ucb_score - ucb) < 1e-5
        if row.next_action == "pull":
            n_pull += 1
            assert abs(ucb - best) < 1e-5
    assert n_pull >= 1  # exactly one unless rounded ties
    # fewer pulls observed => strictly larger exploration bonus
    by_n = sorted(ref.items(), key=lambda kv: kv[1][0])
    for (_, (n_a, m_a, u_a)), (_, (n_b, m_b, u_b)) in zip(
            by_n, by_n[1:]):
        if n_a < n_b:
            assert (u_a - m_a) > (u_b - m_b)


def test_beta_binomial_posterior_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import (
        bayes_beta_binomial_arms,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("user_id", "event_type").collect())
    conv = defaultdict(int)
    seen = set()
    for r in rows:
        seen.add(r.user_id)
        if r.event_type == "purchase":
            conv[r.user_id] = 1
    per_arm = {0: [0, 0], 1: [0, 0]}
    for u in seen:
        a = _md5_arm("exp:", u)
        per_arm[a][0] += 1
        per_arm[a][1] += conv[u]
    got = {r.arm: r for r in bayes_beta_binomial_arms(spark,
                                                      sf_smoke).collect()}
    assert set(got) == {0, 1}
    for a, (n, c) in per_arm.items():
        row = got[a]
        assert (row.n_users, row.n_converted) == (n, c)
        assert (row.alpha, row.beta) == (1 + c, 1 + n - c)
        al, be = 1 + c, 1 + n - c
        mean = al / (al + be)
        var = al * be / ((al + be) ** 2 * (al + be + 1))
        assert abs(row.post_mean - mean) < 1e-6
        assert abs(row.post_sd - math.sqrt(var)) < 1e-6
        # posterior mean lives strictly inside (0, 1)
        assert 0.0 < row.post_mean < 1.0


def test_skyline_is_exactly_the_undominated_set(spark, sf_smoke):
    """Brute-force O(n^2) dominance over the full part table must
    reproduce the staircase output exactly — the python model checks
    the SEMANTICS, not the algorithm."""
    from travel_data_pipeline_spark.queries_round13 import (
        skyline_pareto_front,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    parts = [(r.p_partkey, r.p_retailprice, r.p_size)
             for r in load_table(spark, sf_smoke, "part")
             .select("p_partkey", "p_retailprice", "p_size").collect()]
    undominated = set()
    for k, price, size in parts:
        dominated = any(
            (q_price <= price and q_size >= size
             and (q_price < price or q_size > size))
            for _, q_price, q_size in parts)
        if not dominated:
            undominated.add(k)
    got = {r.p_partkey for r in skyline_pareto_front(spark,
                                                     sf_smoke).collect()}
    assert got == undominated and len(got) >= 1
