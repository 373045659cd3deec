"""Semantic pins for the round-5 additions (queries_round5.py) — the
oracle differential in test_oracle.py proves engine parity; these
prove the SEMANTICS are the intended ones, with independent pure-
python recomputation for the islands and nearest-match operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_round5 import (
    _KFOLD,
    _NEAREST_TOL_US,
    _PAD_US,
    active_day_streaks,
    column_profile_stats,
    embedding_norm_stats,
    funnel_time_to_convert,
    interval_union_coverage,
    lsh_scurve_audit,
    mixture_rebalance_plan,
    nearest_error_event,
    source_lang_entropy,
    stratified_kfold_assign,
)
from travel_data_pipeline_spark.sources.readers import load_table


def test_interval_union_matches_python_merge(spark, sf_smoke):
    got = {r["user_id"]: (r["n_intervals"], r["covered_sec"])
           for r in interval_union_coverage(spark, sf_smoke).collect()}
    ev = (load_table(spark, sf_smoke, "events")
          .select("user_id", F.unix_micros("ts").alias("tus")).collect())
    by_user: dict[int, list[int]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["tus"])
    assert set(got) == set(by_user)
    for uid, tss in by_user.items():
        ivs = sorted((t - _PAD_US, t + _PAD_US) for t in tss)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = sum(e - s for s, e in merged) / 1_000_000.0
        assert got[uid][0] == len(merged)
        assert abs(got[uid][1] - covered) < 1e-6


def test_active_day_streaks_match_python(spark, sf_smoke):
    got = {r["user_id"]: (r["n_active_days"], r["longest_streak"],
                          r["streak_start"])
           for r in active_day_streaks(spark, sf_smoke).collect()}
    ev = (load_table(spark, sf_smoke, "events")
          .select("user_id",
                  F.datediff(F.date_trunc("day", "ts").cast("date"),
                             F.lit("1970-01-01").cast("date"))
                  .alias("d")).distinct().collect())
    import datetime

    by_user: dict[int, set[int]] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], set()).add(r["d"])
    assert set(got) == set(by_user)
    for uid, days in by_user.items():
        ds = sorted(days)
        best_len, best_start, run, start = 0, None, 0, None
        for i, d in enumerate(ds):
            if i == 0 or d != ds[i - 1] + 1:
                run, start = 1, d
            else:
                run += 1
            # strictly greater: ties keep the EARLIEST start
            if run > best_len:
                best_len, best_start = run, start
        want_start = (datetime.date(1970, 1, 1)
                      + datetime.timedelta(days=best_start)).isoformat()
        assert got[uid] == (len(ds), best_len, want_start)


def test_nearest_error_event_matches_bruteforce(spark, sf_smoke):
    got = {r["event_id"]: (r["err_event_id"], r["diff_sec"])
           for r in nearest_error_event(spark, sf_smoke).collect()}
    ev = (load_table(spark, sf_smoke, "events")
          .select("event_id", "user_id", "event_type",
                  F.unix_micros("ts").alias("tus")).collect())
    errs: dict[int, list] = {}
    for r in ev:
        if r["event_type"] == "error":
            errs.setdefault(r["user_id"], []).append(
                (r["tus"], r["event_id"]))
    want = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        cand = errs.get(r["user_id"], [])
        back = max(((t, i) for t, i in cand if t <= r["tus"]),
                   default=None)
        fwd = min(((t, i) for t, i in cand if t >= r["tus"]),
                  default=None)
        if back is not None and (
                fwd is None or r["tus"] - back[0] <= fwd[0] - r["tus"]):
            pick = back
        else:
            pick = fwd
        if pick is not None and abs(pick[0] - r["tus"]) <= _NEAREST_TOL_US:
            want[r["event_id"]] = (
                pick[1], (pick[0] - r["tus"]) / 1_000_000.0)
    assert set(got) == set(want)
    for eid, (err_id, diff) in want.items():
        assert got[eid][0] == err_id
        assert abs(got[eid][1] - diff) < 1e-6


def test_stratified_kfold_partitions_each_stratum(spark, sf_dir):
    rows = stratified_kfold_assign(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    by_lang: dict[str, float] = {}
    for r in rows:
        assert 0 <= r["fold"] < _KFOLD
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) \
            + r["stratum_share"]
    for share_sum in by_lang.values():
        assert abs(share_sum - 1.0) < 1e-4
    # deterministic: a rerun assigns identically
    again = stratified_kfold_assign(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_column_profile_basics(spark, sf_dir):
    rows = {r["column_name"]: r
            for r in column_profile_stats(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "orders").count()
    assert set(rows) == {"o_orderkey", "o_custkey", "o_totalprice",
                         "o_orderstatus", "o_orderpriority"}
    for r in rows.values():
        assert r["n_rows"] == n and r["n_nulls"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderstatus"]["min_val"] is None
    assert rows["o_totalprice"]["min_val"] <= \
        rows["o_totalprice"]["max_val"]


def test_mixture_rebalance_invariants(spark, sf_dir):
    rows = mixture_rebalance_plan(spark, sf_dir).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0
        assert r["expected_rows"] <= r["n_docs"]
        # under-represented sources keep everything
        if r["share"] <= r["target_share"]:
            assert r["sample_rate"] == 1.0


def test_lsh_scurve_monotone_in_jaccard(spark, sf_dir):
    rows = sorted(lsh_scurve_audit(spark, sf_dir).collect(),
                  key=lambda r: r["jaccard"])
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert 0.0 < a["p_collide"] <= 1.0
        assert a["p_collide"] <= b["p_collide"] + 1e-9
    for r in rows:
        q = 1.0 - r["jaccard"] ** 2
        assert abs(r["p_collide"] - (1.0 - q ** 4)) < 1e-5


def test_funnel_latency_ordering(spark, sf_dir):
    r = funnel_time_to_convert(spark, sf_dir).collect()[0]
    assert r["n_converted"] <= r["n_viewers"]
    if r["n_converted"]:
        assert 0.0 <= r["min_sec"] <= r["avg_sec"] <= r["max_sec"]


def test_embedding_norm_stats_bounds(spark, sf_dir):
    rows = embedding_norm_stats(spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_emb
    for r in rows:
        assert 0.0 < r["min_norm"] <= r["mean_norm"] <= r["max_norm"]


def test_source_lang_entropy_bounds(spark, sf_dir):
    rows = source_lang_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy"] <= math.log(r["n_langs"]) + 1e-6
