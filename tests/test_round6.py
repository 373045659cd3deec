"""Semantic pins for the round-6 candidate queries
(queries_round6.py) — engine/oracle parity is proven by
test_oracle.py; these pin the intended semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_round6 import (
    _BFS_HOPS,
    _LO_TOPK,
    _PATH_LEN,
    _PATH_TOPK,
    abc_pareto_classes,
    copurchase_bfs_hops,
    dau_wau_mau,
    funnel_windowed_stages,
    session_top_paths,
    source_term_log_odds,
    text_readability_scores,
    user_lifecycle_states,
)
from travel_data_pipeline_spark.sources.readers import load_table


def test_bfs_hops_invariants(spark, sf_dir):
    rows = copurchase_bfs_hops(spark, sf_dir).collect()
    hops = [r["hop"] for r in rows]
    assert hops.count(0) == 1                      # exactly one source
    assert all(0 <= h <= _BFS_HOPS for h in hops)
    assert len({r["l_partkey"] for r in rows}) == len(rows)
    # BFS frontier invariant: every hop level h > 0 implies some
    # vertex exists at level h-1
    present = set(hops)
    for h in present:
        if h > 0:
            assert h - 1 in present


def test_abc_classes_partition_revenue(spark, sf_dir):
    rows = {r["abc_class"]: r
            for r in abc_pareto_classes(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    total = sum(r["class_revenue"] for r in rows.values())
    if "C" in rows:  # Pareto shape: A-head out-earns the C-tail
        assert rows["A"]["class_revenue"] > rows["C"]["class_revenue"]
        assert rows["A"]["class_revenue"] >= 0.5 * total


def test_session_paths_shape(spark, sf_dir):
    rows = session_top_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= _PATH_TOPK
    for a, b in zip(rows, rows[1:]):
        assert (a["n_sessions"], b["path"]) >= (b["n_sessions"], a["path"])
    for r in rows:
        assert 1 <= len(r["path"].split(">")) <= _PATH_LEN


def test_dau_wau_mau_ordering(spark, sf_dir):
    rows = dau_wau_mau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["dau"] <= r["wau"] <= r["mau"]


def test_readability_bounds(spark, sf_dir):
    rows = text_readability_scores(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r["n_sents"] >= 1
        if r["n_words"] > 0:
            assert r["flesch"] is not None
            assert r["n_syllables"] >= r["n_words"] * 0  # defined
        else:
            assert r["flesch"] is None


def test_funnel_stages_monotone(spark, sf_dir):
    r = funnel_windowed_stages(spark, sf_dir).collect()[0]
    assert r["n_purchase_7d"] <= r["n_click_7d"] <= r["n_view"]
    assert r["n_view"] > 0


def test_log_odds_topk_per_source(spark, sf_dir):
    rows = source_term_log_odds(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    srcs = {r["source"] for r in
            load_table(spark, sf_dir, "documents")
            .select("source").distinct().collect()}
    assert set(by_src) == srcs
    for terms in by_src.values():
        assert len(terms) == _LO_TOPK
        los = [t["log_odds"] for t in terms]
        assert los == sorted(los, reverse=True)


def test_lifecycle_states_account_for_every_active_user(spark, sf_dir):
    rows = user_lifecycle_states(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    daily = {r["day"]: r["n"] for r in ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
        .alias("day")).agg(F.count_distinct("user_id").alias("n"))
        .collect()}
    by_day: dict[str, int] = {}
    new_total = 0
    for r in rows:
        assert r["state"] in {"new", "active", "resurrected"}
        by_day[r["day"]] = by_day.get(r["day"], 0) + r["n_users"]
        if r["state"] == "new":
            new_total += r["n_users"]
    assert by_day == daily  # states partition each day's actives
    assert new_total == ev.select("user_id").distinct().count()


def test_bfs_hops_deep_chain_and_convergence(spark):
    """VERDICT r05 #4: the iterative bfs_hops must traverse chains
    DEEPER than the registered query's 3-hop anchor, stop at
    max_hops when bounded, and converge (stop issuing rounds) on its
    own when unbounded."""
    from travel_data_pipeline_spark.operators.graph import bfs_hops

    # undirected 8-node chain 0-1-2-...-7 (diameter 7 > 3)
    chain = [(i, i + 1) for i in range(7)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "s long, d long")
    src = spark.createDataFrame([(0, 0)], "vertex long, hop long")

    full = {r.vertex: r.hop for r in bfs_hops(edges, src).collect()}
    assert full == {i: i for i in range(8)}  # converged past depth 3

    capped = {r.vertex: r.hop
              for r in bfs_hops(edges, src, max_hops=3).collect()}
    assert capped == {i: i for i in range(4)}

    # min-hop invariant on a graph with a shortcut: 0->1->2->3 chain
    # plus a direct 0->3 edge — hop(3) must be 1, not 3
    sc = [(0, 1), (1, 2), (2, 3), (0, 3)]
    edges2 = spark.createDataFrame(
        sc + [(b, a) for a, b in sc], "s long, d long")
    got = {r.vertex: r.hop for r in bfs_hops(edges2, src).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1}
