"""Physical-plan audits: the 100 TB posture is only real if the plans
show it. Each test pins a property that must survive refactors —
pushdown reaching the scan, dims broadcast, no duplicate exchanges,
window-limit pushdown, JVM-only expressions (no Python eval in the
relational query surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from travel_data_pipeline_spark.plans.flights import flight_value_query
from travel_data_pipeline_spark.registry import QUERIES
from travel_data_pipeline_spark.sources.readers import load_table


def _plan(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def _shuffle_exchanges(plan: str) -> int:
    """Count shuffle Exchange nodes in the plan tree (BroadcastExchange
    excluded — it is the cheap side by design)."""
    return sum(1 for line in plan.splitlines() if "- Exchange (" in line)


def test_flagship_single_exchange_and_window_limit(spark, sf_smoke):
    plan = _plan(flight_value_query(spark, sf_smoke))
    # one repartition exchange serves both window passes
    assert _shuffle_exchanges(plan) == 1, plan
    # top-1 pushes down as WindowGroupLimit
    assert "WindowGroupLimit" in plan
    # orders scan is pruned to the two needed columns
    assert "o_orderkey:bigint,o_orderdate" in plan.replace(" ", "")


def test_flagship_agg_variant_has_no_window(spark, sf_smoke):
    from travel_data_pipeline_spark.plans.flights import flight_value_agg_query

    plan = _plan(flight_value_agg_query(spark, sf_smoke))
    # the cluster-scale form: pure two-stage aggregation, zero sorts
    # of the fact; both exchanges sit above partial aggregates
    assert "Window" not in plan, plan
    assert _shuffle_exchanges(plan) == 2, plan
    assert "Aggregate" in plan


def test_filter_pushdown_reaches_scan(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    df = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]" \
        in plan, plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_dimension_joins_broadcast(spark, sf_smoke):
    plan = _plan(QUERIES["j2_dim_fanout"](spark, sf_smoke))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_anti_plan_shapes(spark, sf_smoke):
    semi_plan = _plan(QUERIES["semi_join_active_customers"](spark, sf_smoke))
    anti_plan = _plan(QUERIES["anti_join_idle_customers"](spark, sf_smoke))
    assert "LeftSemi" in semi_plan
    assert "LeftAnti" in anti_plan


def test_no_python_udfs_in_relational_queries(spark, sf_smoke):
    """Everything except the two sanctioned Pandas surfaces must stay
    JVM-side — BatchEvalPython/ArrowEvalPython in a plan means a Python
    UDF crept into the hot path."""
    sanctioned = {"multimodal_decode_meta", "multimodal_frame_sample"}
    offenders = []
    for name, fn in QUERIES.items():
        if name in sanctioned:
            continue
        plan = _plan(fn(spark, sf_smoke), "extended")
        if "EvalPython" in plan or "PythonUDF" in plan:
            offenders.append(name)
    assert not offenders, f"Python UDFs in: {offenders}"


def test_pivot_single_aggregate_pass(spark, sf_smoke):
    """Explicit pivot values -> no extra job to discover keys; the plan
    reads the input once (partial + final agg), no join or union of
    per-type subplans."""
    plan = _plan(QUERIES["a5_pivot_wide"](spark, sf_smoke))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "Join" not in plan and "Union" not in plan


def test_q5_broadcasts_small_dims(spark, sf_smoke):
    plan = _plan(QUERIES["tpch_q5_local_supplier_volume"](spark, sf_smoke))
    # nation + region must never shuffle
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_join_hints_respected(spark, sf_smoke):
    """Strategy hints must survive to the physical plan — at 100 TB the
    one place the optimizer needs a human override is a dim that is
    small in stats but large in reality (or vice versa)."""
    li = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders")
    merged = li.join(o.hint("merge"), li["l_orderkey"] == o["o_orderkey"])
    assert "SortMergeJoin" in _plan(merged)
    shuffled = li.join(o.hint("shuffle_hash"), li["l_orderkey"] == o["o_orderkey"])
    assert "ShuffledHashJoin" in _plan(shuffled)
    bcast = li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"])
    assert "BroadcastHashJoin" in _plan(bcast)


@pytest.mark.parametrize("name", ["dedup_minhash_lsh"])
def test_dedup_has_no_self_join(spark, sf_smoke, name):
    """MinHash pair generation is bucket-local: exactly one aggregate
    over the banded rows, no join operator at all in the pair step."""
    plan = _plan(QUERIES[name](spark, sf_smoke))
    assert "Join" not in plan.split("== Physical Plan ==")[-1] or \
        "BroadcastHashJoin" not in plan.split("Generate explode")[0], plan


def test_simhash_pair_join_reads_only_the_checkpoint(spark, sf_smoke):
    """SimHash pair generation (r5 shape) is a self-join ON THE
    MATERIALIZED band relation: both join inputs must read the shared
    materialization — i.e. the fingerprint build runs once and is
    never recomputed by the pair step (the failure mode bucket_pairs
    existed to prevent). r14 made the materialization persist()
    (InMemoryTableScan inputs); r15 reverted to the eager
    localCheckpoint (Scan ExistingRDD inputs) on the measured
    self-join rule — accept either mode. explain renders the
    cached relation's subtree (incl. its explode) inline at each
    reference, so the no-recompute assertion is on the join INPUT
    nodes, not on a text-wide explode ban."""
    plan = _plan(QUERIES["simhash_near_pairs"](spark, sf_smoke))
    phys = plan.split("== Physical Plan ==")[-1]
    n_mat = phys.count("Scan ExistingRDD") + phys.count("InMemoryTableScan")
    assert n_mat >= 2, plan
    # exactly ONE materialized relation feeds both sides: with
    # persist, every InMemoryRelation in the rendered plan must be
    # the same cached subtree (the band relation), and no explode may
    # appear OUTSIDE a cached/ExistingRDD subtree. The top-level plan
    # section before the first cache/RDD leaf must stay explode-free.
    head = phys.split("InMemoryRelation")[0].split("Scan ExistingRDD")[0]
    assert "Generate explode" not in head, plan


@pytest.mark.parametrize("name", ["attribution_last_click",
                                  "event_pattern_match",
                                  "sessionize_events"])
def test_stream_shaped_window_ops_single_shuffle(spark, sf_smoke, name):
    """The per-user window family must stay ONE user_id shuffle — a
    second exchange would mean someone re-introduced a self-join or
    broke window-partitioning reuse."""
    plan = _plan(QUERIES[name](spark, sf_smoke))
    assert _shuffle_exchanges(plan) <= 2, plan  # sessionize: window + groupBy reuse
    if name in ("attribution_last_click", "event_pattern_match"):
        assert _shuffle_exchanges(plan) == 1, plan


def test_mmr_final_plan_corpus_free(spark, sf_smoke):
    """The greedy MMR steps materialize eagerly (pool-sized
    checkpoints), so the FINAL plan must be corpus-free: no parquet
    scan, no shuffle, no sort-merge join — a regression here means a
    step re-acquired corpus lineage and would rescan at every
    reference on a real cluster."""
    plan = _plan(QUERIES["mmr_diversified_topk"](spark, sf_smoke))
    assert "Scan parquet" not in plan, plan
    assert _shuffle_exchanges(plan) == 0, plan
    assert "SortMergeJoin" not in plan, plan


def test_semantic_dedup_pair_join_on_cluster_key(spark, sf_smoke):
    """SemDeDup's pair generation must be an equi-join on cid (the
    cluster-bounded expansion), never a broadcast nested loop over the
    corpus."""
    plan = _plan(QUERIES["semantic_dedup"](spark, sf_smoke))
    assert "CartesianProduct" not in plan, plan


def test_round4_ops_plan_shapes(spark, sf_smoke):
    """Round-4 operational/governance layer: no cartesian products
    anywhere (the only BNLJs allowed are scalar-bound broadcasts), and
    the single-shuffle operators stay single-shuffle."""
    for name in ("record_linkage_blocked", "compaction_bin_packing",
                 "anomaly_event_rate", "anomaly_prequential",
                 "inverted_index_postings", "split_leakage_check",
                 "dataset_card_stats", "negative_sample_pairs",
                 "tokenizer_fertility_by_lang", "drift_psi_event_values",
                 "ab_assignment_outcomes", "referential_integrity_audit"):
        plan = _plan(QUERIES[name](spark, sf_smoke))
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"
        assert "BatchEvalPython" not in plan, f"{name}:\n{plan}"
    # anti joins in the RI audit must not shuffle the dimension side
    plan = _plan(QUERIES["referential_integrity_audit"](spark, sf_smoke))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # fertility is a pure one-shuffle grouped aggregation
    plan = _plan(QUERIES["tokenizer_fertility_by_lang"](spark, sf_smoke))
    assert _shuffle_exchanges(plan) <= 1, plan
    # compaction: stats agg + one window pass, never a data shuffle per row
    plan = _plan(QUERIES["compaction_bin_packing"](spark, sf_smoke))
    assert _shuffle_exchanges(plan) <= 2, plan
    assert "WindowGroupLimit" in plan or "Window" in plan
