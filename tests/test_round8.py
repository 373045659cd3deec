"""Round-8 candidate queries (authored round 7) — invariants the
oracle comparison can't see: recall monotonicity, grid completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark.queries_round8 import (
    _RECALL_KS,
    _RECALL_PROBES,
    ivf_recall_at_k,
)


def test_ivf_recall_monotone_in_n_probe(spark, sf_smoke):
    """More probed clusters only ADD candidates, and truth@k members
    stay in the top-k of any candidate subset containing them (the
    ranking is one total order), so ivf_exact recall is weakly
    monotone in n_probe for every k. The int8_rerank path's top-20
    keep is not set-monotone, so it is only pinned to the [0,1] range
    and the full grid."""
    rows = ivf_recall_at_k(spark, sf_smoke).collect()
    by_path: dict[str, dict[tuple[int, int], float]] = {}
    for r in rows:
        by_path.setdefault(r.path, {})[(r.k, r.n_probe)] = r.recall_at_k
    assert set(by_path) == {"ivf_exact", "int8_rerank"}
    grid = {(k, p) for k in _RECALL_KS for p in _RECALL_PROBES}
    for path, cells in by_path.items():
        assert set(cells) == grid, path
        assert all(0.0 <= v <= 1.0 for v in cells.values()), path
    ivf = by_path["ivf_exact"]
    for k in _RECALL_KS:
        seq = [ivf[(k, p)] for p in sorted(_RECALL_PROBES)]
        assert seq == sorted(seq), (k, seq)
    # the audit must certify something: probing 4 of ~10 clusters has
    # to beat probing 1 somewhere on this corpus, else the grid is
    # degenerate and the query measures nothing
    assert any(ivf[(k, max(_RECALL_PROBES))] > ivf[(k, min(_RECALL_PROBES))]
               for k in _RECALL_KS)


def test_bpe_apply_learned_totals_consistent(spark, sf_smoke):
    """Application counts must reconcile exactly with the token-total
    drops, counts are non-negative, and ranks are contiguous from 1
    (the train loop's argmax always exists on this corpus)."""
    from travel_data_pipeline_spark.queries_round8 import bpe_apply_learned

    rows = sorted(bpe_apply_learned(spark, sf_smoke).collect(),
                  key=lambda r: r.merge_rank)
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows, "training corpus produced no merges"
    for prev, cur in zip(rows, rows[1:]):
        assert (prev.heldout_tokens_after - cur.n_applied_heldout
                == cur.heldout_tokens_after)
    for r in rows:
        assert r.n_train_pairs > 0
        assert r.n_applied_heldout >= 0
        assert " " in r.pair and "▁" not in r.pair.split(" ")[0][:0]


def test_watermark_plan_matches_engine_drops(spark, tmp_path):
    """VERDICT r06 #5 — pin watermark_lateness_plan's predicted drop
    counts against REAL `withWatermark` Structured Streaming runs.

    The plan charges each event a lateness of running_max(ts) - ts in
    event_id (arrival) order; the engine drops a row when its event
    time is behind the checkpointed watermark (prev-batch max - W).
    The two agree exactly on a split where every late row's running
    max was set in a PRIOR batch (the monotone-split discipline of the
    stateful twins): batch 1 is monotone increasing, batch 2 leads
    with stragglers below batch 1's max.

      batch 1: ids 1..10, ts = 1100..2000 s   (max 2000)
      batch 2: id 11 @1930 (late 70 s), id 12 @1600 (late 400 s),
               id 13 @1000 (late 1000 s), then 14 @2100, 15 @2200

    Expected drops: W=60 -> {11,12,13}; W=300 -> {12,13} (and the
    plan additionally predicts 900 -> 1, 3600 -> 0)."""
    import datetime as dt

    from travel_data_pipeline_spark.queries_round7 import (
        _WM_THRESHOLDS,
        watermark_lateness_plan,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    sec = dt.timedelta(seconds=1)
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    b1 = [(i, base + (1000 + 100 * i) * sec, 1, "view", 1.0, "{}")
          for i in range(1, 11)]
    b2 = [(11, base + 1930 * sec, 1, "view", 1.0, "{}"),
          (12, base + 1600 * sec, 1, "view", 1.0, "{}"),
          (13, base + 1000 * sec, 1, "view", 1.0, "{}"),
          (14, base + 2100 * sec, 1, "view", 1.0, "{}"),
          (15, base + 2200 * sec, 1, "view", 1.0, "{}")]

    # --- the plan's prediction over the full (batch) log -----------------
    plan_sf = tmp_path / "plan_sf"
    plan_sf.mkdir()
    spark.createDataFrame(b1 + b2, schema).coalesce(1) \
         .write.parquet(str(plan_sf / "events.parquet"))
    plan = {r.thr_seconds: r.n_dropped
            for r in watermark_lateness_plan(spark, str(plan_sf)).collect()}
    assert plan == {60: 3, 300: 2, 900: 1, 3600: 0}, plan

    # --- real withWatermark runs at two candidate thresholds -------------
    for wm_s, expect_dropped in [(60, {11, 12, 13}), (300, {12, 13})]:
        src = tmp_path / f"wm{wm_s}_src"
        src.mkdir()
        out = str(tmp_path / f"wm{wm_s}_sink")
        ckpt = str(tmp_path / f"wm{wm_s}_ckpt")

        def run():
            stream = (spark.readStream.schema(schema)
                      .option("recursiveFileLookup", "true")
                      .parquet(str(src)))
            dedup = (stream.withWatermark("ts", f"{wm_s} seconds")
                     .dropDuplicates(["event_id", "ts"]))
            q = (dedup.writeStream.format("parquet").option("path", out)
                 .option("checkpointLocation", ckpt)
                 .outputMode("append").trigger(availableNow=True).start())
            q.awaitTermination(120)

        spark.createDataFrame(b1, schema).coalesce(1) \
             .write.parquet(str(src / "f1"))
        run()
        spark.createDataFrame(b2, schema).coalesce(1) \
             .write.parquet(str(src / "f2"))
        run()

        kept = {r.event_id for r in spark.read.parquet(out).collect()}
        dropped = set(range(1, 16)) - kept
        assert dropped == expect_dropped, (wm_s, dropped)
        assert len(dropped) == plan[wm_s], (wm_s, dropped, plan)
    assert set(plan) == set(_WM_THRESHOLDS)


def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_smoke):
    """The merged-histogram estimate can never miss the exact rank
    statistic by more than one bin width — the guarantee the sketch
    sells."""
    from travel_data_pipeline_spark.queries_round8 import (
        _QSK_WIDTH,
        quantile_sketch_merge,
    )

    rows = quantile_sketch_merge(spark, sf_smoke).collect()
    assert {r.q for r in rows} == {0.25, 0.5, 0.75, 0.9}
    for r in rows:
        assert 0.0 <= r.abs_err <= _QSK_WIDTH, r
        assert r.est_upper_edge >= r.exact_value, r


def test_incremental_recompute_only_changed_partitions(spark, sf_smoke):
    """Unchanged partitions must schedule ZERO recompute rows, changed
    ones exactly their current count; the drop rule guarantees at
    least one changed partition at any SF."""
    from travel_data_pipeline_spark.queries_round8 import (
        incremental_recompute_plan,
    )

    rows = incremental_recompute_plan(spark, sf_smoke).collect()
    assert rows
    assert any(r.status == "changed" for r in rows)
    for r in rows:
        if r.status == "unchanged":
            assert r.rows_to_recompute == 0
        elif r.status in ("changed", "new"):
            assert r.rows_to_recompute == r.n_rows > 0
        else:  # deleted
            assert r.n_rows == 0


def test_group_split_has_no_user_leakage(spark, sf_smoke):
    """Every user must land in exactly one split — recompute the
    assignment independently and cross-check the audit's user sums."""
    from travel_data_pipeline_spark.queries_round8 import (
        stratified_group_split,
    )
    from travel_data_pipeline_spark.sources.readers import load_table
    from travel_data_pipeline_spark.functions.hashing import md5_long

    rows = stratified_group_split(spark, sf_smoke).collect()
    assert {r.split for r in rows} == {"train", "val", "test"}
    ev = load_table(spark, sf_smoke, "events")
    h10 = md5_long(
        F.concat(F.lit("sp:"), F.col("user_id").cast("string"))) % 10
    per_user = (ev.select("user_id", h10.alias("h")).distinct())
    # one hash value per user -> one split per user by construction
    assert per_user.groupBy("user_id").count() \
        .filter(F.col("count") > 1).count() == 0
    n_events = sum(r.n_events for r in rows)
    assert n_events == ev.count()


def test_hll_merged_union_dominates_each_type(spark, sf_smoke):
    """Register-wise max merging: the ALL estimate must be >= every
    per-type estimate, and every estimate lands within 40% of exact
    (m=64 gives ~13% typical error; 40% is the sanity rail)."""
    from travel_data_pipeline_spark.queries_round8 import (
        hyperloglog_union_audit,
    )

    rows = {r.event_type: r for r in
            hyperloglog_union_audit(spark, sf_smoke).collect()}
    assert "ALL" in rows and len(rows) >= 3
    for t, r in rows.items():
        assert abs(r.rel_err) <= 0.4, (t, r)
        if t != "ALL":
            assert rows["ALL"].hll_estimate >= r.hll_estimate - 1e-9
            assert rows["ALL"].exact_n >= r.exact_n


def test_calibration_bins_reconcile(spark, sf_smoke):
    """Bin populations sum to the corpus, ECE terms are non-negative
    and each bounded by its bin's share."""
    from travel_data_pipeline_spark.queries_round8 import (
        cdf_calibration_bins,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = cdf_calibration_bins(spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.mean_p <= 1.0 and 0.0 <= r.pos_rate <= 1.0
        assert 0.0 <= r.ece_term <= r.n / n_docs + 1e-9


def test_survivorship_rules(spark, sf_smoke):
    """Each planted cluster: canonical is the ORIGINAL doc, lang tie
    breaks to 'aa', n_chars comes from the planted copy (+7)."""
    from travel_data_pipeline_spark.queries_round8 import (
        dedup_survivorship_merge,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = dedup_survivorship_merge(spark, sf_smoke).collect()
    assert len(rows) == 5
    meta = {r.doc_id: r for r in
            load_table(spark, sf_smoke, "documents")
            .filter(F.col("doc_id") < 5).collect()}
    for r in rows:
        assert r.canonical_doc in meta and r.n_members == 2
        m = meta[r.canonical_doc]
        assert r.canonical_source == m.source
        assert r.merged_lang == min("aa", m.lang)
        assert r.merged_n_chars == m.n_chars + 7


def test_salting_plan_accounts_every_row(spark, sf_smoke):
    """Hot keys + the cold-tail row must partition the event count,
    and every salt factor is consistent with its key's row count."""
    from travel_data_pipeline_spark.queries_round8 import (
        _SALT_SLOTS,
        skew_key_salting_plan,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = skew_key_salting_plan(spark, sf_smoke).collect()
    total = load_table(spark, sf_smoke, "events").count()
    assert sum(r.n_rows for r in rows) == total
    import math

    target = math.ceil(total / _SALT_SLOTS)
    for r in rows:
        if r.key != "(unskewed)":
            assert r.salt_factor == math.ceil(r.n_rows / target) > 1


def test_count_min_never_underestimates(spark, sf_smoke):
    """Collisions only add: every sketch estimate >= its exact count,
    and the audited set is exactly the rank-1..20 heavy hitters (or
    all keys when fewer)."""
    from travel_data_pipeline_spark.queries_round8 import (
        _CM_TOP,
        count_min_heavy_hitters,
    )

    rows = count_min_heavy_hitters(spark, sf_smoke).collect()
    assert 0 < len(rows) <= _CM_TOP
    assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.cm_estimate == r.exact_n + r.overestimate


def test_join_size_exact_vs_fk_invariants(spark, sf_smoke):
    """q_error >= 1 by construction; the lineitem->orders edge is a
    total FK, so its exact join size equals the lineitem row count."""
    from travel_data_pipeline_spark.queries_round8 import (
        join_size_estimation_audit,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = {r.edge: r for r in
            join_size_estimation_audit(spark, sf_smoke).collect()}
    assert set(rows) == {"orders_customer", "lineitem_orders",
                         "lineitem_part"}
    for r in rows.values():
        assert r.q_error >= 1.0 - 1e-9, r
    li = load_table(spark, sf_smoke, "lineitem").count()
    assert rows["lineitem_orders"].exact_rows == li
    assert rows["lineitem_part"].exact_rows == li


def test_funnel_partitions_corpus(spark, sf_smoke):
    """First-failing-gate stages partition the corpus; shares sum
    to ~1."""
    from travel_data_pipeline_spark.queries_round8 import (
        quality_filter_funnel,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = quality_filter_funnel(spark, sf_smoke).collect()
    total = load_table(spark, sf_smoke, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    valid = {"1_too_short", "2_low_alpha", "3_low_stopword",
             "4_repetition", "5_pass"}
    assert {r.stage for r in rows} <= valid


def test_kappa_bounds_and_confusion_consistency(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round8 import (
        classifier_agreement_kappa,
    )

    [r] = classifier_agreement_kappa(spark, sf_smoke).collect()
    assert 0 <= r.both_pos <= min(r.pos_a, r.pos_b)
    assert max(r.pos_a, r.pos_b) <= r.n_docs
    assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
    if r.kappa is not None:
        assert -1.0 - 1e-9 <= r.kappa <= 1.0 + 1e-9


def test_hll_curve_monotone(spark, sf_smoke):
    """Prefix-merged registers only grow, so the estimate curve is
    non-decreasing day over day — as is the exact curve; the final
    exact point equals the corpus distinct-user count."""
    from travel_data_pipeline_spark.queries_round8 import (
        hll_running_distinct_curve,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = sorted(hll_running_distinct_curve(spark, sf_smoke).collect(),
                  key=lambda r: r.day_idx)
    assert len(rows) >= 2
    for a, b in zip(rows, rows[1:]):
        assert b.hll_estimate >= a.hll_estimate - 1e-9
        assert b.exact_cum_users >= a.exact_cum_users
    n_users = (load_table(spark, sf_smoke, "events")
               .select("user_id").distinct().count())
    assert rows[-1].exact_cum_users == n_users


def test_mixture_temperature_flattens(spark, sf_smoke):
    """Each alpha's shares sum to 1; lower alpha flattens the mixture
    (max share weakly decreases as alpha drops); epochs >= p * total
    consistency on every row."""
    from travel_data_pipeline_spark.queries_round8 import (
        mixture_temperature_plan,
    )

    rows = mixture_temperature_plan(spark, sf_smoke).collect()
    by_alpha: dict[str, list] = {}
    for r in rows:
        by_alpha.setdefault(r.alpha, []).append(r)
    assert set(by_alpha) == {"1.0", "0.5", "0.25"}
    for a, rs in by_alpha.items():
        assert abs(sum(r.p for r in rs) - 1.0) < 1e-4, a
    maxes = {a: max(r.p for r in rs) for a, rs in by_alpha.items()}
    assert maxes["1.0"] >= maxes["0.5"] - 1e-9 >= maxes["0.25"] - 2e-9


def test_scaling_ladder_nested(spark, sf_smoke):
    """Rung subsets nest, so docs/tokens/vocab are non-decreasing and
    the top rung covers the full corpus token count."""
    from travel_data_pipeline_spark.queries_round8 import (
        _LAD_RUNGS,
        data_scaling_ladder,
    )
    from travel_data_pipeline_spark.operators.text import token_array
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = sorted(data_scaling_ladder(spark, sf_smoke).collect(),
                  key=lambda r: r.rung)
    assert [r.rung for r in rows] == list(range(_LAD_RUNGS))
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs >= a.n_docs
        assert b.n_tokens >= a.n_tokens
        assert b.vocab >= a.vocab
    docs = load_table(spark, sf_smoke, "documents")
    full_tokens = docs.select(
        F.explode(token_array(F.col("text")))).count()
    assert rows[-1].n_tokens == full_tokens
    assert rows[-1].n_docs == docs.count()


def test_recency_decay_bounds(spark, sf_smoke):
    """0 < weighted_n <= n_rows (weights in (0,1]); effective sample
    size is in (0, n_rows]."""
    from travel_data_pipeline_spark.queries_round8 import (
        recency_decay_weights,
    )

    rows = recency_decay_weights(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.weighted_n <= r.n_rows + 1e-9, r
        assert 0.0 < r.effective_n <= r.n_rows + 1e-6, r


def test_ks_stat_bounds_and_pure_python_check(spark, sf_smoke):
    """KS in [0, 1]; recompute one source's statistic brute-force in
    python from the raw lengths."""
    from travel_data_pipeline_spark.queries_round8 import ks_source_drift
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = ks_source_drift(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.ks_stat <= 1.0, r
    docs = load_table(spark, sf_smoke, "documents") \
        .select("source", "n_chars").collect()
    src = rows[0].source
    a = sorted(d.n_chars for d in docs if d.source == src)
    b = sorted(d.n_chars for d in docs if d.source != src)
    values = sorted({d.n_chars for d in docs})
    import bisect
    ks = max(abs(bisect.bisect_right(a, v) / len(a)
                 - bisect.bisect_right(b, v) / len(b)) for v in values)
    assert abs(ks - [r.ks_stat for r in rows if r.source == src][0]) < 1e-5


def test_hll_register_stream(spark, sf_smoke, tmp_path):
    """The streamed register state's estimate is bit-equal to the
    batch fold over the union of batches, and replaying a batch
    (fresh checkpoint — the case the epoch-watermark streams must
    gate) is a strict no-op because register max is idempotent."""
    from travel_data_pipeline_spark.queries_round8 import (
        _HLL_M,
        _hll_fold_spark,
        user_hll_registers,
    )
    from travel_data_pipeline_spark.sources.readers import load_table
    from travel_data_pipeline_spark.streaming.jobs import (
        hll_register_stream,
        hll_stream_estimate,
    )

    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id")
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")

    def run(ck: str) -> None:
        stream = (spark.readStream
                  .schema("event_id long, user_id long")
                  .option("recursiveFileLookup", "true")
                  .parquet(str(src)))
        q = hll_register_stream(stream, state, str(tmp_path / ck))
        q.awaitTermination(120)

    ev.filter(F.col("event_id") <= mid).write.parquet(str(src / "f1"))
    run("ck1")
    ev.filter(F.col("event_id") > mid).write.parquet(str(src / "f2"))
    run("ck1")
    [est_stream] = hll_stream_estimate(spark, state).collect()

    # batch twin over the union
    grid = (spark.range(_HLL_M)
            .select(F.col("id").cast("int").alias("bucket"))
            .join(user_hll_registers(ev), "bucket", "left")
            .na.fill({"m": 0})
            .select(F.lit(0).alias("k"), "bucket", "m"))
    [est_batch] = _hll_fold_spark(grid, "k").select("raw_est").collect()
    assert est_stream.raw_est == est_batch.raw_est  # bit-equal

    # replay batch 2 under a FRESH checkpoint: max is idempotent,
    # state and estimate must not move
    import shutil
    replay_src = tmp_path / "replay"
    replay_src.mkdir()
    shutil.copytree(src / "f2", replay_src / "f2")

    stream = (spark.readStream.schema("event_id long, user_id long")
              .option("recursiveFileLookup", "true")
              .parquet(str(replay_src)))
    q = hll_register_stream(stream, state, str(tmp_path / "ck_fresh"))
    q.awaitTermination(120)
    [est_replay] = hll_stream_estimate(spark, state).collect()
    assert est_replay.raw_est == est_batch.raw_est
