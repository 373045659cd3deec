"""Semantic pins for the operational-platform layer (queries_ops +
inverted_index_postings) — the oracle differential in test_oracle.py
proves engine parity; these prove the SEMANTICS are the intended ones
(planted linkage truth, bin-packing invariants, z-score gating,
posting-list caps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_pipeline_spark import queries_ops
from travel_data_pipeline_spark.queries_ops import (
    _BIN_TARGET,
    _DIRTY_OFFSET,
    anomaly_event_rate,
    compaction_bin_packing,
    record_linkage_blocked,
)
from travel_data_pipeline_spark.queries_search import (
    _POST_K,
    inverted_index_postings,
)


def test_record_linkage_planted_truth(spark, sf_dir):
    rows = {r["dirty_id"] - _DIRTY_OFFSET: r
            for r in record_linkage_blocked(spark, sf_dir).collect()}
    assert set(rows) == set(range(50))
    for k, r in rows.items():
        if k < 25:   # one-char overwrite -> exact-distance-1 fuzzy match
            assert (r["matched_custkey"], r["lev_distance"],
                    r["decision"]) == (k, 1, "fuzzy")
        elif k < 40:  # two-char overwrite -> distance-2 fuzzy match
            assert (r["matched_custkey"], r["lev_distance"],
                    r["decision"]) == (k, 2, "fuzzy")
        else:         # 'ZZZ' prefix -> distance 3 > threshold -> no match
            assert (r["matched_custkey"], r["lev_distance"],
                    r["decision"]) == (-1, -1, "no_match")


def test_compaction_bins_partition_the_month(spark, sf_dir):
    """Pin the operator's TRUE invariant (ADVICE r04): bin_id =
    floor(exclusive-prefix-rows / target) per month in file_date order,
    bins partition the rows, and date ranges are disjoint and ordered.
    (The old contiguous-from-0 / every-bin-reaches-target assertions
    were fixture-scale assumptions that break once a single day exceeds
    ~2x the target.)"""
    from travel_data_pipeline_spark.sources.readers import load_table

    plan = compaction_bin_packing(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
        .alias("month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("file_date"),
    ).agg(F.count("*").alias("n")).collect()

    # recompute the exclusive-prefix bin assignment independently
    sizes: dict[str, list] = {}
    for r in files:
        sizes.setdefault(r["month"], []).append((r["file_date"], r["n"]))
    expect: dict[str, dict[int, list]] = {}
    for month, fs in sizes.items():
        fs.sort()
        prefix = 0
        for d, n in fs:
            expect.setdefault(month, {}).setdefault(
                prefix // _BIN_TARGET, []).append((d, n))
            prefix += n

    by_month: dict[str, dict[int, object]] = {}
    for r in plan:
        by_month.setdefault(r["month"], {})[r["bin_id"]] = r
    assert set(by_month) == set(expect)
    for month, bins in by_month.items():
        assert set(bins) == set(expect[month])
        # bins partition the month's rows
        assert (sum(b["bin_rows"] for b in bins.values())
                == sum(n for _, n in sizes[month]))
        # disjoint, ordered date ranges across ascending bin ids
        ordered = [bins[b] for b in sorted(bins)]
        for a, b in zip(ordered, ordered[1:]):
            assert a["last_date"] < b["first_date"]
        # every bin matches the independently recomputed assignment
        for bid, r in bins.items():
            exp = expect[month][bid]
            assert r["n_files"] == len(exp)
            assert r["bin_rows"] == sum(n for _, n in exp)
            assert r["first_date"] == min(d for d, _ in exp)
            assert r["last_date"] == max(d for d, _ in exp)


def test_anomaly_rows_are_true_outliers(spark, sf_dir):
    out = anomaly_event_rate(spark, sf_dir).collect()
    assert out, "expected at least one >=2-sigma day in the fixture"
    assert all(abs(r["zscore"]) >= queries_ops._Z_CUT - 1e-9 for r in out)
    # flagged days must carry their true daily count
    from travel_data_pipeline_spark.sources.readers import load_table
    events = load_table(spark, sf_dir, "events")
    daily = {(r["event_type"], r["day"]): r["cnt"]
             for r in events.groupBy(
                 "event_type",
                 F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                 .alias("day")).agg(F.count("*").alias("cnt")).collect()}
    for r in out:
        assert daily[(r["event_type"], r["day"])] == r["cnt"]


def test_z_guard_degenerate_constant_history(spark):
    """ADVICE r04: a zero-variance history must z-score to NULL in BOTH
    engines — without the CASE guard Spark (non-ANSI) divides to NULL
    while DuckDB yields IEEE +-inf/NaN (ordered above all values), so
    abs(z) >= cut would diverge on a constant daily-count series."""
    import duckdb
    import pandas as pd

    const = pd.DataFrame({"cnt": [5, 5, 5, 5], "n": [4] * 4,
                          "s": [20] * 4, "ss": [100] * 4})
    sp = (spark.createDataFrame(const)
          .select(F.expr(queries_ops._Z_SQL).alias("z")).collect())
    assert all(r["z"] is None for r in sp)
    con = duckdb.connect()
    con.register("t", const)
    du = con.execute(f"SELECT {queries_ops._Z_SQL} AS z FROM t").fetchall()
    assert all(v is None for (v,) in du)
    # single-day history (n=1) is equally degenerate in both engines
    one = pd.DataFrame({"cnt": [5], "n": [1], "s": [5], "ss": [25]})
    assert (spark.createDataFrame(one)
            .select(F.expr(queries_ops._Z_SQL).alias("z"))
            .collect()[0]["z"] is None)
    con.register("t1", one)
    assert con.execute(
        f"SELECT {queries_ops._Z_SQL} AS z FROM t1").fetchone()[0] is None
    # a non-degenerate history still scores (guard must not over-fire)
    var = pd.DataFrame({"cnt": [9], "n": [3], "s": [12], "ss": [66]})
    z_sp = (spark.createDataFrame(var)
            .select(F.expr(queries_ops._Z_SQL).alias("z"))
            .collect()[0]["z"])
    con.register("t2", var)
    z_du = con.execute(
        f"SELECT {queries_ops._Z_SQL} AS z FROM t2").fetchone()[0]
    assert z_sp == z_du and z_sp is not None


def test_inverted_index_caps_and_sorts_postings(spark, sf_dir):
    rows = inverted_index_postings(spark, sf_dir).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r["dfreq"], _POST_K)
        assert len(set(ids)) == len(ids)


# --- governance layer (queries_curation round-4 additions) -----------------


def test_split_leakage_finds_planted_cross_split_dups(spark, sf_dir):
    from travel_data_pipeline_spark.queries_curation import (
        split_leakage_check,
    )

    rows = split_leakage_check(spark, sf_dir).collect()
    assert rows, "planted duplicates must surface at least one leak"
    for r in rows:
        assert r["n_splits"] > 1
        assert len(r["splits"].split(",")) == r["n_splits"]


def test_negative_sampling_contract(spark, sf_dir):
    from travel_data_pipeline_spark.queries_curation import (
        _NEG_K,
        negative_sample_pairs,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    out = negative_sample_pairs(spark, sf_dir).collect()
    src = {r["doc_id"]: r["source"]
           for r in load_table(spark, sf_dir, "documents")
           .select("doc_id", "source").collect()}
    per_anchor: dict[int, list] = {}
    for r in out:
        per_anchor.setdefault(r["anchor_id"], []).append(r)
        # a negative never shares the anchor's source
        assert src[r["neg_id"]] != src[r["anchor_id"]]
    for pairs in per_anchor.values():
        assert sorted(p["neg_rank"] for p in pairs) == list(
            range(1, _NEG_K + 1))
        assert len({p["neg_id"] for p in pairs}) == _NEG_K


def test_psi_drift_semantics(spark, sf_dir):
    """PSI is non-negative, covers every event type, and its n_ref/n_cur
    split accounts for every event row."""
    from travel_data_pipeline_spark.queries_ops import drift_psi_event_values
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = drift_psi_event_values(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    totals = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {r["event_type"] for r in rows} == set(totals)
    for r in rows:
        assert r["psi"] >= 0.0
        assert r["n_ref"] + r["n_cur"] == totals[r["event_type"]]


def test_ab_assignment_deterministic_and_consistent(spark, sf_dir):
    """Arms partition the user set; the z-stat is identical on both
    rows; rerunning yields the same assignment."""
    from travel_data_pipeline_spark.queries_ops import ab_assignment_outcomes
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = {r["arm"]: r for r in
            ab_assignment_outcomes(spark, sf_dir).collect()}
    assert set(rows) == {"control", "treatment"}
    n_users = load_table(spark, sf_dir, "events") \
        .select("user_id").distinct().count()
    assert rows["control"]["n_users"] + rows["treatment"]["n_users"] == n_users
    assert rows["control"]["z_two_prop"] == rows["treatment"]["z_two_prop"]
    again = {r["arm"]: r for r in
             ab_assignment_outcomes(spark, sf_dir).collect()}
    assert again == rows


def test_referential_integrity_clean_star_schema(spark, sf_dir):
    """The synthetic star schema is referentially clean: every edge
    reports zero orphans and the true child row count."""
    from travel_data_pipeline_spark.queries_ops import (
        _FK_EDGES,
        referential_integrity_audit,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = {r["edge"]: r for r in
            referential_integrity_audit(spark, sf_dir).collect()}
    assert set(rows) == {f"{c}.{fk}" for c, fk, _, _ in _FK_EDGES}
    for child, fk, _, _ in _FK_EDGES:
        r = rows[f"{child}.{fk}"]
        assert r["n_orphans"] == 0
        assert r["n_rows"] == load_table(spark, sf_dir, child).count()


def test_multimodal_resize_aspect_fit(spark, sf_dir):
    """Resize preserves aspect within the 256x256 box and never
    upscales past the box or below 1px."""
    from travel_data_pipeline_spark.queries_northstar import (
        multimodal_resize_meta,
    )

    for r in multimodal_resize_meta(spark, sf_dir).collect():
        assert 1 <= r["dst_w"] <= 256 and 1 <= r["dst_h"] <= 256
        # the binding dimension hits the box (floor of s*(256/s) can
        # land on 255 when the division is inexact)
        assert r["dst_w"] >= 255 or r["dst_h"] >= 255 or (
            r["src_w"] <= 256 and r["src_h"] <= 256)


def test_multimodal_feature_extract_shape(spark, sf_dir):
    from travel_data_pipeline_spark.queries_northstar import (
        multimodal_feature_extract,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = multimodal_feature_extract(spark, sf_dir).collect()
    assert len(rows) == n_docs * 8
    assert all(0.0 <= r["value"] < 1.0 for r in rows)
    assert {r["dim_idx"] for r in rows} == set(range(8))


def test_corr_and_slope_guards_degenerate_in_both_engines(spark):
    """ADVICE-r04 discipline extended (r5): the corr-matrix, OLS-slope
    and CUSUM-z spellings must branch identically in both engines on
    zero-variance input — NULL for corr/slope, 0.0 for the CUSUM z
    (keeps the recurrence total)."""
    import duckdb
    import pandas as pd

    from travel_data_pipeline_spark import queries_stats
    from travel_data_pipeline_spark.queries_stats import _corr_expr
    from travel_data_pipeline_spark.queries_timeseries import _CUSUM_Z

    con = duckdb.connect()

    # constant x -> zero x-variance: corr NULL in both engines
    moments = pd.DataFrame({"n": [4.0], "sa": [8.0], "sb": [10.0],
                            "saa": [16.0], "sbb": [30.0], "sab": [20.0]})
    sp = (spark.createDataFrame(moments)
          .select(_corr_expr(F.col("n"), F.col("sa"), F.col("sb"),
                             F.col("saa"), F.col("sbb"), F.col("sab"))
                  .alias("r")).collect()[0]["r"])
    assert sp is None
    con.register("m", moments.rename(columns={
        "sa": "sq", "sb": "sp", "saa": "sqq", "sbb": "spp",
        "sab": "sqp"}))
    du = con.execute(
        "SELECT " + queries_stats._CORR_SQL_PAIR.format(a="q", b="p")
        + " FROM m").fetchone()[0]
    assert du is None

    # constant daily series -> CUSUM z must be 0.0 in both engines
    cz = pd.DataFrame({"cnt": [7], "n": [5], "s": [35], "ss": [245]})
    sp_z = (spark.createDataFrame(cz)
            .select(F.expr(_CUSUM_Z).alias("z")).collect()[0]["z"])
    assert sp_z == 0.0
    con.register("cz", cz)
    assert con.execute(f"SELECT {_CUSUM_Z} AS z FROM cz").fetchone()[0] \
        == 0.0
    # and a varying series still scores through the same spelling
    cz2 = pd.DataFrame({"cnt": [9], "n": [3], "s": [12], "ss": [66]})
    sp_z2 = (spark.createDataFrame(cz2)
             .select(F.expr(_CUSUM_Z).alias("z")).collect()[0]["z"])
    con.register("cz2", cz2)
    du_z2 = con.execute(f"SELECT {_CUSUM_Z} AS z FROM cz2").fetchone()[0]
    assert sp_z2 == du_z2 and sp_z2 != 0.0
