"""Exact-rank statistical family at scale (VERDICT r08 #4): drive the
REGISTERED mann_whitney_arms / trimmed_mean_ate /
quantile_treatment_effects code paths (via their ``units=`` injection
seam) with a synthetic 20M-row arm, and check every emitted number
against a sequential numpy ground truth computed from the same
deterministic formula.

The synthetic unit relation is 3 orders of magnitude past the driver
SFs' ipw_units (sf0.1 has ~15k customers), so a hidden
single-partition sort in any of the three rank paths would show up as
a one-task straggler stage (and a wrecked wall time); correctness of
the two-phase rank is asserted exactly, not statistically.

y = (id * 2654435761) % 1_000_003   (int64-safe, ~1M distinct values
                                     -> ~20 ties per value, so the
                                     Mann-Whitney tie adjustment and
                                     the rank tie-breaks are both
                                     genuinely exercised)
arm = ((id * 2654435761) // 1_000_003) % 2

Run: python tools/stress_stats.py [n_rows]   (default 20_000_000)
Prints one JSON line with per-stage wall seconds and rows/s.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_MULT = 2654435761  # Knuth multiplicative-hash constant (public)
_MOD = 1_000_003


def main(n_rows: int = 20_000_000) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.queries_round11 import (
        quantile_treatment_effects,
    )
    from travel_data_pipeline_spark.queries_round12 import (
        _TRIM_DENOM,
        mann_whitney_arms,
        trimmed_mean_ate,
    )
    from travel_data_pipeline_spark.queries_round16 import (
        kruskal_wallis_arms,
    )
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-stats")
    spark.sparkContext.setLogLevel("ERROR")

    # `div` is Spark's INTEGRAL division — `/` is double division and
    # silently loses precision once id * _MULT exceeds 2^53, which
    # would diverge from numpy's integer // above ~3.4M rows.
    units = (spark.range(n_rows)
             .select(F.col("id").alias("c_custkey"),
                     (F.expr(f"(id * {_MULT}) div {_MOD}") % 2)
                     .alias("arm"),
                     ((F.col("id") * _MULT) % _MOD).alias("y")))

    # --- sequential ground truth (numpy, int64-exact) --------------------
    ids = np.arange(n_rows, dtype=np.int64)
    y = (ids * _MULT) % _MOD
    arm = ((ids * _MULT) // _MOD) % 2
    y_t, y_c = y[arm == 1], y[arm == 0]
    n_t, n_c = len(y_t), len(y_c)

    # Mann-Whitney with tie adjustment (textbook formula, python ints)
    uniq, counts = np.unique(y, return_counts=True)
    t_counts = np.zeros_like(uniq)
    # counts of treated per unique value: bincount over searchsorted idx
    idx = np.searchsorted(uniq, y_t)
    np.add.at(t_counts, idx, 1)
    cum_before = np.concatenate(([0], np.cumsum(counts)[:-1]))
    r2 = int(np.sum(t_counts.astype(object)
                    * (2 * cum_before + counts + 1)))
    ties = int(np.sum(counts.astype(object) ** 3 - counts))
    n = n_rows
    u2 = r2 - n_t * (n_t + 1)
    var_u = (n_t * n_c / 12.0
             * ((n + 1.0) - ties / (n * (n - 1.0))))
    z_ref = (u2 / 2.0 - n_t * n_c / 2.0) / math.sqrt(var_u)

    # trimmed means (exact integer sums)
    tm_ref = {}
    for a, ya in ((1, y_t), (0, y_c)):
        s = np.sort(ya)
        cut = len(s) // _TRIM_DENOM
        kept = s[cut:len(s) - cut]
        tm_ref[a] = (len(s), len(kept), int(kept.sum()))

    # exact quartile order statistics: rk = (q*n + 3) // 4
    qte_ref = {}
    for a, ya in ((1, y_t), (0, y_c)):
        s = np.sort(ya)
        qte_ref[a] = {q: int(s[(q * len(s) + 3) // 4 - 1])
                      for q in (1, 2, 3)}

    out = {"n_rows": n_rows}

    # --- Mann-Whitney through the registered path ------------------------
    t0 = time.perf_counter()
    row = mann_whitney_arms(spark, "", units=units).first()
    wall = time.perf_counter() - t0
    assert (row["n_treat"], row["n_ctrl"]) == (n_t, n_c), row
    assert row["u_stat"] == round(u2 / 2.0, 6), (row["u_stat"], u2 / 2.0)
    assert abs(row["z"] - z_ref) < 1e-6, (row["z"], z_ref)
    out["mann_whitney"] = {"sec": round(wall, 2),
                           "rows_per_sec": int(n_rows / wall),
                           "z": row["z"]}

    # --- trimmed-mean ATE through the registered path --------------------
    t0 = time.perf_counter()
    row = trimmed_mean_ate(spark, "", units=units).first()
    wall = time.perf_counter() - t0
    assert (row["n_treat"], row["kept_treat"]) == tm_ref[1][:2], row
    assert (row["n_ctrl"], row["kept_ctrl"]) == tm_ref[0][:2], row
    m1 = tm_ref[1][2] / tm_ref[1][1]
    m0 = tm_ref[0][2] / tm_ref[0][1]
    assert abs(row["mean_treat"] - m1) < 1e-6, (row["mean_treat"], m1)
    assert abs(row["mean_ctrl"] - m0) < 1e-6, (row["mean_ctrl"], m0)
    assert abs(row["trimmed_ate"] - (m1 - m0)) < 1e-6, row
    out["trimmed_mean"] = {"sec": round(wall, 2),
                           "rows_per_sec": int(n_rows / wall),
                           "ate": row["trimmed_ate"]}

    # --- QTE through the registered path ----------------------------------
    t0 = time.perf_counter()
    rows = {r["quartile"]: r
            for r in quantile_treatment_effects(spark, "",
                                                units=units).collect()}
    wall = time.perf_counter() - t0
    assert set(rows) == {1, 2, 3}, rows
    for q in (1, 2, 3):
        assert rows[q]["y_treat"] == float(qte_ref[1][q]), (q, rows[q])
        assert rows[q]["y_ctrl"] == float(qte_ref[0][q]), (q, rows[q])
    out["qte"] = {"sec": round(wall, 2),
                  "rows_per_sec": int(n_rows / wall),
                  "qte_median": rows[2]["qte"]}

    # --- Kruskal-Wallis (round 11) through the registered path ------------
    # same generator, 4 arms; ground truth from the value-group
    # half-unit rank formula (python ints, exact)
    units4 = (spark.range(n_rows)
              .select((F.expr(f"(id * {_MULT}) div {_MOD}") % 4)
                      .cast("int").alias("arm"),
                      ((F.col("id") * _MULT) % _MOD).alias("y")))
    arm4 = ((ids * _MULT) // _MOD) % 4
    a_counts = np.zeros((4, len(uniq)), dtype=np.int64)
    for a in range(4):
        idx_a = np.searchsorted(uniq, y[arm4 == a])
        np.add.at(a_counts[a], idx_a, 1)
    rank2 = 2 * cum_before + counts + 1
    n_arm = [int(a_counts[a].sum()) for a in range(4)]
    r2_arm = [int(np.sum(a_counts[a].astype(object) * rank2))
              for a in range(4)]
    h_ref = (12.0 / (n * (n + 1.0))
             * sum((r2_arm[a] / 2.0) ** 2 / n_arm[a] for a in range(4))
             - 3.0 * (n + 1.0))
    hc_ref = h_ref / (1.0 - ties / (float(n) ** 3 - n))

    t0 = time.perf_counter()
    row = kruskal_wallis_arms(spark, "", units=units4).first()
    wall = time.perf_counter() - t0
    assert row["n"] == n, row
    assert [row[f"n_arm{a}"] for a in range(4)] == n_arm, row
    assert abs(row["h_stat"] - h_ref) < 1e-4 * max(1.0, abs(h_ref)), (
        row["h_stat"], h_ref)
    assert abs(row["h_tie_corrected"] - hc_ref) < 1e-4 * max(
        1.0, abs(hc_ref)), (row["h_tie_corrected"], hc_ref)
    out["kruskal_wallis"] = {"sec": round(wall, 2),
                             "rows_per_sec": int(n_rows / wall),
                             "h": row["h_stat"]}

    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000)
