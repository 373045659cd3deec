"""Caliper-matching at scale: drive the REGISTERED psm_att_matching
code path (via its ``units=`` injection seam) with a synthetic
10M-unit relation and check the ATT / match counts against a
sequential numpy ground truth computed from the same deterministic
formula (the stress_stats pattern).

Unit generator (int64-safe, exact 2-dp decimals):
    bal_c = (id * 2654435761) % 1_000_000          (cents, 0..$10k)
    arm   = ((id * 2654435761) // 1_000_000) % 2
    y_c   = (id * 1103515245) % 50_000_000         (cents, 0..$500k)

~10M units over a $10k balance range means ~1k units per cent value —
the caliper join is genuinely dense, so a hidden all-pairs expansion
would be quadratic-visible, and the bucket-bounded candidate relation
is what keeps the wall time linear.

Run: python tools/stress_matching.py [n_rows]   (default 10_000_000)
Prints one JSON line with wall seconds and rows/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_MULT = 2654435761
_YMULT = 1103515245
_BALMOD = 1_000_000
_YMOD = 50_000_000


def main(n_rows: int = 10_000_000) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.queries_round16 import (
        _PSM_CALIPER,
        psm_att_matching,
    )
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-matching")
    spark.sparkContext.setLogLevel("ERROR")

    units = (spark.range(n_rows)
             .select(F.col("id").alias("c_custkey"),
                     (F.expr(f"(id * {_MULT}) div {_BALMOD}") % 2)
                     .alias("arm"),
                     (((F.col("id") * _MULT) % _BALMOD)
                      .cast("decimal(18,2)") / 100)
                     .cast("decimal(18,2)").alias("bal"),
                     (((F.col("id") * _YMULT) % _YMOD)
                      .cast("decimal(18,2)") / 100)
                     .cast("decimal(18,2)").alias("y")))

    # --- sequential ground truth (numpy, integer cents) -------------------
    ids = np.arange(n_rows, dtype=np.int64)
    bal = (ids * _MULT) % _BALMOD
    arm = ((ids * _MULT) // _BALMOD) % 2
    y = (ids * _YMULT) % _YMOD
    t_bal, t_y = bal[arm == 1], y[arm == 1]
    c_bal, c_y, c_id = bal[arm == 0], y[arm == 0], ids[arm == 0]
    # nearest control per treated: sort controls by (bal, id); for the
    # tie-break "min (dist, ck)" any equal-distance candidates need the
    # smallest control id — group controls by bal value first
    order = np.lexsort((c_id, c_bal))
    cb, cy, ci = c_bal[order], c_y[order], c_id[order]
    # first occurrence of each distinct control balance keeps the
    # smallest id (lexsort) — dedupe to distinct balances
    uniq_mask = np.concatenate(([True], cb[1:] != cb[:-1]))
    ub, uy, ui = cb[uniq_mask], cy[uniq_mask], ci[uniq_mask]
    pos = np.searchsorted(ub, t_bal)
    cal_c = _PSM_CALIPER * 100  # caliper in cents
    best_dist = np.full(len(t_bal), np.iinfo(np.int64).max)
    best_y = np.zeros(len(t_bal), dtype=np.int64)
    best_id = np.full(len(t_bal), np.iinfo(np.int64).max)
    for shift in (-1, 0):
        idx = np.clip(pos + shift, 0, len(ub) - 1)
        d = np.abs(ub[idx] - t_bal)
        better = (d < best_dist) | ((d == best_dist) & (ui[idx] < best_id))
        take = better & (d <= cal_c)
        best_dist = np.where(take, d, best_dist)
        best_y = np.where(take, uy[idx], best_y)
        best_id = np.where(take, ui[idx], best_id)
    matched = best_dist <= cal_c
    n_matched = int(matched.sum())
    att_ref = float((t_y[matched].astype(np.float64)
                     - best_y[matched]).sum()) / n_matched / 100.0
    dist_ref = float(best_dist[matched].sum()) / n_matched / 100.0

    t0 = time.perf_counter()
    row = psm_att_matching(spark, "", units=units).first()
    wall = time.perf_counter() - t0
    assert row["n_treated"] == int((arm == 1).sum()), row
    assert row["n_matched"] == n_matched, (row["n_matched"], n_matched)
    assert abs(row["att"] - att_ref) < 1e-4, (row["att"], att_ref)
    assert abs(row["mean_match_dist"] - dist_ref) < 1e-4, (
        row["mean_match_dist"], dist_ref)
    print(json.dumps({"n_rows": n_rows, "sec": round(wall, 2),
                      "rows_per_sec": int(n_rows / wall),
                      "n_matched": n_matched,
                      "att": row["att"]}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
