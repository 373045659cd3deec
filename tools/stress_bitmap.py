"""Exact-distinct-at-scale stress: drive the REGISTERED bitmap
pipeline (queries_round19.bitmap_distinct_from_keys — the same
function bitmap_exact_distinct calls) at a synthetic 200M-row /
~50M-distinct-id stream and certify:

- the bucketed bitmap sum AND the shard-then-OR-merge path both EQUAL
  exact countDistinct for every group (bitmaps are exact bitsets —
  any drift is a correctness bug, not an approximation);
- per-(group, bucket) agg state is bounded at 4 KiB (32768 bits), so
  ~50M ids spread over ~1527 buckets x 5 groups never holds more than
  ~30 MiB of bitmap state across the whole shuffle;
- the bitmap path's wall is competitive with the expert-distinct
  baseline (countDistinct alone) — the point of the bitmap shape is
  the REUSABLE persisted summary, but it must not cost multiples of
  the one-shot exact count to build.

Synthesis is in-engine and deterministic: pos = xxhash64(id) % ID_MAX
+ 1 (positions >= 1 — bitmap_bit_position is (v-1) mod 32768),
group = id % N_GROUPS.

Run: python tools/stress_bitmap.py [n_rows]  (default 200_000_000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ID_MAX = 50_000_000
N_GROUPS = 5


def main(n_rows: int = 200_000_000) -> None:
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.queries_round19 import (
        bitmap_distinct_from_keys,
    )
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-bitmap")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    base = (spark.range(n_rows).repartition(par * 2)
            .select((F.col("id") % N_GROUPS).alias("g"),
                    (F.pmod(F.xxhash64("id"), F.lit(ID_MAX)) + 1)
                    .alias("pos")))

    # baseline: the one-shot exact countDistinct (no reusable summary)
    t0 = time.perf_counter()
    exact_rows = (base.groupBy("g")
                  .agg(F.countDistinct("pos").alias("n"))
                  .collect())
    wall_exact = time.perf_counter() - t0
    exact = {r.g: r.n for r in exact_rows}

    # candidate: the registered three-path pipeline (runs exact AGAIN
    # inside — the certified equality is within one plan, apples to
    # apples on the same scan)
    t1 = time.perf_counter()
    rows = bitmap_distinct_from_keys(base, "g", "pos").collect()
    wall_bitmap = time.perf_counter() - t1

    all_equal = all(r.n_exact == r.n_bitmap == r.n_merged == exact[r.g]
                    for r in rows)
    n_buckets = (ID_MAX + 32767) // 32768

    print(json.dumps({
        "n_rows": n_rows, "id_max": ID_MAX, "n_groups": N_GROUPS,
        "bitmap_buckets_per_group": n_buckets,
        "state_bound_mib": round(
            n_buckets * N_GROUPS * 4096 / 1048576, 1),
        "all_equal": all_equal,
        "distincts": {str(r.g): r.n_exact for r in rows},
        "wall_exact_only_sec": round(wall_exact, 2),
        "wall_bitmap_pipeline_sec": round(wall_bitmap, 2),
        "rows_per_sec_bitmap": int(n_rows / wall_bitmap),
    }))
    if not all_equal:
        raise SystemExit("bitmap paths diverged from exact countDistinct")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000)
