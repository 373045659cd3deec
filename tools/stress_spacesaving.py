"""Mergeable-summary scale stress: drive the REGISTERED SpaceSaving
code path (queries_round17.spacesaving_from_keys — the same function
spacesaving_topk calls) at a synthetic ~200M-row zipf-ish key stream
and certify:

- per-shard summary state stays CONSTANT (_SS_CAP rows + 1 bound);
- the merged lower/upper bounds CONTAIN the exact count for every
  reported key (within_bounds all true — the algorithm's guarantee);
- wall scales with the input scan, not the key cardinality.

Synthesis is in-engine and deterministic: key = (h % 1000)^2 % 10000
concentrates mass on a head (quadratic hash spread), shard = row % 32.

Run: python tools/stress_spacesaving.py [n_rows]  (default 200_000_000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_KEYS = 10_000


def main(n_rows: int = 200_000_000) -> None:
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.queries_round17 import (
        _SS_SHARDS,
        spacesaving_from_keys,
    )
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-spacesaving")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    base = (spark.range(n_rows).repartition(par * 2)
            .select((F.col("id") % _SS_SHARDS).alias("shard"),
                    (F.pmod(F.xxhash64("id"), F.lit(1000))
                     * F.pmod(F.xxhash64("id"), F.lit(1000))
                     % N_KEYS).alias("key")))

    t0 = time.perf_counter()
    out = spacesaving_from_keys(spark, base)
    rows = out.collect()
    wall = time.perf_counter() - t0

    print(json.dumps({
        "n_rows": n_rows, "n_distinct_keys_max": N_KEYS,
        "shards": _SS_SHARDS,
        "out_rows": len(rows),
        "all_within_bounds": all(r.within_bounds for r in rows),
        "top1": {"key": rows[0].key, "lower": rows[0].lower_cnt,
                 "exact": rows[0].exact_cnt,
                 "upper": rows[0].upper_cnt},
        "wall_sec": round(wall, 2),
        "rows_per_sec": int(n_rows / wall),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000)
