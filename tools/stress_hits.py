"""Iterative-family scale stress (VERDICT r10 #5): drive the
REGISTERED HITS code path (queries_round15.hits_from_edges — the same
function hits_supplier_part calls) at a synthetic ~10M-edge bipartite
graph and certify the lag-1 localCheckpoint pattern: per-iteration
wall time must stay FLAT across iterations (no lineage re-growth —
the failure mode that gave the r10 query 660 exchanges / 2^6 plan
re-derivation before the checkpoint fix).

Synthesis is in-engine and deterministic (xxhash64 spreads — no
driver-side data): ~100k suppliers x ~150k parts, ~10M raw rows
grouped to distinct weighted edges.

Run: python tools/stress_hits.py [n_rows]   (default 10_000_000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SUPP = 100_000
N_PART = 150_000


def main(n_rows: int = 10_000_000) -> None:
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.queries_round15 import hits_from_edges
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-hits")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    raw = (spark.range(n_rows).repartition(par * 2)
           .select((F.col("id") % N_SUPP).alias("s"),
                   (F.abs(F.xxhash64("id")) % N_PART).alias("p")))
    edges = (raw.groupBy("s", "p")
             .agg(F.count("*").cast("double").alias("w"))
             .localCheckpoint(eager=True))
    n_edges = edges.count()

    iter_secs: list[float] = []
    t0 = time.perf_counter()
    out = hits_from_edges(spark, edges, iter_seconds=iter_secs)
    n_out = out.count()
    total = time.perf_counter() - t0

    flat = max(iter_secs) / min(iter_secs) if iter_secs else None
    print(json.dumps({
        "n_raw_rows": n_rows, "n_edges": n_edges,
        "n_suppliers": N_SUPP, "n_parts": N_PART,
        "n_out_rows": n_out,
        "iter_secs": [round(t, 2) for t in iter_secs],
        "max_over_min_iter": round(flat, 2) if flat else None,
        "total_sec": round(total, 1),
        "edges_per_sec_per_iter": round(
            n_edges * len(iter_secs) / sum(iter_secs)),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
