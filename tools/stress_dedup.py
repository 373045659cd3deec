"""Dedup scale stress: amplify the documents table Nx (deterministic id
offsets + per-copy word perturbation via id-salted suffix) and time the
MinHash-LSH and SimHash paths end-to-end.

Run: python tools/stress_dedup.py [amplification]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(amplify: int = 20) -> None:
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.operators import dedup
    from travel_data_pipeline_spark.session import get_spark
    from travel_data_pipeline_spark.sources.readers import load_table

    spark = get_spark("stress-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    copies = spark.range(amplify).withColumnRenamed("id", "copy")
    # every copy beyond 0 appends a copy-specific token -> near-dup of
    # the original (jaccard just under 1), so LSH has real work to do
    docs = (base.crossJoin(copies)
            .select((F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
                    F.when(F.col("copy") == 0, F.col("text"))
                     .otherwise(F.concat("text", F.lit(" v"), F.col("copy")))
                     .alias("text")))
    n_docs = docs.count()

    t0 = time.perf_counter()
    sigs = dedup.minhash_signatures(docs)
    sigs.write.format("noop").mode("overwrite").save()
    t_sig = time.perf_counter() - t0

    t0 = time.perf_counter()
    pairs = dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))
    n_pairs = pairs.count()
    t_lsh = time.perf_counter() - t0

    t0 = time.perf_counter()
    fp = dedup.simhash_fingerprints(docs)
    near = dedup.simhash_near_pairs(fp)
    n_near = near.count()
    t_sim = time.perf_counter() - t0

    t0 = time.perf_counter()
    survivors = dedup.exact_dedup(docs)
    n_exact = survivors.count()
    t_exact = time.perf_counter() - t0

    # star CC on an adversarial 1M-vertex chain (diameter 10^6): the
    # propagation engine would need 10^6 rounds; the alternating
    # large/small-star contraction must finish in ~log^2 rounds
    from travel_data_pipeline_spark.operators import graph

    n_chain = 1_000_000
    chain = (spark.range(1, n_chain)
             .select(F.col("id").alias("doc_a"),
                     (F.col("id") + 1).alias("doc_b")))
    t0 = time.perf_counter()
    comps = graph.connected_components_star(chain, max_iter=40)
    one_comp = comps.agg(F.countDistinct("component")).first()[0]
    t_star = time.perf_counter() - t0

    print(json.dumps({
        "n_base": n_base, "amplify": amplify, "n_docs": n_docs,
        "minhash_signatures_sec": round(t_sig, 2),
        "lsh_pairs_sec": round(t_lsh, 2), "lsh_pairs": n_pairs,
        "simhash_pairs_sec": round(t_sim, 2), "simhash_pairs": n_near,
        "exact_dedup_sec": round(t_exact, 2), "exact_survivors": n_exact,
        "docs_per_sec_minhash": round(n_docs / t_sig),
        "star_cc_chain_vertices": n_chain,
        "star_cc_components": one_comp,
        "star_cc_sec": round(t_star, 2),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
