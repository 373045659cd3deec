"""Composed-dedup scale stress (VERDICT r09 #6): run the registered
dedup_scorecard END-TO-END — exact + minhash-LSH + simhash +
containment (shared pairs) + semantic rows — at a synthetic multi-
million-doc corpus, and certify that the r09 `pairs=` sharing seam
holds its win at scale (no hidden re-execution of the
signature+banding pipeline inside the composition).

Two phases:
  A. end-to-end: amplify sf0.1 documents/embeddings Nx into a tmp sf
     dir (copies 1..20 are near-dups — one appended token; later
     copies are distinct docs — per-word copy suffix; ~realistic dup
     density), then run dedup_scorecard(spark, tmp_dir) exactly as
     registered and record wall + rows/s.
  B. sharing-win: at a smaller amplification, time the containment
     component WITH the injected shared pairs vs WITHOUT (component
     builds its own) — the measured value of the seam.

Run: python tools/stress_scorecard.py [amplify_big] [amplify_small]
Defaults 1000 (5.0M docs) and 100 (0.5M docs). Prints JSON lines.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _amplified_sf_dir(spark, sf_dir: str, amplify: int, out_dir: str) -> int:
    """Write an Nx near-dup-amplified documents + embeddings star into
    out_dir; returns the amplified doc count."""
    from pyspark.sql import functions as F

    from travel_data_pipeline_spark.sources.readers import load_table

    par = spark.sparkContext.defaultParallelism
    copies = spark.range(amplify).withColumnRenamed("id", "copy")
    base = load_table(spark, sf_dir, "documents")
    # realistic dup density: copies 1..20 are NEAR-DUPS of the base
    # doc (one appended token — high Jaccard, LSH must catch them);
    # all later copies are DISTINCT documents (every word carries a
    # copy suffix, so no shingle survives). A corpus where EVERY doc
    # has `amplify` near-copies is a 99%+-dup pathology no cap should
    # be asked to absorb — ~20/amplify dup share matches real crawls.
    near = F.concat("text", F.lit(" v"), F.col("copy"))
    distinct = F.regexp_replace(
        F.col("text"), F.lit(r"(\S+)"),
        F.concat(F.lit("$1c"), F.col("copy").cast("string")))
    docs = (base.crossJoin(copies)
            .select((F.col("doc_id") + F.col("copy") * 10_000_000)
                    .alias("doc_id"),
                    F.when(F.col("copy") == 0, F.col("text"))
                    .when(F.col("copy") <= 20, near)
                    .otherwise(distinct).alias("text"),
                    "lang", "source", "n_chars")
            .repartition(par * 2))
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    emb = load_table(spark, sf_dir, "embeddings")
    (emb.crossJoin(copies)
     .select((F.col("vec_id") + F.col("copy") * 10_000_000)
             .alias("vec_id"), "embedding", "label")
     .repartition(par)
     .write.mode("overwrite").parquet(
         os.path.join(out_dir, "embeddings.parquet")))
    return spark.read.parquet(
        os.path.join(out_dir, "documents.parquet")).count()


def main(amplify_big: int = 1000, amplify_small: int = 100) -> None:
    from travel_data_pipeline_spark.queries_northstar import (
        containment_pairs,
        dedup_minhash_lsh,
    )
    from travel_data_pipeline_spark.queries_round11 import dedup_scorecard
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("stress-scorecard")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tmp = tempfile.mkdtemp(prefix="stress_scorecard_")
    try:
        # --- phase A: composed scorecard end-to-end at the big corpus
        n_docs = _amplified_sf_dir(spark, sf_dir, amplify_big, tmp)
        t0 = time.perf_counter()
        rows = dedup_scorecard(spark, tmp).collect()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "phase": "end_to_end", "amplify": amplify_big,
            "n_docs": n_docs, "wall_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall),
            "scorecard": {r.method: [r.n_pairs, r.n_docs_flagged]
                          for r in rows},
        }), flush=True)

        # --- phase B: sharing-win certification at the small corpus
        n_small = _amplified_sf_dir(spark, sf_dir, amplify_small, tmp)

        # the scorecard needs the LSH relation for its minhash row
        # regardless, so materialize it OUTSIDE the timed windows; the
        # sharing win is then t_own - t_shared (containment's internal
        # signature+banding rebuild, avoided by injection)
        t0 = time.perf_counter()
        lsh_pairs = dedup_minhash_lsh(spark, tmp).persist()
        n_lsh = lsh_pairs.count()
        t_lsh = time.perf_counter() - t0

        # own-build FIRST so scan-cache warmth favors neither arm
        t0 = time.perf_counter()
        n_own = containment_pairs(spark, tmp).count()  # own pairs build
        t_own = time.perf_counter() - t0

        t0 = time.perf_counter()
        shared_df = containment_pairs(spark, tmp, pairs=lsh_pairs)
        n_shared = shared_df.count()
        t_shared = time.perf_counter() - t0
        # content equality, not just counts (code-review r10): a seam
        # bug that swapped or rescored pairs while preserving the
        # count must not print rows_identical
        own_df = containment_pairs(spark, tmp)
        sym_diff = (shared_df.exceptAll(own_df).count()
                    + own_df.exceptAll(shared_df).count())
        lsh_pairs.unpersist()

        print(json.dumps({
            "phase": "sharing_win", "amplify": amplify_small,
            "n_docs": n_small, "n_lsh_pairs": n_lsh,
            "lsh_build_sec": round(t_lsh, 1),
            "containment_shared_sec": round(t_shared, 1),
            "containment_own_sec": round(t_own, 1),
            "win_sec": round(t_own - t_shared, 1),
            "rows_identical": n_shared == n_own and sym_diff == 0,
        }), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    big = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    main(big, small)
