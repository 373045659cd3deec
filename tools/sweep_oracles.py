"""Full-registry oracle sweep at an arbitrary SF (default sf0.1).

The driver's gate runs at sf0.01; this sweep substantiates the README
claim that the numeric discipline holds at 10x that scale:

    python tools/sweep_oracles.py [sf_dir]

Prints one line per query (OK / MISMATCH / ERROR) and a final FAILED
list. The skip set is EMPTY since round 4: the former skips
(semantic_dedup, kmeans_embeddings, pca_embeddings_by_label) validate
fine at sf0.1 — lazy oracles render against this sweep's sf_dir via
$SPARK_GRAFT_ORACLE_SF, set below before the registry import.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SKIP_AT_SCALE: set[str] = set()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # lazy oracles (pca) compute ground truth off the oracle SF — point
    # them at the swept SF before anything renders
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import duckdb

    import __spark_entry__ as E
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    def canon(p):
        cols = sorted(p.columns)
        return sorted(map(tuple, p[cols].astype(str).values.tolist()))

    q, o = E.queries(), E.oracle_sql()
    only = {n for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n}
    if only:
        q = {n: q[n] for n in q if n in only}
    failed = []
    for i, name in enumerate(q):
        if name in SKIP_AT_SCALE:
            print(f"{i:3d} {name}: SKIP (oracle cost)", flush=True)
            continue
        t0 = time.time()
        try:
            sp = q[name](spark, sf_dir).toPandas()
            du = con.execute(o[name]).df()
            ok = canon(sp) == canon(du)
            print(f"{i:3d} {name}: {'OK' if ok else 'MISMATCH'} "
                  f"rows={len(sp)} {time.time() - t0:.1f}s", flush=True)
            if not ok:
                failed.append(name)
        except Exception as exc:
            print(f"{i:3d} {name}: ERROR {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
            failed.append(name)
    print("FAILED:", failed)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
