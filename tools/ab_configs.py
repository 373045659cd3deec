"""A/B a set of runtime SQLConf overrides over a query list (r14).

Alternates BASE and VARIANT per repetition within one JVM so box drift
cannot masquerade as a win. Usage:
  python tools/ab_configs.py <variant-json> q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    variant = json.loads(sys.argv[1])
    names = sys.argv[2:]
    reps = int(os.environ.get("AB_REPS", "3"))

    from travel_data_pipeline_spark import registry
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("tdp-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = {k: spark.conf.get(k, None) for k in variant}

    def set_confs(c: dict) -> None:
        for k, v in c.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, str(v))

    results: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "var": []} for n in names}
    build_results: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "var": []} for n in names}
    for rep in range(reps):
        for arm, confs in (("base", base), ("var", variant)):
            set_confs(confs)
            for name in names:
                tb = time.perf_counter()
                df = registry.QUERIES[name](spark, sf_dir)
                build = time.perf_counter() - tb
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                results[name][arm].append(
                    round(time.perf_counter() - t0, 3))
                build_results[name][arm].append(round(build, 3))
    set_confs(base)
    tot_b = tot_v = 0.0
    for name in names:
        b = min(results[name]["base"])
        v = min(results[name]["var"])
        bb = min(build_results[name]["base"])
        bv = min(build_results[name]["var"])
        tot_b += b + bb
        tot_v += v + bv
        print(json.dumps({
            "query": name, "exec_base": b, "exec_var": v,
            "build_base": bb, "build_var": bv,
            "ratio": round((v + bv) / (b + bb), 3) if b + bb else None,
            "all_base": results[name]["base"],
            "all_var": results[name]["var"]}))
    print(json.dumps({"total_base": round(tot_b, 3),
                      "total_var": round(tot_v, 3),
                      "ratio": round(tot_v / tot_b, 3)}))


if __name__ == "__main__":
    main()
