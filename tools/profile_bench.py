"""Per-query bench profiler (optimization round r14, guide §1).

For each headline query: time build (construction incl. eager actions),
time exec via the noop sink (best-of-N with per-run breakdown), count
Spark jobs + stages + tasks attributed to the query via a job group,
and dump `.explain("formatted")` with plan-node counts.

Usage:
  python tools/profile_bench.py [query ...]          # default: top set
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_bench.py
Writes JSON lines to stdout and plan files to plans/<--plans-dir>/
(default r15) when --plans is passed.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def plan_counts(plan: str) -> dict:
    c = {}
    for pat, key in [
        (r"\bExchange\b", "exchange"),
        (r"\bReusedExchange\b", "reused_exchange"),
        (r"\bBroadcastExchange\b", "broadcast_exchange"),
        (r"\bSortMergeJoin\b", "smj"),
        (r"\bBroadcastHashJoin\b", "bhj"),
        (r"\bShuffledHashJoin\b", "shj"),
        (r"\bBroadcastNestedLoopJoin\b", "bnlj"),
        (r"\bCartesianProduct\b", "cartesian"),
        (r"\bBatchEvalPython\b", "batch_eval_python"),
        (r"\bArrowEvalPython\b", "arrow_eval_python"),
        (r"\bMapInArrow\b|\bMapInPandas\b|\bPythonMapInArrow\b", "map_in_arrow"),
        (r"\bWholeStageCodegen\b", "wsc"),
        (r"\bScan parquet\b", "parquet_scan"),
        (r"\bSort \b|\bSort\b \[", "sort"),
    ]:
        n = len(re.findall(pat, plan))
        if n:
            c[key] = n
    return c


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    write_plans = "--plans" in sys.argv
    suffix = "before"
    plans_dir = "r15"  # optimization r15; was r14
    for a in sys.argv:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        if a.startswith("--plans-dir="):
            plans_dir = a.split("=", 1)[1]
    names = [a for a in sys.argv[1:] if not a.startswith("--")]

    from travel_data_pipeline_spark import registry
    from travel_data_pipeline_spark.session import get_spark

    spark = get_spark("tdp-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # constant-work calibration probe (same as bench.py) so cross-run
    # comparisons on a drifting box can be normalized
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 600_000_000, 1, 32).selectExpr(
            "sum(id * id % 97)").collect()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"calib_sec": round(best, 3)}))

    if not names:
        import bench
        names = [n for n in bench.HEADLINE if n in registry.QUERIES]

    tracker = sc.statusTracker()

    def group_stats(group: str) -> dict:
        jobs = tracker.getJobIdsForGroup(group) or []
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        return {"jobs": len(jobs), "stages": n_stages, "tasks": n_tasks}

    os.makedirs(os.path.join(REPO_ROOT, "plans", plans_dir), exist_ok=True)
    for name in names:
        fn = registry.QUERIES[name]
        rec = {"query": name}
        try:
            grp = f"build:{name}"
            sc.setJobGroup(grp, name)
            tb = time.perf_counter()
            df = fn(spark, sf_dir)
            rec["build_sec"] = round(time.perf_counter() - tb, 3)
            rec["build_" + "jobs"] = group_stats(grp)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            rec["plan"] = plan_counts(plan)
            if write_plans:
                with open(os.path.join(REPO_ROOT, "plans", plans_dir,
                                       f"{name}_{suffix}.txt"), "w") as fh:
                    fh.write(plan)
            execs = []
            for i in range(reps):
                grp = f"exec:{name}:{i}"
                sc.setJobGroup(grp, name)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                execs.append(round(time.perf_counter() - t0, 3))
                if i == 0:
                    rec["exec_jobs"] = group_stats(grp)
            rec["exec_sec"] = min(execs)
            rec["exec_all"] = execs
        except Exception as exc:  # noqa: BLE001
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            sc.setJobGroup("idle", "idle")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
