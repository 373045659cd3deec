"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in travel_data_pipeline_spark.registry; this module is
the thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from travel_data_pipeline_spark import registry  # noqa: E402
from travel_data_pipeline_spark.session import tune_for_oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7 minimum slice) on sf0.001."""
    from travel_data_pipeline_spark.plans.flights import flight_value_query

    tune_for_oracle(spark)
    return flight_value_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Order matters: the driver's correctness harness samples the first
    50 entries per round, so verification.ordered_names puts
    not-yet-driver-verified queries first (see that module's docs).
    """
    from travel_data_pipeline_spark.verification import ordered_names

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(registry.QUERIES[name])
            for name in ordered_names(list(registry.QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return registry.resolved_oracles()
