"""Query registry — the driver-facing inventory.

Every implemented operator from SURVEY.md §2 registers here as a
(PySpark callable, DuckDB oracle SQL) pair. ``__spark_entry__.py``
re-exports this. Column names are aliased identically on both sides
(the driver sorts columns by name before value-hashing).

Float-determinism rules used throughout (see operators/aggregates.py):
- money sums/avgs go through DECIMAL(18,2) (order-independent), cast
  back to double;
- derived ratios are computed with the same expression tree on both
  sides (per-row IEEE double ops are deterministic);
- scores from iterative/array folds are ROUND(x, 6) on both sides;
- any rounded column that can land near zero from a NEGATIVE value
  gets `+ 0.0` on BOTH sides — the engines disagree on -0.0 vs 0.0
  and the value-hash compares strings (found at sf0.1:
  weighted_sample_docs);
- deep-recurrence outputs (EWMA-style folds) use the Spark-parity
  rounding spelling in the ORACLE:
  `round(CAST(format('{}', x) AS DECIMAL(38,18)), 6)` — DuckDB's
  plain round() scales by 1e6 in binary and can cross a .5 boundary
  the true value is under, while Spark HALF_UPs the shortest decimal
  rendering (found at sf0.1: ewma_values_per_user, 6/100k rows).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
# values: oracle SQL, or a zero-arg callable producing it (lazy oracles
# regenerate data-dependent literals at access time, so driver testdata
# regeneration between rounds can't strand a stale pinned value)
ORACLES: dict[str, str | Callable[[], str]] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query, optionally
    with its DuckDB oracle SQL (a string, or a zero-arg callable that
    renders it on demand)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def resolved_oracles() -> dict[str, str]:
    """ORACLES with lazy entries rendered to SQL strings.

    A lazy oracle can touch the filesystem or optional imports at
    render time (e.g. the PCA oracle reads $SPARK_GRAFT_ORACLE_SF); a
    single failing render must cost only ITS entry (that query falls
    back to the driver's rows-only check), never the whole map."""
    out: dict[str, str] = {}
    for name, sql in ORACLES.items():
        if callable(sql):
            try:
                out[name] = sql()
            except Exception as exc:  # noqa: BLE001 - deliberate isolation
                import sys

                print(f"registry: oracle for {name!r} failed to render, "
                      f"dropping it: {type(exc).__name__}: {exc}",
                      file=sys.stderr)
        else:
            out[name] = sql
    return out


# --- import side-effect registration (each module calls register()) -------
from travel_data_pipeline_spark import queries_affinity  # noqa: E402,F401
from travel_data_pipeline_spark import queries_cleaning  # noqa: E402,F401
from travel_data_pipeline_spark import queries_core  # noqa: E402,F401
from travel_data_pipeline_spark import queries_curation  # noqa: E402,F401
from travel_data_pipeline_spark import queries_dims  # noqa: E402,F401
from travel_data_pipeline_spark import queries_ml  # noqa: E402,F401
from travel_data_pipeline_spark import queries_domain  # noqa: E402,F401
from travel_data_pipeline_spark import queries_northstar  # noqa: E402,F401
from travel_data_pipeline_spark import queries_ops  # noqa: E402,F401
from travel_data_pipeline_spark import queries_search  # noqa: E402,F401
from travel_data_pipeline_spark import queries_sketches  # noqa: E402,F401
from travel_data_pipeline_spark import queries_stats  # noqa: E402,F401
from travel_data_pipeline_spark import queries_timeseries  # noqa: E402,F401
from travel_data_pipeline_spark import queries_tpch  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round5  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round6  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round7  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round8  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round9  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round10  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round11  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round12  # noqa: E402
from travel_data_pipeline_spark import queries_round13  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round14  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round15  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round16  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round17  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round18  # noqa: E402,F401
from travel_data_pipeline_spark import queries_round19  # noqa: E402,F401
