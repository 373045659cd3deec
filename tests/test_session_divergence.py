"""Regression guard for local-vs-driver session dtype divergence.

The driver constructs its own SparkSession which may lack
``spark.sql.legacy.parquet.nanosAsLong``; events.ts (TIMESTAMP(NANOS)
in parquet) then arrives as TIMESTAMP_NTZ instead of a nanos bigint.
Round 2 shipped green locally but red on the driver because
``F.unix_micros`` rejects NTZ input (VERDICT r02 finding 1). These
tests flip the knob at runtime and re-run the timestamp-sensitive
queries against their DuckDB oracles, so code must be correct for BOTH
dtypes to pass locally.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_connection

NANOS_KNOB = "spark.sql.legacy.parquet.nanosAsLong"

# The queries whose plans touch events.ts arithmetic/extraction — the
# blast radius of the r02 regression.
TS_SENSITIVE = [
    "sessionize_events",
    "scd2_event_type_history",
    "interval_overlap_join",
    "tumbling_hourly",
]


@pytest.fixture()
def ntz_session(spark):
    """Session reading events.ts as TIMESTAMP_NTZ (driver-like)."""
    old = spark.conf.get(NANOS_KNOB, "false")
    spark.conf.set(NANOS_KNOB, "false")
    yield spark
    spark.conf.set(NANOS_KNOB, old)


def test_load_table_normalizes_ntz(ntz_session, sf_smoke):
    from travel_data_pipeline_spark.sources.readers import load_table

    e = load_table(ntz_session, sf_smoke, "events")
    assert dict(e.dtypes)["ts"] == "timestamp", (
        "load_table must normalize TIMESTAMP_NTZ to TIMESTAMP so "
        "unix_micros et al. work in the driver's session")


@pytest.mark.parametrize("name", TS_SENSITIVE)
def test_ts_queries_green_under_ntz(name, ntz_session, sf_dir):
    import __spark_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    if name not in queries:
        pytest.skip(f"{name} not registered")
    df = queries[name](ntz_session, sf_dir)
    con = duck_connection(sf_dir)
    try:
        problems = compare(df, con, oracles[name], name)
    finally:
        con.close()
    assert not problems, "\n".join(problems)
