"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered Spark query and its oracle SQL on the same parquet,
then compares row count, column names, and order-insensitive values.
Values are canonicalized to strings (floats via repr of float64) so the
comparison approximates a value-hash: any mismatch here is a mismatch
in the driver too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(v)
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonical_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    duck_pdf = con.execute(sql).df()

    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(
            f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}")

    s_rows = canonical_frame(spark_pdf)
    d_rows = canonical_frame(duck_pdf)
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in set(d_rows)][:5]
        diff_d = [r for r in d_rows if r not in set(s_rows)][:5]
        problems.append(
            f"{name}: values differ; spark-only (≤5): {diff_s}; "
            f"duck-only (≤5): {diff_d}; cols={s_cols}")
    return problems
