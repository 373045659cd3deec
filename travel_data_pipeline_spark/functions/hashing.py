"""Deterministic, engine-portable hashing primitives.

The dedup / fingerprint operators (SURVEY.md §2.10) need hashes that
(a) are stable across Spark versions and partitionings and (b) can be
reproduced by the DuckDB oracle in pure ANSI-ish SQL. Spark's
``xxhash64``/``hash`` do not exist in DuckDB, so everything here is
built on ``md5`` (identical in both engines) with hex->int conversion:

    Spark : conv(substr(md5(x), 1, 15), 16, 10) cast long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

15 hex chars = 60 bits, safely inside a signed 64-bit integer in both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits < 2^63 in both engines


def md5_long(c: Column) -> Column:
    """Uniform 60-bit integer hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, HEX_CHARS), 16, 10).cast("long")


def md5_long_seeded(c: Column, seed: int) -> Column:
    """Seeded variant — one independent hash family member per seed."""
    return md5_long(F.concat(F.lit(f"s{seed}:"), c))


def md5_long_sql(expr: str) -> str:
    """DuckDB spelling of ``md5_long`` for oracle parity."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_CHARS})) AS BIGINT)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"concat('s{seed}:', {expr})")
