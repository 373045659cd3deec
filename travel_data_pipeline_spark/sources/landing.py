"""S1–S3 landing scripts: the HTTP-crawl -> raw-layer hop, offline.

The reference's entry points are network crawls — HTML exchange-rate
tables (exchage_rate_crawler.py:107-322), pytrends interest series
(google_trends_crawler.py:32-130), and a nested-JSON flights REST
response (_archive/flight_price_preprocessing.py:3-49). The engine
deliberately starts AFTER landing: raw files -> schema'd readers ->
one logical plan. These functions write that raw layer.

Online crawling is import-guarded: if `requests`/`bs4`/`pytrends` are
installed a real crawl could be wired in, but this container has none
of them, so every lander falls back to the deterministic fixture
payloads — same rows the oracle-paired queries pin. That keeps the
end-to-end demo (examples/landing_pipeline.py) runnable anywhere while
the raw-file formats stay exactly what a real crawler would write:

- exchange: JSON lines, one object per HTML table cell-tuple
- trends:   JSON lines, one object per (group, keyword, ts, interest)
- flights:  JSON lines, one REST response document per line (nested)

Scale note: landing is inherently a driver/crawler-side step (the
reference runs it in a function app, not the engine). Files land
small and append-only; the engine reads them with explicit schemas
(readers below) so a million landed files later the scan still prunes
columns and pushes filters.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from travel_data_pipeline_spark import fixtures as FX

try:  # pragma: no cover - not installed in this container
    import requests  # type: ignore  # noqa: F401
    import bs4  # type: ignore  # noqa: F401

    _HAVE_HTTP = True
except ImportError:
    _HAVE_HTTP = False


def _write_jsonl(path: str, rows: list[dict]) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        for row in rows:
            fh.write(json.dumps(row, ensure_ascii=False) + "\n")
    return path


def land_exchange_cells(out_path: str, online: bool = False) -> str:
    """S1 — land the positional HTML cells as JSONL.

    ``online=True`` would run the real table crawl (requires requests +
    bs4); offline writes the fixture cells in the same shape the HTML
    parse emits (exchage_rate_crawler.py:158-180's cell tuples)."""
    if online:
        if not _HAVE_HTTP:
            raise NotImplementedError(
                "online crawl needs requests+bs4; land offline instead")
        raise NotImplementedError("network crawling is out of scope here")
    rows = [dict(zip(FX.EXCHANGE_CELLS_COLS, r))
            for r in FX.EXCHANGE_CELLS_ROWS]
    return _write_jsonl(out_path, rows)


def land_trends_rows(out_path: str, online: bool = False) -> str:
    """S2 — land the long-format interest series as JSONL (the shape
    pytrends' interest_over_time yields after melt,
    google_trends_crawler.py:60-75), INCLUDING pytrends' isPartial
    marker on the trailing (still-accumulating) observation of each
    series — the raw layer keeps what the API sent; the drop happens
    on read (P1, crawler :66-67)."""
    if online:
        raise NotImplementedError(
            "online crawl needs pytrends; land offline instead")
    last_ts: dict[tuple, object] = {}
    for (g, k, ts, _v) in FX.TRENDS_ROWS:
        cur = last_ts.get((g, k))
        if cur is None or ts > cur:
            last_ts[(g, k)] = ts
    rows = [{"group_id": g, "keyword": k,
             "ts": ts.strftime("%Y-%m-%dT%H:%M:%S"), "interest": v,
             "isPartial": ts == last_ts[(g, k)]}
            for (g, k, ts, v) in FX.TRENDS_ROWS]
    return _write_jsonl(out_path, rows)


def land_flight_offers(out_path: str, online: bool = False) -> str:
    """S3 — land the nested REST flight-offer documents as JSONL, one
    response document per line (the itineraries->sector->segments
    nesting of _archive/flight_price_preprocessing.py:3-49)."""
    if online:
        raise NotImplementedError(
            "online crawl needs an API client; land offline instead")
    return _write_jsonl(out_path, FX.FLIGHT_ROWS)


# ---------------------------------------------------------------------------
# schema'd raw readers — the engine-side entry for the landed layer
# ---------------------------------------------------------------------------

def read_exchange_cells_raw(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path, schema=FX.EXCHANGE_CELLS_SCHEMA)


def read_trends_raw(spark: SparkSession, path: str) -> DataFrame:
    """Read the landed series and apply the explicit P1 isPartial drop
    (google_trends_crawler.py:66-67) — rows are kept, only the marker
    column goes."""
    from travel_data_pipeline_spark.plans.trends import drop_is_partial

    raw = spark.read.json(
        path, schema=FX.TRENDS_SCHEMA + ", isPartial boolean")
    return drop_is_partial(raw)


def read_flight_offers_raw(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path, schema=FX.FLIGHT_SCHEMA)
