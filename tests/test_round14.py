"""Round-14 tests: the batch/stream twin equality for the
unconverted-clicks retargeting feed, and cube semantics checks."""

from __future__ import annotations

import os
from collections import defaultdict

from pyspark.sql import functions as F


def _write_feed_file(spark, path: str, rows, mtime: int) -> None:
    """Write one micro-batch parquet file with MICROS timestamps (the
    stream's schema rejects pandas' default NANOS int64)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    pdf = df.toPandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path)
    os.utime(path, (mtime, mtime))


def test_unconverted_clicks_batch_stream_bit_equal(spark, sf_smoke,
                                                   tmp_path):
    """The registered batch query and the streaming left-outer
    interval join must produce the SAME relation on the same events —
    the holt_winters twin pattern. The stream is driven over the full
    sf0.001 events feed plus a far-future sentinel batch (advances the
    watermark so every unmatched click flushes); sentinel rows are
    dropped before comparison."""
    import travel_data_pipeline_spark.registry  # noqa: F401
    import travel_data_pipeline_spark.streaming.jobs as J
    from travel_data_pipeline_spark.queries_round14 import (
        unconverted_clicks,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = (load_table(spark, sf_smoke, "events")
          .select("event_id", "ts", "user_id", "event_type", "value"))
    rows = [(r.event_id, r.ts, r.user_id, r.event_type, r.value)
            for r in ev.collect()]
    max_ts = max(r[1] for r in rows)

    feed = tmp_path / "feed"
    feed.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_feed_file(spark, str(feed / "b0.parquet"), rows, 1700000000)
    # sentinel: one click + one purchase far past every real join
    # window, on BOTH filtered sides, so each side's watermark jumps
    import datetime as dt

    far = max_ts + dt.timedelta(days=30)
    sentinel_user = 999_999_999
    _write_feed_file(spark, str(feed / "b1.parquet"), [
        (10_000_001, far, sentinel_user, "click", 0.0),
        (10_000_002, far, sentinel_user, "purchase", 1.0),
    ], 1700000100)

    def run():
        stream = (spark.readStream
                  .schema("event_id long, ts timestamp, user_id long, "
                          "event_type string, value double")
                  .option("maxFilesPerTrigger", 1).parquet(str(feed)))
        res = J.unconverted_clicks_stream(
            stream.filter(F.col("event_type") == "click"),
            stream.filter(F.col("event_type") == "purchase"))
        q = (res.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)

    run()
    run()  # extra cycle: advanced watermark evicts + flushes state

    stream_rows = {
        (r.user_id, r.click_id,
         int(r.click_ts.timestamp() * 1_000_000),
         r.purchase_id, r.amount, int(r.converted))
        for r in spark.read.parquet(out).collect()
        if r.user_id != sentinel_user}
    batch_rows = {
        (r.user_id, r.click_id, r.click_ts_us,
         r.purchase_id, r.amount, r.converted)
        for r in unconverted_clicks(spark, sf_smoke).collect()}
    assert stream_rows == batch_rows
    # the feed must actually exercise both arms
    assert any(r[5] == 1 for r in batch_rows)
    assert any(r[5] == 0 for r in batch_rows)


def test_unconverted_clicks_matches_python(spark, sf_smoke):
    """Independent python model: nested-loop join semantics over the
    raw events (catches shared-blind-spot bugs oracle parity can't)."""
    import travel_data_pipeline_spark.registry  # noqa: F401
    from travel_data_pipeline_spark.queries_round14 import (
        unconverted_clicks,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = [(r.event_id, r.ts, r.user_id, r.event_type, r.value)
          for r in load_table(spark, sf_smoke, "events").collect()]
    clicks = [(e, ts, u) for e, ts, u, t, _ in ev if t == "click"]
    purch = defaultdict(list)
    for e, ts, u, t, v in ev:
        if t == "purchase":
            purch[u].append((e, ts, v))
    want = set()
    for cid, cts, u in clicks:
        matches = [(pid, pts, v) for pid, pts, v in purch[u]
                   if cts <= pts and (pts - cts).total_seconds() <= 3600]
        cus = int(cts.timestamp() * 1_000_000)
        if matches:
            for pid, _, v in matches:
                want.add((u, cid, cus, pid, v, 1))
        else:
            want.add((u, cid, cus, None, None, 0))
    got = {(r.user_id, r.click_id, r.click_ts_us, r.purchase_id,
            r.amount, r.converted)
           for r in unconverted_clicks(spark, sf_smoke).collect()}
    assert got == want


def test_cube_revenue_margins_consistency(spark, sf_smoke):
    """Cube algebra: the 4 grouping combos must be mutually consistent
    (cell sums roll up exactly to each margin and to the grand total —
    exact because revenue/charge fold as decimals before the cast)."""
    import travel_data_pipeline_spark.registry  # noqa: F401
    from travel_data_pipeline_spark.queries_round14 import (
        cube_revenue_margins,
    )

    rows = cube_revenue_margins(spark, sf_smoke).collect()
    cells = [r for r in rows if (r.g_flag, r.g_year) == (0, 0)]
    by_flag = {r.l_returnflag: r for r in rows
               if (r.g_flag, r.g_year) == (0, 1)}
    by_year = {r.ship_year: r for r in rows
               if (r.g_flag, r.g_year) == (1, 0)}
    total = [r for r in rows if (r.g_flag, r.g_year) == (1, 1)]
    assert len(total) == 1
    assert sum(r.n for r in cells) == total[0].n
    assert abs(sum(r.revenue for r in cells) - total[0].revenue) < 1e-4
    for flag, r in by_flag.items():
        cell_n = sum(c.n for c in cells if c.l_returnflag == flag)
        assert cell_n == r.n
    for year, r in by_year.items():
        cell_rev = sum(c.revenue for c in cells if c.ship_year == year)
        assert abs(cell_rev - r.revenue) < 1e-4
    # rolled-up dims are NULL in the output rows
    assert total[0].l_returnflag is None and total[0].ship_year is None
