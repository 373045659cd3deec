"""Golden-output tests pinning the reference's exact edge semantics
(SURVEY.md §5.2 / §7 hard part (a))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions import scalars as X
from travel_data_pipeline_spark.functions import scores


def _one(spark, col, schema="x double", row=(0.0,)):
    return spark.createDataFrame([row], schema).select(col.alias("v")).first().v


# --- W3 growth epsilon paths (google_trends_crawler.py:82-92, 103-111) ----

@pytest.mark.parametrize("recent,prior,expect", [
    (60.0, 50.0, 0.2),          # normal growth
    (7.0, 0.0, 7.0 / 1e-6),     # epsilon blow-up
    (0.0, 0.0, 0.0),            # both zero
    (0.0, 50.0, -1.0),          # total decline
])
def test_growth_rate(spark, recent, prior, expect):
    got = spark.range(1).select(
        scores.growth_rate(F.lit(recent), F.lit(prior)).alias("g")).first().g
    assert got == pytest.approx(expect)


def test_anchor_growth_snaps_to_one(spark):
    got = spark.range(1).select(
        scores.anchor_growth_rate(F.lit(30.0), F.lit(0.0)).alias("g")).first().g
    assert got == 1.0


# --- X9 log compression (google_trends_processor.py:187-194) --------------

@pytest.mark.parametrize("x,expect", [
    (9.0, 1.0),        # log10(10) = 1
    (-0.4, -0.4),      # negative: identity
    (0.0, 0.0),
])
def test_log_compress(spark, x, expect):
    got = spark.range(1).select(X.log_compress(F.lit(x)).alias("v")).first().v
    assert got == pytest.approx(expect)


# --- X11 scale + cap (google_trends_processor.py:200-217) ------------------

@pytest.mark.parametrize("x,expect", [
    (5.0, 50.0),
    (15.0, 100.0),     # cap
    (-3.0, 0.0),       # negatives -> 0
    (0.0, 0.0),
])
def test_scale_to_100(spark, x, expect):
    got = spark.range(1).select(X.scale_to_100(F.lit(x)).alias("v")).first().v
    assert got == expect


# --- X12 blend + clamp ------------------------------------------------------

def test_trend_score_blend_and_clamp(spark):
    # growth 9 -> log10(10)=1 -> norm 10; interest 100 -> 0.7*10+0.3*100=37
    got = spark.range(1).select(
        scores.trend_score(F.lit(9.0), F.lit(100.0)).alias("v")).first().v
    assert got == pytest.approx(37.0)
    # epsilon-path growth 7e6 -> log10 ~6.845 -> norm 68.45 -> 77.92
    got = spark.range(1).select(
        scores.trend_score(F.lit(7e6), F.lit(100.0)).alias("v")).first().v
    assert got == pytest.approx(77.9156863, abs=1e-4)
    # growth big enough to cap norm at 100 (log10 > 10 needs g > 1e10-1)
    got = spark.range(1).select(
        scores.trend_score(F.lit(5e10), F.lit(100.0)).alias("v")).first().v
    assert got == 100.0


# --- F6/X10 exchange gate + band (exchage_rate_crawler.py:604-649) ---------

@pytest.mark.parametrize("rt,yr,change,score", [
    (1350.5, 1250.0, 8.04, 9.8),
    (1450.0, 1500.0, -3.33, 66.67),
    (1800.0, 1500.0, 20.0, 0.0),       # clamp below band
    (0.0, 9.5, -100.0, 100.0),          # '-' -> 0.0 is valid, clamps above
    (None, 1000.0, None, 0.0),          # gate: null realtime
    (1000.0, None, None, 0.0),          # gate: null yearly
    (1000.0, 0.0, None, 0.0),           # gate: yearly == 0
])
def test_exchange_semantics(spark, rt, yr, change, score):
    df = spark.createDataFrame([(rt, yr)], "rt double, yr double")
    row = df.select(
        scores.exchange_change_pct(F.col("rt"), F.col("yr")).alias("c"),
        scores.exchange_score(F.col("rt"), F.col("yr")).alias("s")).first()
    if change is None:
        assert row.c is None
    else:
        assert row.c == pytest.approx(change, abs=0.01)
    assert row.s == pytest.approx(score, abs=0.01)


# --- X2 rate parse ('-'/''/thousands) ---------------------------------------

@pytest.mark.parametrize("raw,expect", [
    ("1,350.50", 1350.5),
    ("-", 0.0),
    ("", 0.0),
    (None, 0.0),
    (" 905.12 ", 905.12),
])
def test_parse_rate(spark, raw, expect):
    df = spark.createDataFrame([(raw,)], "c string")
    assert df.select(X.parse_rate("c").alias("v")).first().v == expect


# --- X1 currency extraction ---------------------------------------------------

@pytest.mark.parametrize("raw,expect", [
    ("미국 USD", "USD"),
    ("일본 JPY(100)", "JPY"),
    ("인도네시아 IDR(10)", "IDR"),
])
def test_extract_currency_code(spark, raw, expect):
    df = spark.createDataFrame([(raw,)], "c string")
    assert df.select(X.extract_currency_code("c").alias("v")).first().v == expect


# --- X10 degenerate range -> 50.0 ---------------------------------------------

def test_minmax_degenerate_range(spark):
    got = spark.range(1).select(
        X.minmax_rescale(F.lit(5.0), F.lit(3.0), F.lit(3.0)).alias("v")).first().v
    assert got == 50.0


# --- X17 NaN asymmetry ----------------------------------------------------------

def test_nan_asymmetry(spark):
    df = spark.createDataFrame([(float("nan"),), (1.5,)], "x double")
    got = df.select(
        X.nan_to_zero("x").alias("z"), X.nan_to_null("x").alias("n")).collect()
    assert got[0].z == 0.0 and got[0].n is None
    assert got[1].z == 1.5 and got[1].n == 1.5


# --- X21 map upsert ---------------------------------------------------------------

def test_map_upsert(spark):
    df = spark.createDataFrame(
        [({"202401": 1.0, "202402": 2.0},)], "m map<string,double>")
    got = df.select(X.map_upsert(
        "m", F.lit("202402"), F.lit(9.9)).alias("v")).first().v
    assert got == {"202401": 1.0, "202402": 9.9}


# --- as-of join correctness on crafted data ------------------------------------

def test_asof_join(spark):
    import datetime as dt

    from travel_data_pipeline_spark.operators.joins import asof_join

    fact = spark.createDataFrame([
        ("USD", dt.datetime(2024, 1, 10), 100.0),
        ("USD", dt.datetime(2024, 1, 20), 200.0),
        ("EUR", dt.datetime(2024, 1, 5), 300.0),   # before any quote -> null
    ], "ccy string, ts timestamp, amount double")
    quotes = spark.createDataFrame([
        ("USD", dt.datetime(2024, 1, 1), 1300.0),
        ("USD", dt.datetime(2024, 1, 15), 1350.0),
        ("EUR", dt.datetime(2024, 1, 8), 1450.0),
    ], "ccy string, qts timestamp, rate double")

    out = asof_join(fact, quotes, "ccy", "ts", "qts", ["rate"])
    got = {(r.ccy, r.amount): r.rate for r in out.collect()}
    assert got == {("USD", 100.0): 1300.0,   # 01-10 -> quote of 01-01
                   ("USD", 200.0): 1350.0,   # 01-20 -> quote of 01-15
                   ("EUR", 300.0): None}     # 01-05 precedes 01-08 quote


# --- salted two-stage aggregation == plain aggregation ----------------------------

def test_salted_sum_equals_plain(spark, sf_smoke):
    from travel_data_pipeline_spark.operators.aggregates import salted_sum
    from travel_data_pipeline_spark.sources.readers import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    salted = {r.l_returnflag: r.total for r in
              salted_sum(li, ["l_returnflag"], "l_extendedprice", "total").collect()}
    plain = {r.l_returnflag: r.total for r in
             li.groupBy("l_returnflag")
             .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("double").alias("total")).collect()}
    assert salted == plain


# --- property-style checks (SURVEY.md §5.4) ----------------------------------------

def test_clamp_always_in_range(spark):
    df = spark.range(-200, 200, 7).select(
        X.clamp(F.col("id").cast("double"), 0.0, 100.0).alias("v"))
    lo, hi = df.agg(F.min("v"), F.max("v")).first()
    assert lo >= 0.0 and hi <= 100.0


def test_approximate_aggregates_bounds(spark, sf_smoke):
    """Approximate aggregates (SURVEY.md §2.4 'absent in reference',
    engine exposes Spark's): approx_count_distinct within its published
    rsd, percentile_approx close to the exact interpolated percentile."""
    from travel_data_pipeline_spark.sources.readers import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("p50_exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.p50_approx - row.p50_exact) / row.p50_exact < 0.02


def test_unpivot_roundtrip_count(spark, sf_smoke):
    from travel_data_pipeline_spark.sources.readers import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    longf = li.unpivot(["l_orderkey", "l_linenumber"],
                       ["l_quantity", "l_extendedprice", "l_discount"],
                       "measure", "value")
    assert longf.count() == li.count() * 3
