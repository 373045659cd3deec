"""Round-14 query-semantics tests for queries_round19.py.

Every test cross-checks a registered query against an INDEPENDENT
pure-pandas/python reference computed from the same parquet (not the
DuckDB oracle — that parity is the driver's job; these pin the MATH),
or asserts the documented surface semantics directly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from travel_data_pipeline_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF}/events.parquet")


def _run(spark, name):
    return registry.QUERIES[name](spark, SF).toPandas()


def test_lateral_topk_per_key(spark):
    out = _run(spark, "lateral_topk_per_key")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    ref = (cust.merge(nation, left_on="c_nationkey",
                      right_on="n_nationkey")
           .sort_values(["n_name", "c_acctbal", "c_name"],
                        ascending=[True, False, True])
           .groupby("n_name").head(2))
    assert len(out) == len(ref)
    got = {(r.nation, r.cust_name) for r in out.itertuples()}
    want = {(r.n_name, r.c_name) for r in ref.itertuples()}
    assert got == want
    # rnk is 1..2 within every nation
    assert set(out.groupby("nation")["rnk"].max()) == {2}
    assert set(out.groupby("nation")["rnk"].min()) == {1}


def test_try_error_safe_suite(spark):
    row = _run(spark, "try_error_safe_suite").iloc[0]
    assert row["cast_ok"] == 42
    for c in ("cast_junk", "cast_empty", "date_invalid", "div_zero",
              "add_overflow", "sub_overflow", "mul_overflow",
              "tonum_junk", "arr_oob", "map_miss"):
        assert pd.isna(row[c]), c
    assert row["date_leap"] == "2024-02-29"
    assert row["cast_sci"] == 1000.0
    assert row["div_ok"] == 2.5
    assert row["add_ok"] == 12
    assert row["tonum_ok"] == 1234.56
    assert row["arr_hit"] == 20 and row["map_hit"] == 9


def test_variant_get_suite(spark, events_pdf):
    out = _run(spark, "variant_get_suite").set_index("event_id")
    ev = events_pdf[events_pdf.event_id < 50].set_index("event_id")
    assert len(out) == len(ev)
    for eid, r in out.iterrows():
        assert r["u"] == ev.loc[eid, "user_id"]
        assert r["t"] == ev.loc[eid, "event_type"]
        assert r["a1"] == eid % 11
        assert pd.isna(r["miss"])
        assert r["sch"] == "OBJECT<a: ARRAY<BIGINT>, t: STRING, u: BIGINT>"


def test_transpose_region_stats(spark):
    out = _run(spark, "transpose_region_stats")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    j = (cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
         .merge(region, left_on="n_regionkey", right_on="r_regionkey"))
    assert list(out["key"]) == ["avg_bal", "n_cust", "n_nations"]
    for rname, grp in j.groupby("r_name"):
        col = out.set_index("key")[rname]
        assert col["n_cust"] == len(grp)
        assert col["n_nations"] == grp["n_nationkey"].nunique()
        assert abs(col["avg_bal"] - round(grp["c_acctbal"].mean(), 6)) < 1e-9


def test_collation_lcase_groups(spark, events_pdf):
    out = _run(spark, "collation_lcase_groups")
    ev = events_pdf.copy()
    mod = ev.event_id % 3
    k = ev.event_type.where(mod == 2,
                            ev.event_type.str.upper().where(
                                mod == 0,
                                ev.event_type.str.capitalize()))
    ref = (pd.DataFrame({"lkey": k.str.lower(), "k": k})
           .groupby("lkey")
           .agg(n=("k", "size"), n_case_variants=("k", "nunique")))
    got = out.set_index("lkey")
    assert got["n"].to_dict() == ref["n"].to_dict()
    assert (got["n_case_variants"].to_dict()
            == ref["n_case_variants"].to_dict())
    # the collated grouping genuinely absorbed multiple raw spellings
    assert (got["n_case_variants"] >= 2).all()


def test_hll_sketch_builtin_audit(spark, events_pdf):
    out = _run(spark, "hll_sketch_builtin_audit")
    ref = events_pdf.groupby("event_type")["user_id"].nunique()
    assert out.set_index("event_type")["n_exact"].to_dict() == ref.to_dict()
    assert out["est_within_5pct"].all()
    assert out["merge_within_5pct"].all()


def test_interval_arith_suite(spark, events_pdf):
    out = _run(spark, "interval_arith_suite").set_index("event_id")
    ev = events_pdf[events_pdf.event_id < 40].set_index("event_id")
    us = (pd.to_datetime(ev["ts"]).astype("datetime64[us]")
          .astype("int64"))
    for eid, r in out.iterrows():
        mins, weeks = int(eid) % 90, int(eid) % 5
        base = int(us.loc[eid])
        assert r["plus_3h_us"] == base + 3 * 3_600_000_000
        assert r["plus_kmin_us"] == base + mins * 60_000_000
        assert r["plus_kweek_us"] == base + weeks * 7 * 86_400_000_000
        assert r["plus_dt_us"] == base + ((26 * 60 + 3) * 60 + 4) * 1_000_000
        assert r["diff_min"] == mins
        assert r["diff_hour"] == 3
        assert r["diff_day"] == 7 * weeks


# --- batch 2: codec/url/xml/map-null/tz/bitmap surfaces --------------------


def test_codec_hash_suite(spark):
    import base64
    import hashlib
    import zlib

    out = _run(spark, "codec_hash_suite").set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs.doc_id < 25].set_index("doc_id")
    assert len(out) == len(docs)
    for did, r in out.iterrows():
        s = docs.loc[did, "text"][:16]
        b = s.encode("utf-8")
        assert r["b64"] == base64.b64encode(b).decode()
        assert r["rt_b64"] == s
        assert r["hx"] == b.hex()
        assert r["rt_hex"] == s
        assert r["md5_s"] == hashlib.md5(b).hexdigest()
        assert r["sha256_s"] == hashlib.sha256(b).hexdigest()
        assert r["bl"] == 8 * len(b)
        assert r["ol"] == len(b)
        assert r["sha1_lit"] == hashlib.sha1(b"travel-data").hexdigest()
        assert r["crc32_lit"] == zlib.crc32(b"travel-data")


def test_url_parse_codec_suite(spark, events_pdf):
    from urllib.parse import quote_plus, unquote_plus

    out = _run(spark, "url_parse_codec_suite").set_index("event_id")
    ev = events_pdf[events_pdf.event_id < 60].set_index("event_id")
    assert len(out) == len(ev)
    for eid, r in out.iterrows():
        et, uid = ev.loc[eid, "event_type"], ev.loc[eid, "user_id"]
        assert r["proto"] == "https"
        assert r["host"] == "api.example.com"
        assert r["path"] == f"/v1/{et}/{uid}"
        assert r["qy"] == f"uid={uid}&etype={et}"
        assert r["frag"] == f"s{eid % 3}"
        assert r["uid_parm"] == str(uid)
        raw = f"q={et} {uid}"
        assert r["enc"] == quote_plus(raw)  # Java URLEncoder == urllib
        assert r["dec_rt"] == unquote_plus(r["enc"]) == raw


def test_xml_extract_suite(spark):
    out = _run(spark, "xml_extract_suite").set_index("o_orderkey")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders = orders[orders.o_orderkey < 40].set_index("o_orderkey")
    assert len(out) == len(orders)
    for k, r in out.iterrows():
        assert r["xf_flag"] == r["xp_flag"] == orders.loc[k, "o_orderstatus"]
        assert r["xf_id"] == r["xp_id"] == k
        assert r["xf_pr"] == r["xp_pr"] == orders.loc[k, "o_orderpriority"]
        assert r["qs"] == f"{k % 5},{k % 7}"


def test_str_to_map_null_suite(spark, events_pdf):
    out = _run(spark, "str_to_map_null_suite").set_index("event_id")
    ev = events_pdf[events_pdf.event_id < 80].set_index("event_id")
    assert len(out) == len(ev)
    for eid, r in out.iterrows():
        et = ev.loc[eid, "event_type"]
        assert r["ma"] == str(eid % 7)
        assert r["mb"] == eid % 5
        assert r["mc"] == et
        assert pd.isna(r["miss"])
        assert r["n_keys"] == 3 and r["ks"] == "a|b|c"
        if et == "click":
            assert pd.isna(r["nullif_ct"])
            assert r["nvl2_ct"] == "click" and r["eqn"]
        else:
            assert r["nullif_ct"] == et
            assert r["nvl2_ct"] == "other" and not r["eqn"]
        if eid % 2 == 0:
            assert r["nanvl_v"] == -1.0  # injected NaN replaced
        else:
            assert r["nanvl_v"] == ev.loc[eid, "value"]


def test_tz_convert_suite(spark):
    from datetime import datetime, timedelta
    from zoneinfo import ZoneInfo

    out = _run(spark, "tz_convert_suite").set_index("event_id")
    assert len(out) == 8
    utc, ny = ZoneInfo("UTC"), ZoneInfo("America/New_York")
    tokyo = ZoneInfo("Asia/Tokyo")
    spr0 = datetime(2024, 3, 10, 4, 30, tzinfo=utc)
    fal0 = datetime(2024, 11, 3, 3, 30, tzinfo=utc)
    fmt = "%Y-%m-%d %H:%M:%S"
    for eid, r in out.iterrows():
        spr = spr0 + timedelta(hours=int(eid))
        fal = fal0 + timedelta(hours=int(eid))
        assert r["ny_spring"] == spr.astimezone(ny).strftime(fmt)
        assert r["ny_fall"] == fal.astimezone(ny).strftime(fmt)
        assert r["tokyo"] == spr.astimezone(tokyo).strftime(fmt)
        assert r["back_utc"] == spr.strftime(fmt)
        off = spr.astimezone(ny).utcoffset()
        assert r["off_min_spring"] == off.total_seconds() / 60
        assert r["off_min_fall"] == (
            fal.astimezone(ny).utcoffset().total_seconds() / 60)
    # the suite genuinely spans both DST edges
    assert set(out["off_min_spring"]) == {-300, -240}
    assert set(out["off_min_fall"]) == {-240, -300}


def test_bitmap_exact_distinct(spark, events_pdf):
    out = _run(spark, "bitmap_exact_distinct")
    ref = events_pdf.groupby("event_type")["user_id"].nunique()
    got = out.set_index("event_type")
    assert got["n_exact"].to_dict() == ref.to_dict()
    # bitmaps are exact bitsets: both paths EQUAL the exact count
    assert (got["n_bitmap"] == got["n_exact"]).all()
    assert (got["n_merged"] == got["n_exact"]).all()


def test_observe_metrics_audit(spark):
    out = _run(spark, "observe_metrics_audit")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_rows"] == len(orders)
    assert r["sum_price"] == float(
        round(orders["o_totalprice"].round(2).sum(), 2))
    assert r["min_price"] == orders["o_totalprice"].min()
    assert r["max_price"] == orders["o_totalprice"].max()
    assert r["n_open"] == (orders["o_orderstatus"] == "O").sum()


def test_stratified_sample_audit(spark, events_pdf):
    out = _run(spark, "stratified_sample_audit")
    ref = events_pdf.groupby("event_type").size()
    got = out.set_index("event_type")
    assert got["n_stratum"].to_dict() == ref.to_dict()
    assert got["frac_within_6sigma"].all()
    fr = {"click": 0.5, "view": 0.25, "purchase": 0.75,
          "signup": 0.1, "error": 0.9}
    assert got["target_frac"].to_dict() == fr


def test_approx_percentile_certified_rank_band(spark):
    # round-14 fix: at sf0.001 the 2-HIGH group's approx p50 is a
    # data value whose neighbors straddle >1% of the interpolated
    # exact — the rank-band arm of the certification must admit it
    # (the sketch is rank-exact at n << accuracy).
    out = _run(spark, "approx_percentile_certified")
    assert len(out) == 5
    assert out["p50_within_1pct"].all()
    assert out["p95_within_1pct"].all()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    import numpy as np
    for pri, grp in orders.groupby("o_orderpriority"):
        row = out[out.o_orderpriority == pri].iloc[0]
        assert abs(row["exact_p50"]
                   - round(np.percentile(grp.o_totalprice, 50), 4)) < 1e-6
        assert abs(row["exact_p95"]
                   - round(np.percentile(grp.o_totalprice, 95), 4)) < 1e-6
