"""Round-13 query-semantics tests for queries_round18.py.

Every test cross-checks a registered query against an INDEPENDENT
pure-numpy/pandas/python reference computed from the same parquet
(not the DuckDB oracle — that parity is the driver's job; these pin
the MATH), or asserts structural invariants the statistic must
satisfy.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _daily(pdf_events):
    ts = pd.to_datetime(pdf_events["ts"])
    day = (ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    return day.value_counts().sort_index()


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ")
            if t]


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def orders_pdf():
    return pd.read_parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def customer_pdf():
    return pd.read_parquet(f"{SF}/customer.parquet")


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def rev_pdf(orders_pdf, customer_pdf):
    # per-customer revenue at cents precision (the DECIMAL(18,2) sum)
    cents = (orders_pdf["o_totalprice"] * 100).round().astype("int64")
    df = orders_pdf.assign(cents=cents).groupby("o_custkey", as_index=False)[
        "cents"].sum()
    df = df.merge(customer_pdf[["c_custkey", "c_nationkey"]],
                  left_on="o_custkey", right_on="c_custkey")
    df["r"] = df["cents"] / 100.0
    return df


def _run(spark, name):
    import __spark_entry__ as E

    return E.queries()[name](spark, SF).toPandas()


# --- Batch A: inequality ---------------------------------------------------

def test_theil_matches_numpy(spark, rev_pdf):
    out = _run(spark, "theil_t_nation_decomposition").iloc[0]
    r = rev_pdf["r"].to_numpy()
    n, mu = len(r), r.mean()
    total = float(np.mean(r / mu * np.log(r / mu)))
    g = rev_pdf.groupby("c_nationkey")["r"]
    sg, ng = g.sum(), g.count()
    s = r.sum()
    between = float(((sg / s) * np.log((sg / ng) / mu)).sum())
    assert out["n_customers"] == n
    assert abs(out["theil_total"] - total) < 1e-5
    assert abs(out["theil_between"] - between) < 1e-5
    # exact decomposition: within + between = total
    assert abs(out["theil_within"] + out["theil_between"]
               - out["theil_total"]) < 1e-5


def test_atkinson_matches_numpy(spark, rev_pdf):
    out = _run(spark, "atkinson_index_revenue").iloc[0]
    r = rev_pdf["r"].to_numpy()
    mu = r.mean()
    a_half = 1.0 - np.mean(np.sqrt(r)) ** 2 / mu
    a_one = 1.0 - math.exp(np.mean(np.log(r))) / mu
    assert abs(out["atkinson_half"] - a_half) < 1e-5
    assert abs(out["atkinson_one"] - a_one) < 1e-5
    assert 0.0 <= out["atkinson_half"] <= out["atkinson_one"] <= 1.0


def test_lorenz_deciles_match_numpy(spark, rev_pdf):
    out = _run(spark, "lorenz_curve_deciles")
    df = rev_pdf.sort_values(["r", "o_custkey"]).reset_index(drop=True)
    n = len(df)
    dec = (np.arange(n) * 10) // n
    sd = df.groupby(dec)["cents"].sum()
    shares = sd.cumsum() / sd.sum()
    assert len(out) == 10
    assert out["cum_revenue_share"].iloc[-1] == pytest.approx(1.0)
    for i in range(10):
        assert out["cum_revenue_share"].iloc[i] == pytest.approx(
            shares.iloc[i], abs=1e-6)
    # monotone increasing
    assert out["cum_revenue_share"].is_monotonic_increasing


def test_palma_matches_numpy(spark, rev_pdf):
    out = _run(spark, "palma_ratio_revenue").iloc[0]
    df = rev_pdf.sort_values(["r", "o_custkey"]).reset_index(drop=True)
    n = len(df)
    i = np.arange(1, n + 1)
    s = df["cents"].sum()
    b40 = df["cents"][i * 10 <= 4 * n].sum()
    t10 = df["cents"][i > n - n // 10].sum()
    assert out["share_bottom40"] == pytest.approx(b40 / s, abs=1e-6)
    assert out["share_top10"] == pytest.approx(t10 / s, abs=1e-6)
    assert out["palma_ratio"] == pytest.approx(t10 / b40, abs=1e-5)


# --- Batch B: GOF / robust -------------------------------------------------

def test_chisq_weekday_matches_numpy(spark, events_pdf):
    out = _run(spark, "chisq_gof_weekday").iloc[0]
    daily = _daily(events_pdf)
    dows = daily.groupby(daily.index % 7).sum()
    n = dows.sum()
    e = n / 7.0
    chi2 = float(((dows - e) ** 2 / e).sum())
    assert out["n_events"] == n
    assert out["df"] == 6
    assert out["chi2"] == pytest.approx(chi2, abs=1e-4)


def test_ks_logistic_matches_numpy(spark, events_pdf):
    out = _run(spark, "ks_logistic_daily").iloc[0]
    x = np.sort(_daily(events_pdf).to_numpy(dtype=float))
    n = len(x)
    mu = x.mean()
    sd = math.sqrt(((x - mu) ** 2).sum() / n)
    sc = sd * math.sqrt(3.0) / math.pi
    cdf = 1.0 / (1.0 + np.exp(-(x - mu) / sc))
    hi = np.abs(np.arange(1, n + 1) / n - cdf)
    lo = np.abs(np.arange(0, n) / n - cdf)
    d = max(hi.max(), lo.max())
    assert out["n_days"] == n
    assert out["mu"] == pytest.approx(mu, abs=1e-5)
    assert out["scale"] == pytest.approx(sc, abs=1e-5)
    assert out["ks_d"] == pytest.approx(d, abs=1e-6)


def test_hodges_lehmann_matches_numpy(spark, events_pdf):
    out = _run(spark, "hodges_lehmann_daily").iloc[0]
    x = _daily(events_pdf).to_numpy()
    walsh = [(x[i] + x[j]) / 2.0 for i in range(len(x))
             for j in range(i, len(x))]
    assert out["n_pairs"] == len(walsh)
    assert out["hl_estimate"] == pytest.approx(
        float(np.median(walsh)), abs=1e-9)


def _dual_rank_median(sorted_vals: np.ndarray) -> float:
    n = len(sorted_vals)
    lo = sorted_vals[(n + 1) // 2 - 1]
    hi = sorted_vals[(n + 2) // 2 - 1]
    return (lo + hi) / 2.0


def test_biweight_matches_numpy(spark, events_pdf):
    out = _run(spark, "biweight_midvariance_daily").iloc[0]
    x = np.sort(_daily(events_pdf).to_numpy(dtype=float))
    n = len(x)
    med = _dual_rank_median(x)
    mad = _dual_rank_median(np.sort(np.abs(x - med)))
    assert out["median"] == pytest.approx(med)
    assert out["mad"] == pytest.approx(mad)
    u = (x - med) / (9.0 * mad)
    m = np.abs(u) < 1
    num = n * ((x[m] - med) ** 2 * (1 - u[m] ** 2) ** 4).sum()
    den = ((1 - u[m] ** 2) * (1 - 5 * u[m] ** 2))[np.argsort(x[m])].sum()
    assert out["biweight_midvar"] == pytest.approx(
        num / den ** 2, rel=1e-6)


def test_quartile_skew_matches_numpy(spark, events_pdf):
    out = _run(spark, "quartile_skew_daily").iloc[0]
    x = np.sort(_daily(events_pdf).to_numpy(dtype=float))
    n = len(x)

    def q(k):
        r1 = (k * n + 3) // 4
        r2 = min(k * n // 4 + 1, n)
        return (x[r1 - 1] + x[r2 - 1]) / 2.0

    q1, q2, q3 = q(1), q(2), q(3)
    assert out["q1"] == pytest.approx(q1)
    assert out["q2"] == pytest.approx(q2)
    assert out["q3"] == pytest.approx(q3)
    if q3 != q1:
        assert out["bowley_skew"] == pytest.approx(
            (q3 + q1 - 2 * q2) / (q3 - q1), abs=1e-6)


def test_runs_up_down_matches_numpy(spark, events_pdf):
    out = _run(spark, "runs_up_down_daily").iloc[0]
    x = _daily(events_pdf).to_numpy()
    d = np.diff(x)
    s = np.sign(d[d != 0])
    runs = 1 + int((s[1:] != s[:-1]).sum()) if len(s) else 0
    nobs = len(s) + 1
    assert out["n_obs"] == nobs
    assert out["n_runs"] == runs
    e = (2 * nobs - 1) / 3.0
    v = (16 * nobs - 29) / 90.0
    assert out["z"] == pytest.approx((runs - e) / math.sqrt(v), abs=1e-6)


# --- Batch C: forecast eval ------------------------------------------------

def test_theta_matches_numpy(spark, events_pdf):
    out = _run(spark, "theta_method_forecast")
    daily = _daily(events_pdf)
    t = daily.index.to_numpy(dtype=float)
    y = daily.to_numpy(dtype=float)
    n = len(y)
    b = (n * (t * y).sum() - t.sum() * y.sum()) \
        / (n * (t * t).sum() - t.sum() ** 2)
    a = (y.sum() - b * t.sum()) / n
    v = 2 * y - (a + b * t)
    l = v[0]
    for x in v[1:]:
        l = 0.3 * x + 0.7 * l
    assert len(out) == 7
    for h in range(1, 8):
        want = 0.5 * l + 0.5 * (a + b * (t[-1] + h))
        assert out.iloc[h - 1]["forecast"] == pytest.approx(
            want, abs=1e-5)


def test_mase_matches_numpy(spark, events_pdf):
    out = _run(spark, "mase_seasonal_naive").iloc[0]
    daily = _daily(events_pdf)
    s = daily.reindex(range(daily.index.min(), daily.index.max() + 1))

    def mae(k):
        pairs = [(daily[i], daily[i - k]) for i in daily.index
                 if i - k in daily.index]
        return (sum(abs(a - b) for a, b in pairs), len(pairs))

    e7, m7 = mae(7)
    e1, m1 = mae(1)
    assert out["m7"] == m7 and out["m1"] == m1
    assert out["mase"] == pytest.approx(
        (e7 / m7) / (e1 / m1), abs=1e-6)


def test_ma7_decomposition_matches_numpy(spark, events_pdf):
    out = _run(spark, "ma7_decomposition_daily")
    daily = _daily(events_pdf)
    y = daily.to_numpy(dtype=float)
    t = daily.index.to_numpy()
    rows = {}
    for i in range(3, len(y) - 3):
        w = y[i - 3:i + 4]
        rows.setdefault(t[i] % 7, []).append(y[i] - w.mean())
    for _, r in out.iterrows():
        assert r["seasonal_idx"] == pytest.approx(
            float(np.mean(rows[r["dow"]])), abs=1e-6)
        assert r["n_days"] == len(rows[r["dow"]])


def test_max_drawdown_matches_numpy(spark, events_pdf):
    out = _run(spark, "max_drawdown_daily").iloc[0]
    y = _daily(events_pdf).to_numpy(dtype=float)
    c = np.cumsum(y - y.mean())
    dd = np.maximum.accumulate(c) - c
    assert out["max_drawdown"] == pytest.approx(dd.max(), abs=1e-6)
    assert out["n_days"] == len(y)


# --- Batch D: IR / sketch --------------------------------------------------

def test_rbp_matches_numpy(spark, docs_pdf):
    out = _run(spark, "rbp_relevance_curve")
    top = docs_pdf.sort_values(["n_chars", "doc_id"],
                               ascending=[False, True]).head(50)
    rel = (top["lang"] == "en").to_numpy()
    for _, r in out.iterrows():
        p = r["p"]
        want = (1 - p) * sum(p ** i for i, v in enumerate(rel) if v)
        assert r["rbp"] == pytest.approx(want, abs=1e-6)
        assert r["n_rel"] == int(rel.sum())


def test_footrule_matches_pandas(spark, customer_pdf):
    out = _run(spark, "spearman_footrule_nations").iloc[0]
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    cents = (supp["s_acctbal"] * 100).round().astype("int64")
    r1 = (supp.assign(c=cents)
          .merge(nation, left_on="s_nationkey", right_on="n_nationkey")
          .groupby("n_name")["c"].sum()
          .reset_index()
          .sort_values(["c", "n_name"], ascending=[False, True]))
    r1["ra"] = range(1, len(r1) + 1)
    r2 = (customer_pdf
          .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
          .groupby("n_name").size().reset_index(name="nc")
          .sort_values(["nc", "n_name"], ascending=[False, True]))
    r2["rb"] = range(1, len(r2) + 1)
    j = r1.merge(r2, on="n_name")
    n = len(j)
    fr = int((j["ra"] - j["rb"]).abs().sum())
    assert out["n_nations"] == n
    assert out["footrule"] == fr
    assert out["footrule_norm"] == pytest.approx(
        fr / (n * n // 2), abs=1e-6)


def test_ddsketch_honors_error_bound(spark, orders_pdf):
    out = _run(spark, "ddsketch_quantiles")
    x = np.sort(orders_pdf["o_totalprice"].to_numpy())
    n = len(x)
    gamma = 1.02
    bound = (gamma - 1) / (gamma + 1)
    for _, r in out.iterrows():
        exact = x[max(int(math.ceil(r["q"] * n)), 1) - 1]
        rel = abs(r["est"] - exact) / exact
        assert rel <= bound + 1e-9, (r["q"], r["est"], exact)
        assert r["rel_err_bound"] == pytest.approx(bound, abs=1e-6)
    assert out["est"].is_monotonic_increasing


# --- Batch E: SQL-surface suites -------------------------------------------

def test_map_hof_suite_matches_pandas(spark, events_pdf):
    out = _run(spark, "map_hof_suite")
    c = (events_pdf[events_pdf["user_id"] < 20]
         .groupby(["user_id", "event_type"]).size())
    c = c[c >= 2]
    assert len(out) == len(c)
    for (uid, et), cnt in c.items():
        row = out[(out["user_id"] == uid)
                  & (out["etype"] == et.upper())]
        assert len(row) == 1
        assert row.iloc[0]["cnt"] == cnt
        assert row.iloc[0]["cnt_scaled"] == cnt * 10


def test_tvf_explode_suite_structure(spark, customer_pdf):
    out = _run(spark, "tvf_explode_suite")
    assert set(out["src"]) == {"stack", "posexplode_outer", "inline"}
    # every nation contributes exactly 2 stack and 2 inline rows
    assert (out[out["src"] == "stack"].groupby("n_name").size()
            == 2).all()
    assert (out[out["src"] == "inline"].groupby("n_name").size()
            == 2).all()
    # posexplode_outer: ns=0 nations contribute one NULL row
    pe = out[out["src"] == "posexplode_outer"]
    for name, grp in pe.groupby("n_name"):
        if grp["k"].isna().all():
            assert len(grp) == 1


def test_bitwise_agg_matches_numpy(spark, customer_pdf):
    out = _run(spark, "bitwise_agg_suite")
    for _, r in out.iterrows():
        keys = customer_pdf[customer_pdf["c_nationkey"] == r["nk"]][
            "c_custkey"].to_numpy()
        assert r["band"] == np.bitwise_and.reduce(keys)
        assert r["bor"] == np.bitwise_or.reduce(keys)
        assert r["bxor"] == np.bitwise_xor.reduce(keys)
        assert r["popcount_sum"] == sum(int(k).bit_count() for k in keys)


def test_regexp_suite_matches_python(spark, docs_pdf):
    out = _run(spark, "regexp_surface_suite")
    for _, r in out.iterrows():
        texts = docs_pdf[docs_pdf["source"] == r["source"]]["text"]
        assert r["digit_runs"] == sum(
            len(re.findall(r"[0-9]+", t)) for t in texts)
        assert r["the_count"] == sum(
            len(re.findall(r"\bthe\b", t.lower())) for t in texts)
        assert r["vowels"] == sum(
            len(re.findall(r"[aeiouAEIOU]", t)) for t in texts)


def test_date_edge_suite_matches_pandas(spark, orders_pdf):
    out = _run(spark, "date_edge_suite").set_index("chk")["v"]
    d = pd.to_datetime(orders_pdf["o_orderdate"])
    clamped = (d + pd.DateOffset(months=1)).dt.day != d.dt.day
    assert out["month_end_clamp"] == int(clamped.sum())
    assert out["last_day_hits"] == int(
        (d.dt.date == (d + pd.offsets.MonthEnd(0)).dt.date).sum())
    iso = d - pd.to_timedelta(d.dt.dayofweek, unit="D")
    assert out["distinct_weeks"] == iso.dt.date.nunique()
    qs = d.dt.date == pd.PeriodIndex(d, freq="Q").start_time.date
    assert out["quarter_starts"] == int(qs.sum())


def test_boolean_agg_matches_pandas(spark, customer_pdf):
    out = _run(spark, "boolean_agg_suite")
    for _, r in out.iterrows():
        bal = customer_pdf[customer_pdf["c_mktsegment"]
                           == r["segment"]]["c_acctbal"]
        assert r["all_positive"] == bool((bal > 0).all())
        assert r["any_deep_negative"] == bool((bal < -900).any())
        assert r["n_positive"] == int((bal > 0).sum())
        assert r["n"] == len(bal)


# --- Batch F: text ops -----------------------------------------------------

def test_trigram_perplexity_matches_python(spark, docs_pdf):
    out = _run(spark, "trigram_lm_perplexity")
    from collections import Counter

    tris, doc_tris, vocab = Counter(), {}, set()
    for _, row in docs_pdf.iterrows():
        toks = _tokens(row["text"])
        vocab.update(toks)
        ts = [(toks[i], toks[i + 1], toks[i + 2])
              for i in range(len(toks) - 2)]
        doc_tris[row["doc_id"]] = ts
        tris.update(ts)
    bis = Counter()
    for (w1, w2, w3), c in tris.items():
        bis[(w1, w2)] += c
    v = len(vocab)
    scores = {}
    for did, ts in doc_tris.items():
        if not ts:
            continue
        lp = sum(math.log((tris[t] + 1.0) / (bis[t[:2]] + v))
                 for t in ts)
        scores[did] = (lp, math.exp(-lp / len(ts)))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert list(out["doc_id"]) == [d for d, _ in want]
    for i, (did, (lp, perp)) in enumerate(want):
        assert out.iloc[i]["perplexity"] == pytest.approx(perp, rel=1e-5)


def test_truncation_loss_matches_python(spark, docs_pdf):
    out = _run(spark, "truncation_loss_at_caps").set_index("cap")
    lens = docs_pdf["text"].map(lambda t: len(_tokens(t)))
    for cap in (64, 128, 256):
        lost = (lens - cap).clip(lower=0)
        assert out.loc[cap]["docs_truncated"] == int((lens > cap).sum())
        assert out.loc[cap]["tokens_lost"] == int(lost.sum())


def test_pii_density_matches_python(spark, docs_pdf):
    out = _run(spark, "pii_density_by_source")
    for _, r in out.iterrows():
        texts = docs_pdf[docs_pdf["source"] == r["source"]]["text"]
        em = sum(len(re.findall(r"[A-Za-z0-9._]+@[A-Za-z0-9.]+", t))
                 for t in texts)
        assert r["emails"] == em


def test_intra_doc_dup_matches_python(spark, docs_pdf):
    out = _run(spark, "intra_doc_dup_sentences")
    for _, r in out.iterrows():
        texts = docs_pdf[docs_pdf["source"] == r["source"]]["text"]
        n_sent = n_uniq = 0
        for t in texts:
            ss = [x.strip() for x in t.split(".") if x.strip()]
            n_sent += len(ss)
            n_uniq += len(set(ss))
        assert r["sentences"] == n_sent
        assert r["dup_sentences"] == n_sent - n_uniq


def test_char_trigram_signature_matches_python(spark, docs_pdf):
    out = _run(spark, "char_trigram_lang_signature")
    from collections import Counter

    counts = {}
    for _, row in docs_pdf.iterrows():
        norm = re.sub(r"\s+", " ", row["text"].lower()).strip()
        if len(norm) < 3:
            continue
        c = counts.setdefault(row["lang"], Counter())
        for i in range(len(norm) - 2):
            c[_md5_long(norm[i:i + 3]) % 64] += 1
    for lang, grp in out.groupby("lang"):
        want = sorted(counts[lang].items(),
                      key=lambda kv: (-kv[1], kv[0]))[:3]
        got = list(zip(grp.sort_values("rnk")["bucket"],
                       grp.sort_values("rnk")["cnt"]))
        assert got == want


def test_stopword_matrix_matches_python(spark, docs_pdf):
    from travel_data_pipeline_spark.operators.text import STOPWORDS

    out = _run(spark, "stopword_profile_matrix")
    toks_by_lang = {}
    for _, row in docs_pdf.iterrows():
        toks_by_lang.setdefault(row["lang"], []).extend(
            _tokens(row["text"]))
    for _, r in out.iterrows():
        toks = toks_by_lang[r["doc_lang"]]
        lst = set(STOPWORDS[r["list_lang"]])
        hits = sum(1 for t in toks if t in lst)
        assert r["hits"] == hits
        assert r["tokens"] == len(toks)
    # diagonal should dominate off-diagonal for each doc_lang (the
    # lang-id signal) — at least for en which has the largest corpus
    en = out[out["doc_lang"] == "en"].set_index("list_lang")
    assert en.loc["en"]["hit_ratio"] >= en["hit_ratio"].max() - 1e-9


# --- Batch G ---------------------------------------------------------------

def test_post_stratified_matches_python(spark, events_pdf):
    out = _run(spark, "post_stratified_mean")
    arm = events_pdf["user_id"].map(
        lambda u: _md5_long(str(u)) % 2)
    stratum = events_pdf["user_id"] % 4
    vc = np.floor(events_pdf["value"] * 100).astype("int64")
    df = pd.DataFrame({"arm": arm, "st": stratum, "vc": vc})
    ntot = len(df)
    for _, r in out.iterrows():
        sub = df[df["arm"] == r["arm"]]
        assert r["n"] == len(sub)
        assert r["raw_mean"] == pytest.approx(sub["vc"].mean(),
                                              abs=1e-5)
        ps = 0.0
        for s in sorted(df["st"].unique()):
            w = (df["st"] == s).sum() / ntot
            ps += w * sub[sub["st"] == s]["vc"].mean()
        assert r["post_strat_mean"] == pytest.approx(ps, abs=1e-5)


def test_haversine_matches_python(spark):
    out = _run(spark, "haversine_nation_pairs")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    coords = {}
    for name in nation["n_name"]:
        lat = (_md5_long(name) % 18000) / 100.0 - 90.0
        lon = (_md5_long(name + ":lon") % 36000) / 100.0 - 180.0
        coords[name] = (lat, lon)
    dists = []
    names = sorted(coords)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            la, loa = coords[a]
            lb, lob = coords[b]
            km = 2 * 6371 * math.asin(math.sqrt(
                math.sin(math.radians(lb - la) / 2) ** 2
                + math.cos(math.radians(la)) * math.cos(math.radians(lb))
                * math.sin(math.radians(lob - loa) / 2) ** 2))
            dists.append((km, a, b))
    dists.sort()
    for i, (km, a, b) in enumerate(dists[:10]):
        r = out.iloc[i]
        assert (r["nation_a"], r["nation_b"]) == (a, b)
        assert r["dist_km"] == pytest.approx(km, abs=1e-3)


def test_geo_grid_matches_python(spark, customer_pdf):
    out = _run(spark, "geo_grid_cell_join")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    from collections import Counter

    cc, sc = Counter(), Counter()
    for k in customer_pdf["c_custkey"]:
        cc[(_md5_long(f"lat:{k}") % 180 - 90,
            _md5_long(f"lon:{k}") % 360 - 180)] += 1
    for k in supp["s_suppkey"]:
        sc[(_md5_long(f"lat:{k}") % 180 - 90,
            _md5_long(f"lon:{k}") % 360 - 180)] += 1
    pairs = sorted(((cc[c] * sc[c], c) for c in cc if c in sc),
                   key=lambda kv: (-kv[0], kv[1]))
    for i in range(min(10, len(pairs))):
        r = out.iloc[i]
        assert (r["cell_lat"], r["cell_lon"]) == pairs[i][1]
        assert r["n_pairs"] == pairs[i][0]


def test_benford_second_digit_matches_python(spark, orders_pdf):
    out = _run(spark, "benford_second_digit")
    from collections import Counter

    c = Counter()
    for p in orders_pdf["o_totalprice"]:
        if p >= 10:
            c[int(str(int(math.floor(p)))[1])] += 1
    total = sum(c.values())
    for _, r in out.iterrows():
        assert r["n"] == c[r["d"]]
        p = sum(math.log10(1 + 1 / (10 * k + r["d"]))
                for k in range(1, 10))
        assert r["benford_share"] == pytest.approx(p, abs=1e-6)
        assert r["observed_share"] == pytest.approx(
            c[r["d"]] / total, abs=1e-6)


def test_sla_percentiles_match_numpy(spark, orders_pdf):
    out = _run(spark, "sla_lag_percentiles")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    j = li.merge(orders_pdf, left_on="l_orderkey", right_on="o_orderkey")
    lag = (pd.to_datetime(j["l_shipdate"]).dt.floor("D")
           - pd.to_datetime(j["o_orderdate"]).dt.floor("D")).dt.days
    for _, r in out.iterrows():
        lg = np.sort(lag[j["o_orderpriority"] == r["priority"]]
                     .to_numpy())
        n = len(lg)
        for k, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            assert r[col] == lg[(k * n + 99) // 100 - 1]


def test_ewma_chart_matches_numpy(spark, events_pdf):
    out = _run(spark, "ewma_control_chart_daily")
    y = _daily(events_pdf).to_numpy(dtype=float)
    n = len(y)
    mu = y.mean()
    sd = math.sqrt(((y - mu) ** 2).sum() / n)
    l = y[0]
    path = [l]
    for x in y[1:]:
        l = 0.2 * x + 0.8 * l
        path.append(l)
    assert len(out) == min(14, n)
    for j, (_, r) in enumerate(out.iterrows()):
        i = n - len(out) + j + 1
        assert r["ewma"] == pytest.approx(path[i - 1], abs=2e-6)
        half = 3 * sd * math.sqrt(0.2 / 1.8 * (1 - 0.64 ** i))
        assert r["ucl"] == pytest.approx(mu + half, abs=1e-5)
        assert r["lcl"] == pytest.approx(mu - half, abs=1e-5)
        assert bool(r["breach"]) == (r["ewma"] > r["ucl"]
                                     or r["ewma"] < r["lcl"])


# --- Batch H ---------------------------------------------------------------

def _copurchase_edges(sf=SF):
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    items = items.sort_values(["l_orderkey", "l_partkey"])
    items["rn"] = items.groupby("l_orderkey").cumcount()
    items = items[items["rn"] < 64]
    from collections import Counter

    pc = Counter()
    for _, grp in items.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"])
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pc[(a, b)] += 1
    return {e for e, c in pc.items() if c >= 2}


def test_local_clustering_matches_python(spark):
    out = _run(spark, "local_clustering_topnodes")
    edges = _copurchase_edges()
    from collections import Counter, defaultdict

    deg = Counter()
    adj = defaultdict(set)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
        adj[a].add(b)
        adj[b].add(a)
    top = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for _, r in out.iterrows():
        d = deg[r["node"]]
        assert r["degree"] == d
        nbs = sorted(adj[r["node"]])[:128]
        tri = sum(1 for i, u in enumerate(nbs) for v in nbs[i + 1:]
                  if (u, v) in edges)
        assert r["triangles"] == tri
        dc = min(d, 128)
        if dc >= 2:
            assert r["clustering_coeff"] == pytest.approx(
                2 * tri / (dc * (dc - 1)), abs=1e-6)
    assert set(out["node"]) == {n for n, _ in top}


def test_shingle_rarity_matches_python(spark, docs_pdf):
    out = _run(spark, "shingle_rarity_scores")
    from collections import Counter

    doc_sh = {}
    df = Counter()
    for _, row in docs_pdf.iterrows():
        toks = _tokens(row["text"])
        sh = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        doc_sh[row["doc_id"]] = sh
        df.update(set(sh))
    n = len(docs_pdf)
    scores = {}
    for did, sh in doc_sh.items():
        if sh:
            scores[did] = sum(math.log(n / df[g]) for g in sh) / len(sh)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(out["doc_id"]) == [d for d, _ in want]
    for i, (_, mi) in enumerate(want):
        assert out.iloc[i]["mean_idf"] == pytest.approx(mi, rel=1e-6)


def test_adamic_adar_bloom_arm_bit_equal(spark):
    """VERDICT r12 #5: the Bloom-prefiltered anti-join must be
    row-identical to the plain anti-join (no false negatives by
    construction; false positives drop in the real anti-join)."""
    from travel_data_pipeline_spark.queries_affinity import (
        _order_items,
        _pair_counts,
    )
    from travel_data_pipeline_spark.queries_round16 import (
        adamic_adar_from_edges,
    )

    edges = (_pair_counts(_order_items(spark, SF))
             .select("part_a", "part_b"))
    plain = sorted(map(tuple, adamic_adar_from_edges(
        spark, edges, anti_join_bloom=False).collect()))
    bloom = sorted(map(tuple, adamic_adar_from_edges(
        spark, edges, anti_join_bloom=True).collect()))
    assert plain == bloom
    assert len(plain) > 0


def test_odds_ratio_matches_python(spark, events_pdf):
    out = _run(spark, "odds_ratio_arms").iloc[0]
    conv = (events_pdf.assign(
        arm=events_pdf["user_id"].map(lambda u: _md5_long(str(u)) % 2),
        c=(events_pdf["event_type"] == "purchase").astype(int))
        .groupby(["arm", "user_id"])["c"].max())
    a = int(((conv.index.get_level_values(0) == 1) & (conv == 1)).sum())
    b = int(((conv.index.get_level_values(0) == 1) & (conv == 0)).sum())
    c = int(((conv.index.get_level_values(0) == 0) & (conv == 1)).sum())
    d = int(((conv.index.get_level_values(0) == 0) & (conv == 0)).sum())
    assert (out["a"], out["b"], out["c"], out["d"]) == (a, b, c, d)
    orr = ((a + .5) * (d + .5)) / ((b + .5) * (c + .5))
    se = math.sqrt(1 / (a + .5) + 1 / (b + .5)
                   + 1 / (c + .5) + 1 / (d + .5))
    assert out["odds_ratio"] == pytest.approx(orr, rel=1e-6)
    assert out["or_lo"] == pytest.approx(orr * math.exp(-1.96 * se),
                                         abs=1e-6)
    assert out["or_hi"] == pytest.approx(orr * math.exp(1.96 * se),
                                         abs=1e-6)


def test_tail_dependence_matches_numpy(spark, events_pdf):
    out = _run(spark, "tail_dependence_daily").iloc[0]
    daily = _daily(events_pdf)
    x = np.sort(daily.to_numpy())
    n = len(x)
    thr = x[(90 * n + 99) // 100 - 1]
    assert out["q90_threshold"] == thr
    pairs = [(daily[t], daily[t + 1]) for t in daily.index
             if t + 1 in daily.index]
    n_x_hi = sum(1 for a, _ in pairs if a > thr)
    n_both = sum(1 for a, b in pairs if a > thr and b > thr)
    assert out["n_pairs"] == len(pairs)
    assert out["n_x_hi"] == n_x_hi
    assert out["n_both_hi"] == n_both
    if n_x_hi:
        assert out["lambda_upper"] == pytest.approx(
            n_both / n_x_hi, abs=1e-6)


def test_ntile_cume_dist_matches_pandas(spark, orders_pdf):
    out = _run(spark, "ntile_cume_dist_suite")
    sub = orders_pdf[orders_pdf["o_custkey"] < 20]
    for ck, grp in sub.groupby("o_custkey"):
        g = grp.sort_values(["o_totalprice", "o_orderkey"]).reset_index()
        n = len(g)
        for i, row in g.iterrows():
            r = out[(out["o_custkey"] == ck)
                    & (out["o_orderkey"] == row["o_orderkey"])].iloc[0]
            # ntile: first n % 4 buckets get ceil(n/4) rows
            q, rem = divmod(n, 4)
            bucket = (i // (q + 1) + 1 if i < (q + 1) * rem
                      else rem + (i - (q + 1) * rem) // q + 1) \
                if q else i + 1
            assert r["price_quartile"] == bucket
            assert r["cume_dist_v"] == pytest.approx((i + 1) / n,
                                                     abs=1e-6)
            if n > 1:
                assert r["percent_rank_v"] == pytest.approx(
                    i / (n - 1), abs=1e-6)


def test_decimal_suite_matches_pandas(spark, orders_pdf):
    out = _run(spark, "decimal_arithmetic_suite")
    cents = (orders_pdf["o_totalprice"] * 100).round().astype("int64")
    df = orders_pdf.assign(cents=cents)
    for _, r in out.iterrows():
        g = df[df["o_orderpriority"] == r["priority"]]
        s = int(g["cents"].sum())
        assert r["sum_price"] == s / 100.0
        assert r["sum_doubled"] == 2 * s / 100.0
        # 7% tax at 4dp: each term is cents*7 integer in 1e-4 units
        assert r["sum_tax"] == int((g["cents"] * 7).sum()) / 10000.0
        assert r["n"] == len(g)


def test_string_agg_matches_pandas(spark):
    out = _run(spark, "string_agg_ordered_suite")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    j = supp.merge(nation, left_on="s_nationkey",
                   right_on="n_nationkey")
    for name, grp in j.groupby("n_name"):
        want = ",".join(sorted(grp["s_name"]))
        r = out[out["n_name"] == name].iloc[0]
        assert r["suppliers_csv"] == want
        assert r["csv_len"] == len(want)
        assert r["n_suppliers"] == len(grp)


def test_lognormal_fit_matches_numpy(spark, docs_pdf):
    out = _run(spark, "lognormal_doclen_fit").iloc[0]
    lens = docs_pdf["text"].map(lambda t: len(_tokens(t)))
    ln = np.log(lens[lens > 0].to_numpy(dtype=float))
    mu = ln.mean()
    sigma = math.sqrt(((ln - mu) ** 2).sum() / len(ln))
    assert out["n_docs"] == len(ln)
    assert out["mu_log"] == pytest.approx(mu, abs=1e-5)
    assert out["sigma_log"] == pytest.approx(sigma, abs=1e-5)
    assert out["median_len"] == pytest.approx(math.exp(mu), abs=1e-3)
