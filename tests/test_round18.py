"""Round-12 query-semantics tests for queries_round17.py.

Every test cross-checks a registered query against an INDEPENDENT
pure-numpy/pandas reference computed from the same parquet (not the
DuckDB oracle — that parity is the driver's job; these pin the MATH),
or asserts structural invariants the statistic must satisfy.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _daily(pdf_events):
    ts = pd.to_datetime(pdf_events["ts"])
    day = (ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    return day.value_counts().sort_index()


@pytest.fixture(scope="module")
def events_pdf():
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def orders_pdf():
    return pd.read_parquet(f"{SF}/orders.parquet")


def _run(spark, name):
    import __spark_entry__ as E

    return E.queries()[name](spark, SF).toPandas()


def test_kpss_matches_numpy(spark, events_pdf):
    out = _run(spark, "kpss_stationarity").iloc[0]
    x = _daily(events_pdf).to_numpy(dtype=float)
    n = len(x)
    e = x - x.mean()
    s = np.cumsum(e)
    lag = 3
    g = [float((e[: n - j] * e[j:]).sum()) / n for j in range(lag + 1)]
    s2 = g[0] + 2.0 * sum((1 - j / (lag + 1)) * g[j]
                          for j in range(1, lag + 1))
    eta = (s ** 2).sum() / n ** 2 / s2
    assert out["n_days"] == n
    assert abs(out["s2_lrv"] - s2) < 1e-4 * max(1.0, abs(s2))
    assert abs(out["kpss_eta"] - eta) < 1e-5


def test_adf_matches_numpy(spark, events_pdf):
    out = _run(spark, "adf_unit_root").iloc[0]
    x = _daily(events_pdf).to_numpy(dtype=float)
    z, y = x[:-1], np.diff(x)
    m = len(z)
    X = np.column_stack([np.ones(m), z])
    beta, res, *_ = np.linalg.lstsq(X, y, rcond=None)
    rss = float(((y - X @ beta) ** 2).sum())
    se = math.sqrt((rss / (m - 2)) / float(((z - z.mean()) ** 2).sum()))
    assert out["n_diffs"] == m
    assert abs(out["rho_hat"] - beta[1]) < 1e-5
    assert abs(out["alpha_hat"] - beta[0]) < 1e-3 * max(1, abs(beta[0]))
    assert abs(out["df_t"] - beta[1] / se) < 1e-4


def test_granger_matches_numpy(spark, events_pdf):
    out = _run(spark, "granger_views_purchases").iloc[0]
    ts = pd.to_datetime(events_pdf["ts"])
    day = (ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    df = pd.DataFrame({"day": day, "t": events_pdf["event_type"]})
    v = df[df.t == "view"].day.value_counts().sort_index()
    p = df[df.t == "purchase"].day.value_counts().sort_index()
    rows = []
    for t in p.index:
        if (t - 1) in p.index and (t - 1) in v.index:
            rows.append((p[t], p[t - 1], v[t - 1]))
    y, u, w = (np.array(c, dtype=float) for c in zip(*rows))
    m = len(y)
    Xr = np.column_stack([np.ones(m), u])
    br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
    rss_r = float(((y - Xr @ br) ** 2).sum())
    Xu = np.column_stack([np.ones(m), u, w])
    bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
    rss_u = float(((y - Xu @ bu) ** 2).sum())
    f = (rss_r - rss_u) / (rss_u / (m - 3))
    assert out["n_obs"] == m
    assert abs(out["ar1_coef"] - br[1]) < 1e-5
    assert abs(out["lag_p_coef"] - bu[1]) < 1e-5
    assert abs(out["lag_v_coef"] - bu[2]) < 1e-5
    assert abs(out["granger_f"] - f) < 1e-3


def test_pacf_lag1_equals_acf_and_numpy(spark, events_pdf):
    out = _run(spark, "pacf_durbin_levinson").set_index("lag")
    # phi_11 == r_1 by construction
    assert out.loc[1, "acf"] == out.loc[1, "pacf"]
    x = _daily(events_pdf).to_numpy(dtype=float)
    n = len(x)
    e = x - x.mean()
    g = [float((e[: n - j] * e[j:]).sum()) for j in range(5)]
    r = [g[j] / g[0] for j in range(1, 5)]
    # Durbin-Levinson reference
    phi = {(1, 1): r[0]}
    for k in range(2, 5):
        num = r[k - 1] - sum(phi[(k - 1, j)] * r[k - 1 - j]
                             for j in range(1, k))
        den = 1 - sum(phi[(k - 1, j)] * r[j - 1] for j in range(1, k))
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1,
                                                               k - j)]
    for k in range(1, 5):
        assert abs(out.loc[k, "acf"] - r[k - 1]) < 1e-5
        assert abs(out.loc[k, "pacf"] - phi[(k, k)]) < 1e-5


def test_binseg_matches_numpy(spark, events_pdf):
    out = _run(spark, "binseg_double_changepoint")
    x = _daily(events_pdf).to_numpy(dtype=float)
    n = len(x)

    def cost(seg):
        return float((seg ** 2).sum() - seg.sum() ** 2 / len(seg))

    gains = [cost(x) - cost(x[: t]) - cost(x[t:])
             for t in range(1, n)]
    t1 = int(np.argmax(gains)) + 1
    root = out[out.depth == 1].iloc[0]
    assert root["split_rn"] == t1
    assert abs(root["gain"] - gains[t1 - 1]) < 1e-4
    # children partition the root segment
    left = out[out.depth == 2].iloc[0]
    right = out[out.depth == 3].iloc[0]
    assert left["seg_lo"] == 1 and left["seg_hi"] == t1
    assert right["seg_lo"] == t1 + 1 and right["seg_hi"] == n
    # every reported gain is a nonneg SSE reduction
    assert (out["gain"].dropna() >= -1e-9).all()


def test_spc_rules_consistent(spark, events_pdf):
    out = _run(spark, "spc_western_electric").sort_values("t")
    x = _daily(events_pdf)
    mu, sig = x.mean(), x.std(ddof=0)
    z_ref = (x - mu) / sig
    assert np.allclose(out["z"].to_numpy(),
                       z_ref.to_numpy(), atol=1.5e-6)
    # R1 definition and implication chain on the flags
    assert ((out["z"].abs() > 3) == out["r1"]).all()
    zs = out["z"].to_numpy()
    r4 = out["r4"].to_numpy()
    for i in range(len(zs)):
        if r4[i]:
            w = zs[max(0, i - 7): i + 1]
            assert len(w) == 8 and ((w > 0).all() or (w < 0).all())


def test_mood_median_matches_pandas(spark, orders_pdf):
    out = _run(spark, "mood_median_arms")
    import hashlib

    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    # lower median via cum counts
    v = np.sort(yc.to_numpy())
    med = v[(len(v) + 1) // 2 - 1]
    assert (out["pooled_median_cents"] == med).all()

    def arm(ck):
        h = hashlib.md5(f"r17:{ck}".encode()).hexdigest()
        return int(h[:15], 16) % 4

    arms = orders_pdf["o_custkey"].map(arm)
    for _, row in out.iterrows():
        mask = arms == row["arm"]
        assert row["n_arm"] == int(mask.sum())
        assert row["n_above"] == int((yc[mask] > med).sum())


def test_cvm_matches_numpy(spark, orders_pdf):
    out = _run(spark, "cvm_two_sample").iloc[0]
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    grp = orders_pdf["o_custkey"].map(_arm_of("r17b:", 2))
    a = np.sort(yc[grp == 0].to_numpy())
    b = np.sort(yc[grp == 1].to_numpy())
    n, m = len(a), len(b)
    vals, l = np.unique(yc, return_counts=True)
    fa = np.searchsorted(a, vals, side="right") / n
    fb = np.searchsorted(b, vals, side="right") / m
    t = n * m / (n + m) ** 2 * (l * (fa - fb) ** 2).sum()
    assert out["n_group0"] == n and out["n_group1"] == m
    assert abs(out["cvm_t"] - t) < 1e-6
    assert out["cvm_t"] >= 0.0


def test_ansari_bradley_z_reasonable(spark, orders_pdf):
    out = _run(spark, "ansari_bradley_arms").iloc[0]
    n = out["n_group0"] + out["n_group1"]
    assert n == len(orders_pdf)
    # AB statistic lies within the possible score range
    max_score = (n + 1) / 2.0
    assert 0 < out["ab_stat"] <= out["n_group0"] * max_score
    assert out["ab_var"] > 0
    # a null-ish md5 split should not be wildly significant
    assert abs(out["ab_z"]) < 6


def test_ad_ksample_matches_python(spark, orders_pdf):
    out = _run(spark, "ad_ksample_arms").iloc[0]
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    v = (yc // 10_000).to_numpy()
    arms = orders_pdf["o_custkey"].map(_arm_of("r17:", 4)).to_numpy()
    vals = np.unique(v)
    N = len(v)
    total = 0.0
    for i in range(4):
        vi = v[arms == i]
        ni = len(vi)
        inner = 0.0
        for val in vals:
            lj = int((v == val).sum())
            B = int((v <= val).sum())
            Mi = int((vi <= val).sum())
            lij = int((vi == val).sum())
            Ba = B - lj / 2
            Ma = Mi - lij / 2
            den = Ba * (N - Ba) - N * lj / 4
            if den > 0:
                inner += lj / N * (N * Ma - ni * Ba) ** 2 / den
        total += inner / ni
    a2 = (N - 1) / N * total
    assert sum(out[f"n_arm{a}"] for a in range(4)) == N
    assert abs(out["ad_a2"] - a2) < 1e-4


def test_iv_wald_consistency(spark):
    out = _run(spark, "iv_wald_late")
    assert set(out["z"]) == {0, 1}
    r = out.iloc[0]
    g = out.set_index("z")
    itt = g.loc[1, "mean_y"] - g.loc[0, "mean_y"]
    fs = g.loc[1, "mean_d"] - g.loc[0, "mean_d"]
    assert abs(r["itt"] - itt) < 1e-4
    assert abs(r["first_stage"] - fs) < 1e-5
    if fs != 0:
        assert abs(r["late"] - r["itt"] / r["first_stage"]) < \
            max(1e-3, 1e-4 * abs(r["late"]))


def test_rdd_matches_numpy(spark, orders_pdf):
    out = _run(spark, "rdd_local_linear").iloc[0]
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    x = (cust["c_acctbal"].astype(float) * 100).round().astype(np.int64)
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    rev = orders_pdf.assign(yc=yc).groupby("o_custkey")["yc"].sum()
    y = cust["c_custkey"].map(rev).fillna(0).astype(np.int64)
    m = (x >= -100_000) & (x < 100_000)
    res = {}
    for side, mask in [("l", m & (x < 0)), ("r", m & (x >= 0))]:
        xs, ys = x[mask].to_numpy(float), y[mask].to_numpy(float)
        X = np.column_stack([np.ones(len(xs)), xs])
        (a, b), *_ = np.linalg.lstsq(X, ys, rcond=None)
        res[side] = (a, b, len(xs))
    assert out["n_left"] == res["l"][2]
    assert out["n_right"] == res["r"][2]
    assert abs(out["alpha_left"] - res["l"][0] / 100) < 2e-2
    assert abs(out["alpha_right"] - res["r"][0] / 100) < 2e-2
    assert abs(out["rdd_effect"]
               - (res["r"][0] - res["l"][0]) / 100) < 4e-2


def test_hoover_matches_numpy(spark, orders_pdf):
    out = _run(spark, "hoover_index_regions")
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    rev = orders_pdf.assign(yc=yc).groupby("o_custkey")["yc"].sum() \
        .to_numpy(float)
    h = np.abs(rev - rev.mean()).sum() / (2 * rev.sum())
    allrow = out[out.region == "ALL"].iloc[0]
    assert allrow["n_customers"] == len(rev)
    assert abs(allrow["hoover"] - h) < 1e-6
    assert ((out["hoover"] >= 0) & (out["hoover"] < 1)).all()


def test_spacesaving_bounds_hold(spark):
    out = _run(spark, "spacesaving_topk")
    assert len(out) == 10
    assert out["within_bounds"].all()
    assert (out["lower_cnt"] <= out["exact_cnt"]).all()
    assert (out["exact_cnt"] <= out["upper_cnt"]).all()
    assert list(out.sort_values("rnk")["lower_cnt"]) == \
        sorted(out["lower_cnt"], reverse=True)


def test_dsir_target_docs_score_high(spark):
    out = _run(spark, "dsir_importance_weights")
    assert len(out) == 20
    # importance weights toward an 'en' target should rank en docs up
    assert (out["lang"] == "en").mean() >= 0.5
    assert out["logw"].is_monotonic_decreasing


def test_powerlaw_alpha_range(spark):
    out = _run(spark, "powerlaw_degree_alpha").iloc[0]
    assert out["n_tail"] <= out["n_nodes"]
    assert out["alpha"] > 1.0


def test_err_matches_python(spark):
    out = _run(spark, "expected_reciprocal_rank")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    cnt = li.groupby("l_partkey").size()
    part = part.assign(
        cnt=part["p_partkey"].map(cnt).fillna(0).astype(int),
        pos=part["p_type"].str.startswith("PROMO").astype(int))
    for brand, grp in part.groupby("p_brand"):
        ranked = grp.sort_values(["cnt", "p_partkey"],
                                 ascending=[False, True]).head(20)
        p_stop, err = 1.0, 0.0
        for r, pos in enumerate(ranked["pos"], start=1):
            rel = 0.5 if pos else 0.0
            err += (1.0 / r) * rel * p_stop
            p_stop *= (1 - rel)
        row = out[out.brand == brand].iloc[0]
        assert abs(row["err"] - err) < 1e-6, brand


def test_mtld_matches_python(spark):
    out = _run(spark, "mtld_lexical_diversity").set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    import re

    for _, d in docs.head(50).iterrows():
        toks = [t for t in
                re.sub(r"\s+", " ", d["text"].lower()).strip()
                .split(" ") if t][:120]
        seen, c, factors = set(), 0, 0
        for t in toks:
            s2 = seen | {t}
            if len(s2) / (c + 1) < 0.72:
                seen, c = set(), 0
                factors += 1
            else:
                seen, c = s2, c + 1
        partial = ((1 - len(seen) / c) / (1 - 0.72)) if c else 0.0
        mass = factors + partial
        row = out.loc[d["doc_id"]]
        assert row["n_used"] == len(toks)
        assert row["factors"] == factors
        if mass > 0:
            assert abs(row["mtld"] - len(toks) / mass) < 1e-5
        else:
            assert pd.isna(row["mtld"])


def test_textrank_scores_valid(spark):
    out = _run(spark, "textrank_keywords")
    assert len(out) == 15
    # damped PageRank scores are bounded below by (1-d)
    assert (out["score"] >= 0.15 - 1e-9).all()
    assert out["score"].is_monotonic_decreasing


def test_wfunc_ignore_nulls_matches_pandas(spark, events_pdf):
    out = _run(spark, "wfunc_ignore_nulls_suite").set_index("user_id")
    df = events_pdf.copy()
    vc = np.floor(df["value"].astype(float) * 100).astype(np.int64)
    df["vc"] = vc.where(vc % 7 != 0)
    df = df.sort_values(["user_id", "ts", "event_id"])
    for uid, g in list(df.groupby("user_id"))[:30]:
        ff = g["vc"].ffill()
        row = out.loc[uid]
        assert row["n_rows"] == len(g)
        assert row["n_nulls"] == int(g["vc"].isna().sum())
        assert row["sum_filled"] == int(ff.fillna(0).sum())
        nn = g["vc"].dropna()
        assert row["first_nonnull"] == int(nn.iloc[0])
        assert row["last_nonnull"] == int(nn.iloc[-1])


def test_grouping_id_semantics(spark, orders_pdf):
    out = _run(spark, "grouping_id_bitmask")
    # gid 0: both keys real; gid 3: grand total
    grand = out[out.gid == 3].iloc[0]
    assert grand["n_orders"] == len(orders_pdf)
    assert grand["priority"] == "ALL" and grand["status"] == "ALL"
    lvl0 = out[out.gid == 0]
    assert lvl0["n_orders"].sum() == len(orders_pdf)
    # gid 1: status aggregated away (second column = LSB)
    lvl1 = out[out.gid == 1]
    assert (lvl1["status"] == "ALL").all()
    assert (lvl1["priority"] != "ALL").all()


def test_array_hof_matches_numpy(spark):
    out = _run(spark, "array_hof_suite").set_index("vec_id")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    for _, r in emb.head(40).iterrows():
        v = np.array(r["embedding"], dtype=np.float64)
        row = out.loc[r["vec_id"]]
        assert row["n_dims"] == len(v)
        assert row["n_pos"] == int((v > 0).sum())
        assert row["any_strong_neg"] == bool((v < -0.5).any())
        assert row["all_small"] == bool((np.abs(v) < 10).all())
        assert abs(row["fold_sum"] - v.sum()) < 1e-5
        assert abs(row["dot_reversed"] - float(v @ v[::-1])) < 1e-5


def test_hurst_structure(spark):
    out = _run(spark, "hurst_rs_exponent")
    assert sorted(out["block_size"]) == [8, 16, 32, 64]
    assert (out["mean_rs"] > 0).all()
    # R/S grows with block size
    srt = out.sort_values("block_size")
    assert srt["mean_rs"].is_monotonic_increasing
    assert out["hurst"].nunique() == 1
    h = out["hurst"].iloc[0]
    assert 0.0 < h < 1.2


def test_wilcoxon_matches_scipy_free_reference(spark, events_pdf):
    out = _run(spark, "wilcoxon_signed_rank").iloc[0]
    x = _daily(events_pdf).to_numpy(dtype=float)
    d = np.diff(x)
    d = d[d != 0]
    n = len(d)
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(n)
    sorted_ad = ad[order]
    i = 0
    pos = 0
    while i < n:
        j = i
        while j < n and sorted_ad[j] == sorted_ad[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    wplus = ranks[d > 0].sum()
    mean_w = n * (n + 1) / 4
    _, t = np.unique(ad, return_counts=True)
    var_w = n * (n + 1) * (2 * n + 1) / 24 - ((t ** 3 - t).sum()) / 48
    assert out["n_nonzero"] == n
    assert abs(out["w_plus"] - wplus) < 1e-6
    assert abs(out["mean_w"] - mean_w) < 1e-6
    assert abs(out["var_w"] - var_w) < 1e-6
    assert abs(out["z"] - (wplus - mean_w) / math.sqrt(var_w)) < 1e-5


def test_mcnemar_cells_partition(spark, events_pdf):
    out = _run(spark, "mcnemar_halfwindow").iloc[0]
    assert (out["both_halves"] + out["only_first"]
            + out["only_second"] + out["neither"]) == out["n_users"]
    b, c = out["only_first"], out["only_second"]
    if b + c > 0:
        assert abs(out["mcnemar_chi2"]
                   - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6


def test_partial_correlation_matches_numpy(spark, events_pdf):
    out = _run(spark, "partial_correlation_daily").iloc[0]
    ts = pd.to_datetime(events_pdf["ts"])
    day = (ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    df = pd.DataFrame({"day": day, "t": events_pdf["event_type"]})
    series = {}
    for name, key in [("x", "view"), ("y", "purchase"),
                      ("z", "click")]:
        series[name] = df[df.t == key].day.value_counts()
    days = sorted(set(series["x"].index) & set(series["y"].index)
                  & set(series["z"].index))
    M = np.array([[series[c][d] for d in days]
                  for c in ("x", "y", "z")], dtype=float)
    R = np.corrcoef(M)
    pc = ((R[0, 1] - R[0, 2] * R[1, 2])
          / math.sqrt((1 - R[0, 2] ** 2) * (1 - R[1, 2] ** 2)))
    assert out["n_days"] == len(days)
    assert abs(out["r_xy"] - R[0, 1]) < 1e-5
    assert abs(out["r_xy_given_z"] - pc) < 1e-5


def test_bartlett_matches_numpy(spark, orders_pdf):
    out = _run(spark, "bartlett_arms").iloc[0]
    import hashlib

    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)

    def arm(ck):
        h = hashlib.md5(f"r17:{ck}".encode()).hexdigest()
        return int(h[:15], 16) % 4

    arms = orders_pdf["o_custkey"].map(arm)
    k = 4
    ns, vs = [], []
    for a in range(k):
        g = yc[arms == a].to_numpy(float)
        ns.append(len(g))
        vs.append(g.var(ddof=1))
        assert out[f"n_arm{a}"] == len(g)
        assert abs(out[f"sd_arm{a}"] - math.sqrt(vs[a]) / 100) < 1e-4
    N = sum(ns)
    sp2 = sum((n - 1) * v for n, v in zip(ns, vs)) / (N - k)
    t = ((N - k) * math.log(sp2)
         - sum((n - 1) * math.log(v) for n, v in zip(ns, vs)))
    t /= 1 + (sum(1 / (n - 1) for n in ns) - 1 / (N - k)) / (3 * (k - 1))
    assert abs(out["bartlett_t"] - t) < 1e-4


def test_grubbs_matches_numpy(spark, events_pdf):
    out = _run(spark, "grubbs_outlier_daily").iloc[0]
    x = _daily(events_pdf)
    dev = (x - x.mean()).abs()
    day = dev.idxmax()
    g = dev.max() / x.std(ddof=1)
    assert out["outlier_day"] == day
    assert out["outlier_cnt"] == x[day]
    assert abs(out["grubbs_g"] - g) < 1e-5


def test_sign_test_matches_python(spark, events_pdf):
    out = _run(spark, "sign_test_daily").iloc[0]
    x = _daily(events_pdf).to_numpy(dtype=float)
    d = np.diff(x)
    d = d[d != 0]
    n, b = len(d), int((d > 0).sum())
    mm = min(b, n - b)
    csum = sum(math.comb(n, k) for k in range(mm + 1))
    p = min(1.0, 2.0 * csum / 2 ** n)
    assert out["n_nonzero"] == n
    assert out["n_positive"] == b
    assert abs(out["p_two_sided"] - p) < 1e-6


def test_kuiper_matches_numpy(spark, orders_pdf):
    out = _run(spark, "kuiper_two_sample").iloc[0]
    import hashlib

    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)

    def grp(ck):
        h = hashlib.md5(f"r17b:{ck}".encode()).hexdigest()
        return int(h[:15], 16) % 2

    g = orders_pdf["o_custkey"].map(grp)
    a = np.sort(yc[g == 0].to_numpy())
    b = np.sort(yc[g == 1].to_numpy())
    vals = np.unique(yc)
    fa = np.searchsorted(a, vals, side="right") / len(a)
    fb = np.searchsorted(b, vals, side="right") / len(b)
    dplus = max(0.0, (fa - fb).max())
    dminus = max(0.0, (fb - fa).max())
    assert out["n_group0"] == len(a) and out["n_group1"] == len(b)
    assert abs(out["d_plus"] - dplus) < 1e-6
    assert abs(out["d_minus"] - dminus) < 1e-6
    assert abs(out["kuiper_v"] - (dplus + dminus)) < 1e-6


def test_cooks_distance_matches_numpy(spark, events_pdf):
    out = _run(spark, "cooks_distance_daily").set_index("t")
    x = _daily(events_pdf)
    t = x.index.to_numpy(dtype=float)
    y = x.to_numpy(dtype=float)
    n = len(t)
    X = np.column_stack([np.ones(n), t])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    e = y - X @ beta
    s2 = (e ** 2).sum() / (n - 2)
    sxx = ((t - t.mean()) ** 2).sum()
    h = 1 / n + (t - t.mean()) ** 2 / sxx
    d = e ** 2 * h / (2 * s2 * (1 - h) ** 2)
    for i, day in enumerate(x.index):
        row = out.loc[day]
        assert abs(row["residual"] - e[i]) < 1e-3
        assert abs(row["leverage"] - h[i]) < 1e-6
        assert abs(row["cooks_d"] - d[i]) < 1e-4


def test_cochran_q_matches_python(spark, events_pdf):
    out = _run(spark, "cochran_q_usertypes").iloc[0]
    ts = pd.to_datetime(events_pdf["ts"])
    day = (ts.dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    piv = (events_pdf.assign(one=1, day=day)
           .pivot_table(index=["user_id", "day"],
                        columns="event_type",
                        values="one", aggfunc="max", fill_value=0))
    M = piv.reindex(columns=["view", "click", "purchase"],
                    fill_value=0).to_numpy()
    k = 3
    C = M.sum(axis=0)
    R = M.sum(axis=1)
    T = C.sum()
    den = k * T - (R ** 2).sum()
    assert out["n_blocks"] == len(piv)
    if den <= 0:
        # every user hit all (or none of) the types — Q undefined
        assert pd.isna(out["cochran_q"])
    else:
        q = k * (k - 1) * ((C - T / k) ** 2).sum() / den
        assert abs(out["cochran_q"] - q) < 1e-5


def _arm_of(salt, mod):
    import hashlib

    def f(ck):
        h = hashlib.md5(f"{salt}{ck}".encode()).hexdigest()
        return int(h[:15], 16) % mod
    return f


def test_levene_mean_matches_scipy_free(spark, orders_pdf):
    out = _run(spark, "levene_mean_arms")
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    arms = orders_pdf["o_custkey"].map(_arm_of("r17:", 4))
    groups = [yc[arms == a].to_numpy(float) for a in range(4)]
    zs = [np.abs(g - g.mean()) for g in groups]
    zb = [z.mean() for z in zs]
    zsall = np.concatenate(zs)
    zbar = zsall.mean()
    num = sum(len(z) * (m - zbar) ** 2 for z, m in zip(zs, zb))
    den = sum(((z - m) ** 2).sum() for z, m in zip(zs, zb))
    w = (len(zsall) - 4) / 3 * num / den
    got_w = out["levene_w"].iloc[0]
    assert abs(got_w - w) < 1e-4
    for _, row in out.iterrows():
        assert abs(row["mean_absdev"]
                   - zb[int(row["arm"])] / 100) < 1e-4


def test_welch_anova_matches_scipy_free(spark, orders_pdf):
    out = _run(spark, "welch_anova_arms").iloc[0]
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    arms = orders_pdf["o_custkey"].map(_arm_of("r17:", 4))
    g = [yc[arms == a].to_numpy(float) for a in range(4)]
    n = np.array([len(x) for x in g], float)
    m = np.array([x.mean() for x in g])
    v = np.array([x.var(ddof=1) for x in g])
    w = n / v
    mw = (w * m).sum() / w.sum()
    k = 4
    hsum = (((1 - w / w.sum()) ** 2) / (n - 1)).sum()
    fstar = ((w * (m - mw) ** 2).sum() / (k - 1)) \
        / (1 + 2 * (k - 2) / (k * k - 1) * hsum)
    assert abs(out["weighted_mean"] - mw / 100) < 1e-3
    assert abs(out["welch_f"] - fstar) < 1e-4
    assert abs(out["df_denom"] - (k * k - 1) / (3 * hsum)) < 1e-3


def test_tukey_q_pairs_matches(spark, orders_pdf):
    out = _run(spark, "tukey_q_pairs")
    assert len(out) == 6
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    arms = orders_pdf["o_custkey"].map(_arm_of("r17:", 4))
    g = [yc[arms == a].to_numpy(float) for a in range(4)]
    N = sum(len(x) for x in g)
    sp2 = sum(((x - x.mean()) ** 2).sum() for x in g) / (N - 4)
    for _, r in out.iterrows():
        a, b = g[int(r["arm_a"])], g[int(r["arm_b"])]
        q = abs(a.mean() - b.mean()) / math.sqrt(
            sp2 / 2 * (1 / len(a) + 1 / len(b)))
        assert abs(r["tukey_q"] - q) < 1e-4


def test_jarque_bera_matches_numpy(spark, events_pdf):
    out = _run(spark, "jarque_bera_daily").iloc[0]
    x = _daily(events_pdf).to_numpy(dtype=float)
    n = len(x)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    s = m3 / m2 ** 1.5
    kk = m4 / m2 ** 2
    jb = n / 6 * (s ** 2 + (kk - 3) ** 2 / 4)
    assert abs(out["skewness"] - s) < 1e-5
    assert abs(out["kurtosis"] - kk) < 1e-5
    assert abs(out["jarque_bera"] - jb) < 1e-4


def test_welch_t_matches_numpy(spark, orders_pdf):
    out = _run(spark, "welch_t_parity").iloc[0]
    yc = (orders_pdf["o_totalprice"].astype(float) * 100).round() \
        .astype(np.int64)
    grp = orders_pdf["o_custkey"].map(_arm_of("r17b:", 2))
    a = yc[grp == 0].to_numpy(float)
    b = yc[grp == 1].to_numpy(float)
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2 ** 2 / ((a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
                     + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1))
    assert out["n_group0"] == len(a)
    assert abs(out["welch_t"] - t) < 1e-4
    assert abs(out["ws_df"] - df) < 1e-2


def test_chow_matches_numpy(spark, events_pdf):
    out = _run(spark, "chow_test_daily").iloc[0]
    x = _daily(events_pdf)
    t = x.index.to_numpy(dtype=float)
    y = x.to_numpy(dtype=float)

    def rss(tt, yy):
        X = np.column_stack([np.ones(len(tt)), tt])
        beta, *_ = np.linalg.lstsq(X, yy, rcond=None)
        return float(((yy - X @ beta) ** 2).sum())

    rp = rss(t, y)
    m1 = t < 15
    r1, r2 = rss(t[m1], y[m1]), rss(t[~m1], y[~m1])
    f = ((rp - r1 - r2) / 2) / ((r1 + r2) / (len(t) - 4))
    assert abs(out["rss_pooled"] - rp) < 1e-2
    assert abs(out["chow_f"] - f) < 1e-4


def test_page_trend_matches_python(spark, events_pdf):
    out = _run(spark, "page_trend_test").iloc[0]
    ts = pd.to_datetime(events_pdf["ts"])
    # Spark dayofweek: Sunday=1; pandas dayofweek: Monday=0
    dow = (ts.dt.dayofweek + 1) % 7 + 1
    wk = ts - pd.to_timedelta(ts.dt.dayofweek, unit="D")
    wk = wk.dt.floor("D")
    df = pd.DataFrame({"wk": wk, "dow": dow}).groupby(
        ["wk", "dow"]).size().rename("cnt").reset_index()
    complete = df.groupby("wk").size()
    complete = set(complete[complete == 7].index)
    df = df[df.wk.isin(complete)]
    L = 0.0
    for _, g in df.groupby("wk"):
        r = g["cnt"].rank(method="average")
        L += float((g["dow"].to_numpy() * r.to_numpy()).sum())
    b = len(complete)
    k = 7.0
    mean_l = b * k * (k + 1) ** 2 / 4
    var_l = b * (k ** 3 - k) ** 2 / (144 * (k - 1))
    assert out["n_blocks"] == b
    assert abs(out["page_l"] - L) < 1e-6
    assert abs(out["mean_l"] - mean_l) < 1e-6
    if b:
        assert abs(out["page_z"]
                   - (L - mean_l) / math.sqrt(var_l)) < 1e-5


def test_theta_setops_consistency(spark, events_pdf):
    out = _run(spark, "theta_sketch_setops").iloc[0]
    dist = events_pdf[events_pdf.event_type.isin(["view", "purchase"])]
    a = set(dist[dist.event_type == "view"].user_id)
    b = set(dist[dist.event_type == "purchase"].user_id)
    assert out["exact_union"] == len(a | b)
    assert out["exact_inter"] == len(a & b)
    assert out["exact_a_only"] == len(a - b)
    assert out["exact_b_only"] == len(b - a)
    # estimates decompose: union = inter + a_only + b_only (exactly,
    # since all share the same union-window denominator)
    assert abs(out["est_union"]
               - (out["est_inter"] + out["est_a_only"]
                  + out["est_b_only"])) < 1e-4
    # small population fits inside k=256 -> estimates are exact
    if out["exact_union"] <= 256:
        assert abs(out["est_union"] - out["exact_union"]) < 1e-6
