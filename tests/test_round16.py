"""Round-11 tests: Arrow IVF assign fast path (VERDICT r10 #1).

The registered parity spelling (impl='expr', interpreted zip_with/
aggregate folds) stays the default every IVF oracle pairs against;
impl='arrow' is the one-off index-BUILD fast path. These tests pin the
two implementations row-for-row equal (ids, centroid, and the rounded
sim's exact decimal rendering) at three SFs, and exercise the two
parity-sensitive seams in isolation: HALF_UP boundary rounding and the
first-max / lowest-centroid-id tie-break.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from travel_data_pipeline_spark.operators import similarity as S
from travel_data_pipeline_spark.sources.readers import load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def _canon(rows):
    return sorted((r[0], r[1], repr(r[2])) for r in rows)


@pytest.mark.parametrize("sf", SF_DIRS)
def test_assign_clusters_arrow_equals_expr(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    cents = (emb.filter(F.col("vec_id") % 50 == 0)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    expr_rows = S.assign_clusters(emb, cents, impl="expr").collect()
    arrow_rows = S.assign_clusters(emb, cents, impl="arrow").collect()
    assert len(expr_rows) == len(arrow_rows) > 0
    assert _canon(expr_rows) == _canon(arrow_rows)


def test_assign_clusters_arrow_ties_break_low_centroid(spark):
    # two bit-identical centroids -> every vector ties; both impls must
    # pick the LOWER centroid id (row_number asc == np.argmax first-max)
    emb = spark.createDataFrame(
        [(i, [float(i + 1), 2.0, 0.5]) for i in range(20)],
        "vec_id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0, 0.25]), (3, [1.0, 0.0, 0.25]),
         (9, [-1.0, 0.5, 0.0])],
        "centroid_id bigint, embedding array<double>")
    for impl in ("expr", "arrow"):
        rows = S.assign_clusters(emb, cents, impl=impl).collect()
        assert len(rows) == 20
        assert all(r.centroid_id in (3, 9) for r in rows), (impl, rows)
    e = _canon(S.assign_clusters(emb, cents, impl="expr").collect())
    a = _canon(S.assign_clusters(emb, cents, impl="arrow").collect())
    assert e == a


def test_spark_round6_np_matches_f_round(spark):
    # deliberately boundary-adjacent doubles: the documented DuckDB/
    # binary-round failure value, exact .5 boundaries both signs,
    # near-integer scaled values, -0.0 normalization, and a pseudo-
    # random spread
    vals = [37.164888499999996, 0.1234565, -0.1234565, 0.12345649999,
            0.9999995, -0.9999995, 1.0000005, 2.0000000001e-6,
            1.9999999995e-6, -4e-7, 4e-7, 0.0, 1.0, -1.0,
            0.5833335, -0.5833335]
    rng = np.random.default_rng(13)
    vals += [float(x) for x in rng.uniform(-1, 1, 500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    spark_rounded = [r.r for r in
                     df.select(F.round("x", 6).alias("r")).collect()]
    ours = spark_round6_list(vals)
    assert [repr(a) for a in ours] == [repr(b) for b in spark_rounded]


def spark_round6_list(vals):
    arr = np.array(vals, dtype=np.float64)
    return list(S.spark_round6_np(arr))


def test_ivf_topk_assign_impl_passthrough(spark):
    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = (emb.filter(F.col("vec_id") % 50 == 0)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    base = S.ivf_topk(emb, cents, queries, k=5, n_probe=2,
                      assign_impl="expr").collect()
    fast = S.ivf_topk(emb, cents, queries, k=5, n_probe=2,
                      assign_impl="arrow").collect()
    canon = sorted((r.query_id, r.neighbor_id, repr(r.cosine_sim), r.rnk)
                   for r in base)
    assert canon == sorted((r.query_id, r.neighbor_id, repr(r.cosine_sim),
                            r.rnk) for r in fast)


def test_group_sequential_stream_replay_strict_noop(spark, sf_smoke,
                                                    tmp_path):
    """Crash-recovery for the GS monitor (VERDICT r10 #6, the
    token_shard/LSH precedent): a replayed micro-batch — the exact
    crash window between the state snapshot write and the checkpoint
    commit — must be a STRICT no-op on the per-user state ROWS (not
    just the 5-row readout), and a full legacy-lineage redelivery
    (wiped checkpoint, kept state) must converge to the same rows."""
    import travel_data_pipeline_spark.streaming.jobs as J
    from tests.test_round14 import _write_feed_file
    from travel_data_pipeline_spark.sources import versioned
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = (load_table(spark, sf_smoke, "events")
          .select("event_id", "ts", "user_id", "event_type", "value"))
    rows = sorted((r.event_id, r.ts, r.user_id, r.event_type, r.value)
                  for r in ev.collect())
    d0 = min(r[1] for r in rows).date().isoformat()
    half = len(rows) // 2
    feed_full = tmp_path / "full"
    feed_tail = tmp_path / "tail"  # only the LAST micro-batch
    feed_full.mkdir()
    feed_tail.mkdir()
    _write_feed_file(spark, str(feed_full / "b0.parquet"), rows[:half],
                     1700000000)
    _write_feed_file(spark, str(feed_full / "b1.parquet"), rows[half:],
                     1700000100)
    _write_feed_file(spark, str(feed_tail / "b1.parquet"), rows[half:],
                     1700000100)
    state = str(tmp_path / "state")

    def run(feed, ckpt):
        stream = (spark.readStream
                  .schema("event_id long, ts timestamp, user_id long, "
                          "event_type string, value double")
                  .option("maxFilesPerTrigger", 1).parquet(str(feed)))
        q = J.group_sequential_stream(stream, state,
                                      str(tmp_path / ckpt), d0)
        q.awaitTermination(300)

    def state_rows():
        return {tuple(r) for r in
                versioned.read_table(spark, state)
                .select("user_id", "arm", "first_day",
                        "first_purchase_day").collect()}

    run(feed_full, "ck1")
    s1 = state_rows()
    assert s1

    # crash window: ONLY the last micro-batch redelivers
    v_before = versioned.current_version(state)
    run(feed_tail, "ck2")
    assert state_rows() == s1            # strict row-level no-op
    assert versioned.current_version(state) > v_before  # it DID fold

    # legacy lineage: full redelivery onto the surviving state
    run(feed_full, "ck3")
    assert state_rows() == s1


# --- Batch A python-model checks (independent of both engines) ------------

def _daily(spark, sf, etype=None):
    from collections import Counter

    from travel_data_pipeline_spark.sources.readers import load_table
    rows = (load_table(spark, sf, "events")
            .select("ts", "event_type").collect())
    import datetime
    anchor = datetime.date(2024, 1, 1)
    c = Counter()
    for r in rows:
        if etype is None or r.event_type == etype:
            c[(r.ts.date() - anchor).days] += 1
    return dict(c)


def test_mann_kendall_matches_python(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_round16 import (
        mann_kendall_trend,
    )
    daily = _daily(spark, sf_smoke)
    ts = sorted(daily)
    xs = [daily[t] for t in ts]
    n = len(xs)
    s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n) for j in range(i + 1, n))
    from collections import Counter
    ties = Counter(xs)
    tie_term = sum(t * (t - 1) * (2 * t + 5)
                   for t in ties.values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    row = mann_kendall_trend(spark, sf_smoke).collect()[0]
    assert row.n_days == n and row.s_stat == s
    assert abs(row.var_s - var) < 1e-5
    if s == 0:
        assert row.z == 0.0
    else:
        zz = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var)
        assert abs(row.z - zz) < 1e-6


def test_kendall_tau_matches_python(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_round16 import (
        kendall_tau_daily,
    )
    v = _daily(spark, sf_smoke, "view")
    p = _daily(spark, sf_smoke, "purchase")
    ts = sorted(set(v) & set(p))
    xy = [(v[t], p[t]) for t in ts]
    n = len(xy)
    C = D = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xy[j][0] - xy[i][0]
            dy = xy[j][1] - xy[i][1]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    row = kendall_tau_daily(spark, sf_smoke).collect()[0]
    assert (row.n_days, row.concordant, row.discordant) == (n, C, D)
    tau = (C - D) / math.sqrt((n0 - tx) * (n0 - ty))
    assert abs(row.tau_b - tau) < 1e-6
    assert -1.0 <= row.tau_b <= 1.0


def test_ccf_matches_python(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_round16 import (
        ccf_view_purchase,
    )
    v = _daily(spark, sf_smoke, "view")
    p = _daily(spark, sf_smoke, "purchase")
    got = {r.lag: r for r in ccf_view_purchase(spark, sf_smoke).collect()}
    assert set(got) == {0, 1, 2, 3}
    for lag in range(4):
        pairs = [(v[t], p[t + lag]) for t in sorted(v) if t + lag in p]
        m = len(pairs)
        assert got[lag].m == m
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        den = (m * sxx - sx * sx) * (m * syy - sy * sy)
        if den <= 0:
            assert got[lag].ccf is None
        else:
            r = (m * sxy - sx * sy) / math.sqrt(den)
            assert abs(got[lag].ccf - r) < 1e-6


def test_logrank_matches_python(spark, sf_smoke):
    import hashlib
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import logrank_arms
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("user_id", "ts").collect())
    days, last = defaultdict(set), {}
    for r in rows:
        d = r.ts.date()
        days[r.user_id].add(d)
        last[r.user_id] = max(last.get(r.user_id, d), d)
    max_day = max(last.values())

    def arm(u):
        return int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15],
                   16) % 2

    lives = [(arm(u), len(days[u]), 1 if last[u] == max_day else 0)
             for u in days]
    times = sorted({t for _, t, _ in lives})
    o1 = e1 = v = 0.0
    for t in times:
        n1 = sum(1 for a, tt, _ in lives if a == 0 and tt >= t)
        n2 = sum(1 for a, tt, _ in lives if a == 1 and tt >= t)
        d1 = sum(1 for a, tt, c in lives if a == 0 and tt == t and not c)
        d2 = sum(1 for a, tt, c in lives if a == 1 and tt == t and not c)
        dt, nt = d1 + d2, n1 + n2
        if dt == 0:
            continue
        o1 += d1
        e1 += dt * n1 / nt
        if nt > 1:
            v += dt * n1 / nt * n2 / nt * (nt - dt) / (nt - 1)
    row = logrank_arms(spark, sf_smoke).collect()[0]
    assert row.o1 == int(o1)
    assert abs(row.e1 - e1) < 1e-5
    assert abs(row.var_lr - v) < 1e-5
    if v > 0:
        assert abs(row.chi2 - (o1 - e1) ** 2 / v) < 1e-4


def test_average_precision_matches_python(spark, sf_smoke):
    from collections import Counter

    from travel_data_pipeline_spark.queries_round16 import (
        average_precision_rank,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    cnts = Counter(r.l_partkey for r in
                   load_table(spark, sf_smoke, "lineitem")
                   .select("l_partkey").collect())
    parts = [(r.p_partkey, r.p_type.startswith("PROMO")) for r in
             load_table(spark, sf_smoke, "part")
             .select("p_partkey", "p_type").collect()]
    ranked = sorted(((-cnts.get(pk, 0), pk, pos) for pk, pos in parts))
    cum = 0
    ap_sum = 0.0
    n_pos = sum(1 for _, _, pos in ranked if pos)
    for i, (_, _, pos) in enumerate(ranked, start=1):
        if pos:
            cum += 1
            ap_sum += cum / i
    row = average_precision_rank(spark, sf_smoke).collect()[0]
    assert row.n_items == len(parts) and row.n_pos == n_pos
    if n_pos == 0:
        assert row.avg_precision is None
    else:
        assert abs(row.avg_precision - ap_sum / n_pos) < 1e-6
        assert 0.0 < row.avg_precision <= 1.0


# ---------------------------------------------------------------------------
# Batch B python models — k-sample / rank statistics.
# ---------------------------------------------------------------------------


def _md5_long(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _daily_pairs(spark, sf_smoke):
    from travel_data_pipeline_spark.sources.readers import load_table
    from collections import Counter
    import datetime

    anchor = datetime.date(2024, 1, 1)
    rows = (load_table(spark, sf_smoke, "events")
            .select("ts", "event_type").collect())
    v, p = Counter(), Counter()
    for r in rows:
        t = (r.ts.date() - anchor).days
        if r.event_type == "view":
            v[t] += 1
        elif r.event_type == "purchase":
            p[t] += 1
    ts = sorted(set(v) & set(p))
    return [v[t] for t in ts], [p[t] for t in ts]


def _avg_ranks(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and xs[order[j]] == xs[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def test_spearman_daily_matches_python(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_round16 import (
        spearman_rank_daily,
    )

    x, y = _daily_pairs(spark, sf_smoke)
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    n = len(x)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)
                    * sum((b - my) ** 2 for b in ry))
    want = num / den
    row = spearman_rank_daily(spark, sf_smoke).collect()[0]
    assert row.n_days == n
    assert abs(row.rho - want) < 1e-6


def test_kruskal_wallis_matches_python(spark, sf_smoke):
    from decimal import Decimal

    from travel_data_pipeline_spark.queries_round16 import (
        kruskal_wallis_arms,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "orders")
            .select("o_custkey", "o_totalprice").collect())
    arms, ys = [], []
    for r in rows:
        arms.append(_md5_long(f"kw:{r.o_custkey}") % 4)
        ys.append(Decimal(str(round(r.o_totalprice, 2))))
    ranks = _avg_ranks(ys)
    n = len(ys)
    r_sum = [0.0] * 4
    n_arm = [0] * 4
    for a, rk in zip(arms, ranks):
        r_sum[a] += rk
        n_arm[a] += 1
    h = (12.0 / (n * (n + 1))
         * sum(r_sum[a] ** 2 / n_arm[a] for a in range(4))
         - 3.0 * (n + 1))
    from collections import Counter
    tie = sum(c ** 3 - c for c in Counter(ys).values())
    hc = h / (1.0 - tie / (n ** 3 - n))
    row = kruskal_wallis_arms(spark, sf_smoke).collect()[0]
    assert row.n == n
    assert [row.n_arm0, row.n_arm1, row.n_arm2, row.n_arm3] == n_arm
    assert abs(row.h_stat - h) < 1e-5
    assert abs(row.h_tie_corrected - hc) < 1e-5


def _units_python(spark, sf_smoke, salt="exp:"):
    from collections import defaultdict
    from decimal import Decimal

    from travel_data_pipeline_spark.sources.readers import load_table

    cust = {r.c_custkey: r.c_mktsegment for r in
            load_table(spark, sf_smoke, "customer").collect()}
    acc = defaultdict(Decimal)
    for r in (load_table(spark, sf_smoke, "orders")
              .select("o_custkey", "o_totalprice").collect()):
        if r.o_custkey in cust:
            arm = _md5_long(f"{salt}{r.o_custkey}") % 2
            acc[(r.o_custkey, arm)] += Decimal(str(round(r.o_totalprice, 2)))
    return [(arm, y) for (_, arm), y in acc.items()]


def test_cliffs_delta_matches_bruteforce(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round16 import (
        cliffs_delta_arms,
    )

    units = _units_python(spark, sf_smoke)
    ts = [y for a, y in units if a == 1]
    cs = [y for a, y in units if a == 0]
    gt = sum(1 for t in ts for c in cs if t > c)
    lt = sum(1 for t in ts for c in cs if t < c)
    eq = sum(1 for t in ts for c in cs if t == c)
    want = (gt - lt) / (len(ts) * len(cs))
    row = cliffs_delta_arms(spark, sf_smoke).collect()[0]
    assert (row.n_treat, row.n_ctrl) == (len(ts), len(cs))
    assert (row.gt_pairs, row.lt_pairs, row.tie_pairs) == (gt, lt, eq)
    assert abs(row.cliffs_delta - want) < 1e-6
    assert row.magnitude in {"negligible", "small", "medium", "large"}


def test_brown_forsythe_matches_python(spark, sf_smoke):
    from decimal import Decimal

    from travel_data_pipeline_spark.queries_round16 import (
        brown_forsythe_arms,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "orders")
            .select("o_custkey", "o_totalprice").collect())
    by_arm = {a: [] for a in range(4)}
    for r in rows:
        a = _md5_long(f"bf:{r.o_custkey}") % 4
        by_arm[a].append(int(Decimal(str(round(r.o_totalprice, 2))) * 100))
    meds, zs = {}, {}
    for a, ys in by_arm.items():
        ys.sort()
        n = len(ys)
        med2 = ys[(n + 1) // 2 - 1] + ys[n // 2]
        meds[a] = med2 / 200.0
        zs[a] = [abs(2 * y - med2) for y in ys]
    k = 4
    n_tot = sum(len(v) for v in zs.values())
    m_arm = {a: sum(v) / len(v) for a, v in zs.items()}
    m = sum(sum(v) for v in zs.values()) / n_tot
    ssb = sum(len(zs[a]) * (m_arm[a] - m) ** 2 for a in range(k))
    ssw = sum(sum((z - m_arm[a]) ** 2 for z in zs[a]) for a in range(k))
    f_want = (ssb / (k - 1)) / (ssw / (n_tot - k))
    got = {r.arm: r for r in brown_forsythe_arms(spark, sf_smoke).collect()}
    assert set(got) == set(range(4))
    for a in range(4):
        assert got[a].n_arm == len(by_arm[a])
        assert abs(got[a].median_value - meds[a]) < 1e-9
        want_mad = sum(zs[a]) / len(zs[a]) / 200.0
        assert abs(got[a].mean_absdev - want_mad) < 1e-5
        assert abs(got[a].f_stat - f_want) < 1e-4


def test_jonckheere_terpstra_matches_python(spark, sf_smoke):
    import math
    from collections import Counter
    from decimal import Decimal

    from travel_data_pipeline_spark.queries_round16 import (
        jonckheere_terpstra_trend,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "orders")
            .select("o_orderpriority", "o_totalprice").collect())
    groups = {g: [] for g in range(1, 6)}
    allv = []
    for r in rows:
        g = int(r.o_orderpriority[0])
        y = int(Decimal(str(round(r.o_totalprice, 2))) * 100)
        groups[g].append(y)
        allv.append(y)
    j2 = 0
    for i in range(1, 6):
        for j in range(i + 1, 6):
            for xi in groups[i]:
                for xj in groups[j]:
                    if xi < xj:
                        j2 += 2
                    elif xi == xj:
                        j2 += 1
    n = len(allv)
    ns = [len(groups[g]) for g in range(1, 6)]
    mean2 = sum(ns[i] * ns[j] for i in range(5) for j in range(i + 1, 5))
    tc = Counter(allv).values()
    a = (n * (n - 1) * (2 * n + 5)
         - sum(x * (x - 1) * (2 * x + 5) for x in ns)
         - sum(t * (t - 1) * (2 * t + 5) for t in tc))
    b = (sum(x * (x - 1) * (x - 2) for x in ns)
         * sum(t * (t - 1) * (t - 2) for t in tc))
    c = (sum(x * (x - 1) for x in ns) * sum(t * (t - 1) for t in tc))
    var = (a / 72.0 + b / (36.0 * n * (n - 1) * (n - 2))
           + c / (8.0 * n * (n - 1)))
    z = (j2 - mean2) / (2.0 * math.sqrt(var))
    row = jonckheere_terpstra_trend(spark, sf_smoke).collect()[0]
    assert (row.n, row.j2_stat, row.mean2_j) == (n, j2, mean2)
    assert abs(row.sd_j - math.sqrt(var)) < 1e-4
    assert abs(row.z - z) < 1e-6


# ---------------------------------------------------------------------------
# Batch C python models — graph structure, inequality, intermittent
# demand, distribution similarity.
# ---------------------------------------------------------------------------


def _copurchase_edges(spark, sf):
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_affinity import (
        MAX_BASKET,
        MINSUP,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    items = sorted({(r.l_orderkey, r.l_partkey) for r in
                    load_table(spark, sf, "lineitem")
                    .select("l_orderkey", "l_partkey").collect()})
    baskets = defaultdict(list)
    for o, p in items:
        baskets[o].append(p)
    pair_cnt = defaultdict(int)
    for o, ps in baskets.items():
        ps = sorted(ps)[:MAX_BASKET]
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_cnt[(ps[i], ps[j])] += 1
    return {e for e, c in pair_cnt.items() if c >= MINSUP}


def test_degree_assortativity_matches_python(spark, sf_smoke):
    import math
    from collections import Counter

    from travel_data_pipeline_spark.queries_round16 import (
        degree_assortativity,
    )

    edges = _copurchase_edges(spark, sf_smoke)
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    m = len(xs)
    sx, sxx = sum(xs), sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    want = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    row = degree_assortativity(spark, sf_smoke).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(deg)
    assert abs(row.assortativity - want) < 1e-6
    _ = math


def test_adamic_adar_matches_python(spark, sf_smoke):
    import math
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        _AA_MAX_NEIGH,
        _AA_TOPK,
        adamic_adar_links,
    )

    edges = _copurchase_edges(spark, sf_smoke)
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    adj = {k: sorted(vs)[:_AA_MAX_NEIGH] for k, vs in adj.items()}
    deg = {k: len(vs) for k, vs in adj.items()}
    common = defaultdict(list)
    for z, nbrs in adj.items():
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                a, b = nbrs[i], nbrs[j]
                if (a, b) not in edges:
                    common[(a, b)].append(z)
    ranked = sorted(common.items(),
                    key=lambda kv: (-len(kv[1]), kv[0]))[:_AA_TOPK]
    got = {(r.part_a, r.part_b): r for r in
           adamic_adar_links(spark, sf_smoke).collect()}
    assert len(got) == min(_AA_TOPK, len(common))
    for rnk, ((a, b), zs) in enumerate(ranked, 1):
        r = got[(a, b)]
        assert r.rnk == rnk
        assert r.common_neighbors == len(zs)
        assert (r.deg_a, r.deg_b) == (deg[a], deg[b])
        want_j = len(zs) / (deg[a] + deg[b] - len(zs))
        want_aa = sum(1.0 / math.log(deg[z]) for z in zs)
        assert abs(r.jaccard - want_j) < 1e-6
        assert abs(r.adamic_adar - want_aa) < 1e-6


def test_ge2_decomposition_matches_python(spark, sf_smoke):
    from collections import defaultdict
    from decimal import Decimal

    from travel_data_pipeline_spark.queries_round16 import (
        ge2_inequality_decomposition,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    nat = {r.c_custkey: r.c_nationkey for r in
           load_table(spark, sf_smoke, "customer").collect()}
    rev = defaultdict(Decimal)
    for r in (load_table(spark, sf_smoke, "orders")
              .select("o_custkey", "o_totalprice").collect()):
        rev[r.o_custkey] += Decimal(str(round(r.o_totalprice, 2)))
    groups = defaultdict(list)
    for ck, x in rev.items():
        groups[nat[ck]].append(float(x))
    allx = [x for xs in groups.values() for x in xs]
    n = len(allx)
    mu = sum(allx) / n

    def ge2(xs):
        m = sum(xs) / len(xs)
        return (sum((x / m) ** 2 for x in xs) / len(xs) - 1) / 2

    total = ge2(allx)
    between = (sum(len(xs) * (sum(xs) / len(xs)) ** 2
                   for xs in groups.values()) / n / mu ** 2 - 1) / 2
    within = sum((len(xs) / n) * ((sum(xs) / len(xs)) / mu) ** 2
                 * ge2(xs) for xs in groups.values())
    # additive decomposition identity
    assert abs(total - (between + within)) < 1e-9
    row = ge2_inequality_decomposition(spark, sf_smoke).collect()[0]
    assert (row.n, row.n_nations) == (n, len(groups))
    assert abs(row.ge2_total - total) < 1e-5
    assert abs(row.ge2_between - between) < 1e-5
    assert abs(row.ge2_within - within) < 1e-5


def test_croston_matches_python(spark, sf_smoke):
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from travel_data_pipeline_spark.queries_round16 import (
        croston_intermittent_demand,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    odate = {r.o_orderkey: r.o_orderdate.date() for r in
             load_table(spark, sf_smoke, "orders").collect()}
    brand = {r.p_partkey: r.p_brand for r in
             load_table(spark, sf_smoke, "part").collect()}
    dem = defaultdict(Decimal)
    for r in (load_table(spark, sf_smoke, "lineitem")
              .select("l_orderkey", "l_partkey", "l_quantity")
              .collect()):
        dem[(brand[r.l_partkey], odate[r.l_orderkey])] += \
            Decimal(str(round(r.l_quantity, 2)))
    series = defaultdict(list)
    for (b, d), z in sorted(dem.items()):
        series[b].append((d, z))
    a, a1 = Decimal("0.2"), Decimal("0.8")
    q6 = Decimal("0.000001")

    def rnd(x):
        return x.quantize(q6, rounding=ROUND_HALF_UP)

    got = {r.brand: r for r in
           croston_intermittent_demand(spark, sf_smoke).collect()}
    assert set(got) == set(series)
    for b, pts in series.items():
        zs, ps = pts[0][1], Decimal(1)
        prev_d = pts[0][0]
        for d, z in pts[1:]:
            gap = Decimal((d - prev_d).days)
            zs = rnd(a * z + a1 * zs)
            ps = rnd(a * gap + a1 * ps)
            prev_d = d
        r = got[b]
        assert r.n_demand_days == len(pts)
        assert abs(r.total_qty - float(sum(z for _, z in pts))) < 1e-9
        assert abs(r.z_level - float(zs)) < 1e-9
        assert abs(r.p_interval - float(ps)) < 1e-9
        assert abs(r.forecast - float(zs) / float(ps)) < 1e-5
        assert abs(r.forecast_sba
                   - 0.9 * float(zs) / float(ps)) < 1e-5


def test_jsd_source_matches_python(spark, sf_smoke):
    import math
    import re
    from collections import Counter, defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        _JSD_OTHER,
        _JSD_TOPV,
        jsd_source_topterms,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    docs = (load_table(spark, sf_smoke, "documents")
            .select("source", "text").collect())
    vocab = Counter()
    per_src = defaultdict(Counter)
    for r in docs:
        toks = [t for t in
                re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
                if t]
        vocab.update(toks)
        per_src[r.source].update(toks)
    top = {t for t, _ in sorted(vocab.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:_JSD_TOPV]}
    bucketed = {}
    for s, c in per_src.items():
        bc = Counter()
        for t, n in c.items():
            bc[t if t in top else _JSD_OTHER] += n
        bucketed[s] = bc
    srcs = sorted(bucketed)
    buckets = sorted({b for c in bucketed.values() for b in c})
    got = {(r.source_a, r.source_b): r.jsd_bits for r in
           jsd_source_topterms(spark, sf_smoke).collect()}
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            sa, sb = srcs[i], srcs[j]
            t1 = sum(bucketed[sa].values())
            t2 = sum(bucketed[sb].values())
            s = 0.0
            for bk in buckets:
                p = bucketed[sa].get(bk, 0) / t1
                q = bucketed[sb].get(bk, 0) / t2
                m = (p + q) / 2
                if p > 0:
                    s += p * math.log(p / m)
                if q > 0:
                    s += q * math.log(q / m)
            want = s / 2 / math.log(2)
            assert abs(got[(sa, sb)] - want) < 1e-6
            assert -1e-9 <= got[(sa, sb)] <= 1.0 + 1e-9  # JSD in [0,1] bits


# ---------------------------------------------------------------------------
# Batch D python models — residual / changepoint / trend diagnostics.
# ---------------------------------------------------------------------------


def test_runs_test_matches_python(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_round16 import (
        runs_test_daily,
    )

    daily = _daily(spark, sf_smoke)
    ts = sorted(daily)
    xs = [daily[t] for t in ts]
    med = sorted(xs)[(len(xs) + 1) // 2 - 1]
    seq = [1 if x > med else 0 for x in xs if x != med]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for i in range(1, len(seq))
                   if seq[i] != seq[i - 1]) if seq else 0
    mean_r = 1 + 2 * n1 * n2 / (n1 + n2)
    var_r = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
             / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
    row = runs_test_daily(spark, sf_smoke).collect()[0]
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
    assert abs(row.mean_runs - mean_r) < 1e-6
    assert abs(row.z - (runs - mean_r) / math.sqrt(var_r)) < 1e-6


def test_durbin_watson_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round16 import (
        durbin_watson_daily,
    )

    daily = _daily(spark, sf_smoke)
    ts = sorted(daily)
    xs = [daily[t] for t in ts]
    n = len(ts)
    st, sy = sum(ts), sum(xs)
    stt = sum(t * t for t in ts)
    sty = sum(t * x for t, x in zip(ts, xs))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    e = {t: x - a - b * t for t, x in zip(ts, xs)}
    see = sum(v * v for v in e.values())
    sdd = sum((e[t] - e[t - 1]) ** 2 for t in ts if t - 1 in e)
    row = durbin_watson_daily(spark, sf_smoke).collect()[0]
    assert row.n_days == n
    assert abs(row.ols_slope - b) < 1e-6
    assert abs(row.dw_stat - sdd / see) < 1e-6


def test_pettitt_matches_bruteforce(spark, sf_smoke):
    import math

    from travel_data_pipeline_spark.queries_round16 import (
        pettitt_changepoint,
    )

    daily = _daily(spark, sf_smoke)
    ts = sorted(daily)
    xs = {t: daily[t] for t in ts}
    n = len(ts)

    def sgn(v):
        return (v > 0) - (v < 0)

    best_k, best_t = -1, None
    for ti in ts[:-1]:
        u = sum(sgn(xs[j] - xs[i])
                for i in ts if i <= ti for j in ts if j > ti)
        if abs(u) > best_k:
            best_k, best_t = abs(u), ti
    p = 2.0 * math.exp(-6.0 * best_k ** 2 / (n ** 3 + n ** 2))
    row = pettitt_changepoint(spark, sf_smoke).collect()[0]
    assert (row.n_days, row.t_star, row.k_stat) == (n, best_t, best_k)
    assert abs(row.p_approx - p) < 1e-6


def test_cochran_armitage_matches_python(spark, sf_smoke):
    import math
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        cochran_armitage_trend,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    cnt = defaultdict(lambda: [0, 0])
    for r in (load_table(spark, sf_smoke, "orders")
              .select("o_orderpriority", "o_orderstatus").collect()):
        g = int(r.o_orderpriority[0])
        cnt[g][0] += 1
        if r.o_orderstatus == "F":
            cnt[g][1] += 1
    n = sum(v[0] for v in cnt.values())
    rr = sum(v[1] for v in cnt.values())
    pbar = rr / n
    t_stat = sum(g * (v[1] - v[0] * pbar) for g, v in cnt.items())
    var_t = (pbar * (1 - pbar)
             * (sum(g * g * v[0] for g, v in cnt.items())
                - sum(g * v[0] for g, v in cnt.items()) ** 2 / n))
    row = cochran_armitage_trend(spark, sf_smoke).collect()[0]
    assert (row.n, row.n_success, row.n_groups) == (n, rr, len(cnt))
    assert abs(row.t_stat - t_stat) < 1e-4
    assert abs(row.z - t_stat / math.sqrt(var_t)) < 1e-6


def test_ljung_box_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round16 import (
        _LB_H,
        ljung_box_daily,
    )

    daily = _daily(spark, sf_smoke)
    ts = sorted(daily)
    xs = [daily[t] for t in ts]
    n = len(xs)
    m = sum(xs) / n
    c0 = sum((x - m) ** 2 for x in xs)
    lb = 0.0
    for k in range(1, _LB_H + 1):
        ck = sum((xs[i] - m) * (xs[i + k] - m)
                 for i in range(n - k))
        lb += (ck / c0) ** 2 / (n - k)
    lb *= n * (n + 2)
    row = ljung_box_daily(spark, sf_smoke).collect()[0]
    assert (row.n_days, row.h) == (n, _LB_H)
    assert abs(row.lb_stat - lb) < 1e-5


# ---------------------------------------------------------------------------
# Batch E python models.
# ---------------------------------------------------------------------------


def test_capture_recapture_matches_python(spark, sf_smoke):
    import math
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        capture_recapture_users,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("user_id", "ts").collect())
    d0 = min(r.ts.date() for r in rows)
    seen = defaultdict(lambda: [0, 0])
    for r in rows:
        dd = (r.ts.date() - d0).days
        seen[r.user_id][0 if dd < 15 else 1] = 1
    n_a = sum(v[0] for v in seen.values())
    n_b = sum(v[1] for v in seen.values())
    m = sum(v[0] * v[1] for v in seen.values())
    n_hat = (n_a + 1) * (n_b + 1) / (m + 1) - 1
    se = math.sqrt((n_a + 1) * (n_b + 1) * (n_a - m) * (n_b - m)
                   / ((m + 1) ** 2 * (m + 2)))
    row = capture_recapture_users(spark, sf_smoke).collect()[0]
    assert (row.n_a, row.n_b, row.m, row.n_true) == (
        n_a, n_b, m, len(seen))
    assert abs(row.n_hat_chapman - n_hat) < 1e-5
    assert abs(row.se_chapman - se) < 1e-5
    # Chapman is consistent: estimate should be in the ballpark of the
    # census when overlap is large
    if m > 30:
        assert 0.5 * len(seen) < row.n_hat_chapman < 2.0 * len(seen)


def test_friedman_matches_python(spark, sf_smoke):
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        _FR_K,
        friedman_dow_weeks,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    cnt = defaultdict(int)
    for r in (load_table(spark, sf_smoke, "events")
              .select("ts").collect()):
        d = r.ts.date()
        wk = d.isocalendar()[:2]  # (year, iso week) == Monday truncs
        cnt[(wk, d.isoweekday())] += 1
    weeks = defaultdict(dict)
    for (wk, dow), c in cnt.items():
        weeks[wk][dow] = c
    complete = {wk: m for wk, m in weeks.items() if len(m) == _FR_K}
    n = len(complete)
    r_j = defaultdict(float)
    ssq = 0.0
    for wk, m in complete.items():
        vals = list(m.items())
        ranks = _avg_ranks([v for _, v in vals])
        for (dow, _), rk in zip(vals, ranks):
            r_j[dow] += rk
            ssq += rk * rk
    k = _FR_K
    snum = sum((r - n * (k + 1) / 2) ** 2 for r in r_j.values())
    den = ssq - n * k * (k + 1) ** 2 / 4
    q = n * (k - 1) * snum / den
    row = friedman_dow_weeks(spark, sf_smoke).collect()[0]
    assert (row.n_blocks, row.k) == (n, k)
    assert abs(row.q_stat - q) < 1e-5


def test_rmst_matches_python(spark, sf_smoke):
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        _RMST_TAU,
        rmst_arms,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = [(r.user_id, r.ts.date()) for r in
          load_table(spark, sf_smoke, "events")
          .select("user_id", "ts").collect()]
    days, last = defaultdict(set), {}
    for u, d in ev:
        days[u].add(d)
        last[u] = max(last.get(u, d), d)
    max_day = max(last.values())
    by_arm = defaultdict(list)
    for u in days:
        arm = _md5_long(f"ab:{u}") % 2
        by_arm[arm].append((len(days[u]),
                            1 if last[u] == max_day else 0))
    got = {r.arm: r for r in rmst_arms(spark, sf_smoke).collect()}
    for arm, lives in by_arm.items():
        byt = defaultdict(lambda: [0, 0])
        for t, c in lives:
            byt[t][c] += 1
        n_risk = len(lives)
        s, area, t_prev = 1.0, 0.0, 0
        for t in sorted(byt):
            d, c = byt[t]
            if d > 0 and t <= _RMST_TAU:
                area += s * (t - t_prev)
                s *= 1.0 - d / n_risk
                t_prev = t
            n_risk -= d + c
        area += s * (_RMST_TAU - t_prev)
        r = got[arm]
        assert r.n_users == len(lives)
        assert r.tau == _RMST_TAU
        assert abs(r.rmst - area) < 1e-6


def test_psm_matching_matches_bruteforce(spark, sf_smoke):
    from decimal import Decimal

    from travel_data_pipeline_spark.queries_round16 import (
        _PSM_CALIPER,
        psm_att_matching,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rev = {}
    for r in (load_table(spark, sf_smoke, "orders")
              .select("o_custkey", "o_totalprice").collect()):
        rev[r.o_custkey] = rev.get(r.o_custkey, Decimal(0)) \
            + Decimal(str(round(r.o_totalprice, 2)))
    units = []
    for r in (load_table(spark, sf_smoke, "customer")
              .select("c_custkey", "c_acctbal").collect()):
        units.append((r.c_custkey,
                      _md5_long(f"exp:{r.c_custkey}") % 2,
                      Decimal(str(round(r.c_acctbal, 2))),
                      rev.get(r.c_custkey, Decimal(0))))
    treated = [u for u in units if u[1] == 1]
    controls = [u for u in units if u[1] == 0]
    diffs, dists, unmatched = [], [], 0
    for tk, _, tb, ty in treated:
        cands = [(abs(tb - cb), ck, cy) for ck, _, cb, cy in controls
                 if abs(tb - cb) <= _PSM_CALIPER]
        if not cands:
            unmatched += 1
            continue
        d, _, cy = min(cands)
        diffs.append(ty - cy)
        dists.append(d)
    row = psm_att_matching(spark, sf_smoke).collect()[0]
    assert row.n_treated == len(treated)
    assert row.n_matched == len(diffs)
    assert row.n_unmatched == unmatched
    assert abs(row.att - float(sum(diffs)) / len(diffs)) < 1e-5
    assert abs(row.mean_match_dist
               - float(sum(dists)) / len(dists)) < 1e-5


def test_kcore_matches_python(spark, sf_smoke):
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        _KCORE_KS,
        _N_PEEL,
        kcore_membership,
    )

    edges = _copurchase_edges(spark, sf_smoke)
    adj0 = defaultdict(set)
    for u, v in edges:
        adj0[u].add(v)
        adj0[v].add(u)
    got = {r.k: r for r in kcore_membership(spark, sf_smoke).collect()}
    assert set(got) == set(_KCORE_KS)
    for k in _KCORE_KS:
        surv = set(adj0)
        counts = []
        for _ in range(_N_PEEL):
            deg = {u: len(adj0[u] & surv) for u in surv}
            surv = {u for u in surv if deg[u] >= k}
            counts.append(len(surv))
        r = got[k]
        assert r.n_nodes == len(adj0)
        assert r.n_core_nodes == counts[-1]
        assert r.converged == (counts[-2] == counts[-1])
        # every survivor keeps >= k surviving neighbors if converged
        if r.converged:
            assert all(len(adj0[u] & surv) >= k for u in surv)


# ---------------------------------------------------------------------------
# Batch F python models.
# ---------------------------------------------------------------------------


def test_mrr_brand_promo_matches_python(spark, sf_smoke):
    from collections import Counter, defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        mrr_brand_promo,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    cnt = Counter(r.l_partkey for r in
                  load_table(spark, sf_smoke, "lineitem")
                  .select("l_partkey").collect())
    brands = defaultdict(list)
    for r in (load_table(spark, sf_smoke, "part")
              .select("p_partkey", "p_brand", "p_type").collect()):
        brands[r.p_brand].append(
            (r.p_partkey, cnt.get(r.p_partkey, 0),
             r.p_type.startswith("PROMO")))
    got = {r.brand: r for r in mrr_brand_promo(spark, sf_smoke).collect()}
    rrs = {}
    for b, parts in brands.items():
        promo = [(c, -pk) for pk, c, pos in parts if pos]
        if not promo:
            assert b not in got or got[b].brand == "ALL"
            continue
        bc, npk = max(promo)
        bpk = -npk
        rank = 1 + sum(1 for pk, c, _ in parts
                       if c > bc or (c == bc and pk < bpk))
        rrs[b] = 1.0 / rank
        r = got[b]
        assert r.first_promo_rank == rank, (b, r, rank)
        assert abs(r.reciprocal_rank - 1.0 / rank) < 1e-6
        assert r.n_parts == len(parts)
    mrr = sum(rrs.values()) / len(rrs)
    assert abs(got["ALL"].reciprocal_rank - mrr) < 1e-6
    assert got["ALL"].n_parts == sum(len(v) for v in brands.values())


def test_gumbel_matches_python(spark, sf_smoke):
    import math
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        _GUMBEL_T,
        gumbel_weekly_maxima,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    daily = defaultdict(int)
    for r in (load_table(spark, sf_smoke, "events")
              .select("ts").collect()):
        d = r.ts.date()
        daily[(d.isocalendar()[:2], d)] += 1
    weeks = defaultdict(int)
    for (wk, _), c in daily.items():
        weeks[wk] = max(weeks[wk], c)
    xs = list(weeks.values())
    n = len(xs)
    mean = sum(xs) / n
    var = sum((x - mean) ** 2 for x in xs) / (n - 1)
    beta = math.sqrt(6 * var / math.pi ** 2)
    mu = mean - 0.5772156649015329 * beta
    ret = mu - beta * math.log(-math.log(1 - 1 / _GUMBEL_T))
    row = gumbel_weekly_maxima(spark, sf_smoke).collect()[0]
    assert row.n_blocks == n
    assert abs(row.mean_max - mean) < 1e-6
    assert abs(row.var_max - var) < 1e-5
    assert abs(row.beta - beta) < 1e-5
    assert abs(row.mu - mu) < 1e-5
    assert abs(row.return_level_4wk - ret) < 1e-5
    # Gumbel return level for T>e must sit above the location mu
    assert row.return_level_4wk > row.mu


def test_good_turing_matches_python(spark, sf_smoke):
    import re
    from collections import Counter

    from travel_data_pipeline_spark.queries_round16 import (
        _GT_MAX_R,
        good_turing_smoothing,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    freq = Counter()
    n_tokens = 0
    for r in (load_table(spark, sf_smoke, "documents")
              .select("text").collect()):
        toks = [t for t in
                re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
                if t]
        freq.update(toks)
        n_tokens += len(toks)
    fof = Counter(freq.values())
    got = {r.r: r for r in good_turing_smoothing(spark, sf_smoke)
           .collect()}
    assert set(got) == set(range(1, _GT_MAX_R + 1))
    for r in range(1, _GT_MAX_R + 1):
        row = got[r]
        assert row.n_r == fof.get(r, 0)
        if fof.get(r, 0) and fof.get(r + 1, 0):
            want = (r + 1) * fof[r + 1] / fof[r]
            assert abs(row.r_star - want) < 1e-6
        else:
            assert row.r_star is None
        assert row.n_tokens == n_tokens
        assert row.n_types == len(freq)
        assert abs(row.p0_unseen - fof.get(1, 0) / n_tokens) < 1e-9


def test_wilson_ci_matches_python(spark, sf_smoke):
    import math
    from collections import defaultdict

    from travel_data_pipeline_spark.queries_round16 import (
        wilson_ci_conversion,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("user_id", "event_type").collect())
    buyers = {r.user_id for r in rows if r.event_type == "purchase"}
    per_type = defaultdict(set)
    for r in rows:
        per_type[r.event_type].add(r.user_id)
    got = {r.event_type: r for r in
           wilson_ci_conversion(spark, sf_smoke).collect()}
    z = 1.96
    for t, users in per_type.items():
        n, x = len(users), len(users & buyers)
        p = x / n
        half = z * z / (2 * n)
        rad = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        den = 1 + z * z / n
        r = got[t]
        assert (r.n_users, r.n_converted) == (n, x)
        assert abs(r.p_hat - p) < 1e-6
        assert abs(r.wilson_lo - (p + half - rad) / den) < 1e-6
        assert abs(r.wilson_hi - (p + half + rad) / den) < 1e-6
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0


def test_page_hinkley_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round16 import (
        page_hinkley_drift,
    )

    daily = _daily(spark, sf_smoke)
    ts = sorted(daily)
    s = 0
    m = minm = 0.0
    maxph, argmax = 0.0, ts[0]
    for i, t in enumerate(ts, 1):
        s += daily[t]
        m += daily[t] - s / i
        if i == 1:
            minm = m
        minm = min(minm, m)
        ph = m - minm
        if ph > maxph:
            maxph, argmax = ph, t
    row = page_hinkley_drift(spark, sf_smoke).collect()[0]
    assert row.n_days == len(ts)
    assert abs(row.ph_final - (m - minm)) < 1e-6
    assert abs(row.ph_max - maxph) < 1e-6
    assert row.drift_day == argmax
