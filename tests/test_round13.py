"""Round-13 candidate queries (authored round 9) — python models and
invariants the oracle comparison can't see (shared-blind-spot guard:
the models below recompute the statistics independently, including a
brute-force dominance check for the skyline)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F  # noqa: F401  (fixture parity)


def _md5_arm(salt: str, key: int) -> int:
    h = hashlib.md5(f"{salt}{key}".encode()).hexdigest()
    return int(h[:15], 16) % 2


def test_srm_audit_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round11 import _PLACEBO_SALTS
    from travel_data_pipeline_spark.queries_round13 import (
        srm_assignment_audit,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    keys = [r.c_custkey
            for r in load_table(spark, sf_smoke, "customer")
            .select("c_custkey").collect()]
    got = {r.assignment: r
           for r in srm_assignment_audit(spark, sf_smoke).collect()}
    assert set(got) == {label for label, _ in _PLACEBO_SALTS}
    for label, salt in _PLACEBO_SALTS:
        n1 = sum(_md5_arm(salt, k) for k in keys)
        n0 = len(keys) - n1
        chi2 = (n0 - n1) ** 2 / len(keys)
        row = got[label]
        assert (row.n_ctrl, row.n_treat) == (n0, n1)
        assert abs(row.chi2 - chi2) < 1e-6
        # an md5 split is designed 50/50: no salt should flag at a
        # real scale factor
        assert row.status == ("srm" if chi2 > 3.841458820694124 else "ok")


def test_ucb_scores_match_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import ucb_arm_scores
    from travel_data_pipeline_spark.sources.readers import load_table

    ev = [(r.event_type, round(r.value, 6))
          for r in load_table(spark, sf_smoke, "events")
          .select("event_type", "value").collect()]
    arms = defaultdict(lambda: [0, 0.0])
    for t, v in ev:
        arms[t][0] += 1
        arms[t][1] += v
    big_n = len(ev)
    ref = {}
    for t, (n, s) in arms.items():
        mean = s / n
        ref[t] = (n, mean, mean + math.sqrt(2 * math.log(big_n) / n))
    best = max(v[2] for v in ref.values())
    got = {r.event_type: r
           for r in ucb_arm_scores(spark, sf_smoke).collect()}
    assert set(got) == set(ref)
    n_pull = 0
    for t, (n, mean, ucb) in ref.items():
        row = got[t]
        assert row.n_pulls == n
        assert abs(row.mean_reward - mean) < 1e-5
        assert abs(row.ucb_score - ucb) < 1e-5
        if row.next_action == "pull":
            n_pull += 1
            assert abs(ucb - best) < 1e-5
    assert n_pull >= 1  # exactly one unless rounded ties
    # fewer pulls observed => strictly larger exploration bonus
    by_n = sorted(ref.items(), key=lambda kv: kv[1][0])
    for (_, (n_a, m_a, u_a)), (_, (n_b, m_b, u_b)) in zip(
            by_n, by_n[1:]):
        if n_a < n_b:
            assert (u_a - m_a) > (u_b - m_b)


def test_beta_binomial_posterior_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import (
        bayes_beta_binomial_arms,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("user_id", "event_type").collect())
    conv = defaultdict(int)
    seen = set()
    for r in rows:
        seen.add(r.user_id)
        if r.event_type == "purchase":
            conv[r.user_id] = 1
    per_arm = {0: [0, 0], 1: [0, 0]}
    for u in seen:
        a = _md5_arm("exp:", u)
        per_arm[a][0] += 1
        per_arm[a][1] += conv[u]
    got = {r.arm: r for r in bayes_beta_binomial_arms(spark,
                                                      sf_smoke).collect()}
    assert set(got) == {0, 1}
    for a, (n, c) in per_arm.items():
        row = got[a]
        assert (row.n_users, row.n_converted) == (n, c)
        assert (row.alpha, row.beta) == (1 + c, 1 + n - c)
        al, be = 1 + c, 1 + n - c
        mean = al / (al + be)
        var = al * be / ((al + be) ** 2 * (al + be + 1))
        assert abs(row.post_mean - mean) < 1e-6
        assert abs(row.post_sd - math.sqrt(var)) < 1e-6
        # posterior mean lives strictly inside (0, 1)
        assert 0.0 < row.post_mean < 1.0


def test_skyline_is_exactly_the_undominated_set(spark, sf_smoke):
    """Brute-force O(n^2) dominance over the full part table must
    reproduce the staircase output exactly — the python model checks
    the SEMANTICS, not the algorithm."""
    from travel_data_pipeline_spark.queries_round13 import (
        skyline_pareto_front,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    parts = [(r.p_partkey, r.p_retailprice, r.p_size)
             for r in load_table(spark, sf_smoke, "part")
             .select("p_partkey", "p_retailprice", "p_size").collect()]
    undominated = set()
    for k, price, size in parts:
        dominated = any(
            (q_price <= price and q_size >= size
             and (q_price < price or q_size > size))
            for _, q_price, q_size in parts)
        if not dominated:
            undominated.add(k)
    got = {r.p_partkey for r in skyline_pareto_front(spark,
                                                     sf_smoke).collect()}
    assert got == undominated and len(got) >= 1


def _norm_words(text: str) -> list[str]:
    import re

    return [w for w in re.sub(r"\s+", " ", text.lower()).strip().split(" ")]


def test_lexical_diversity_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import (
        lexical_diversity_by_source,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    docs = [(r.source, r.text)
            for r in load_table(spark, sf_smoke, "documents")
            .select("source", "text").collect()]
    freq = defaultdict(lambda: defaultdict(int))
    for src, text in docs:
        for w in _norm_words(text):
            if w:
                freq[src][w] += 1
    got = {r.source: r
           for r in lexical_diversity_by_source(spark, sf_smoke).collect()}
    assert set(got) == set(freq)
    for src, tf in freq.items():
        n_tokens = sum(tf.values())
        n_types = len(tf)
        n_hapax = sum(1 for c in tf.values() if c == 1)
        simpson = (sum(c * (c - 1) for c in tf.values())
                   / (n_tokens * (n_tokens - 1)))
        row = got[src]
        assert (row.n_tokens, row.n_types, row.n_hapax) == (
            n_tokens, n_types, n_hapax)
        assert abs(row.ttr - n_types / n_tokens) < 1e-6
        assert abs(row.hapax_share - n_hapax / n_types) < 1e-6
        assert abs(row.simpson_repeat - simpson) < 1e-6


def test_char_entropy_flags_match_python(spark, sf_smoke):
    import re

    from travel_data_pipeline_spark.queries_round13 import (
        char_entropy_flags,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    docs = [(r.source, r.text)
            for r in load_table(spark, sf_smoke, "documents")
            .select("source", "text").collect()]
    per_source = defaultdict(list)
    for src, text in docs:
        norm = re.sub(r"\s+", " ", text.lower()).strip()
        counts = defaultdict(int)
        for ch in norm:
            counts[ch] += 1
        n = sum(counts.values())
        if n <= 1:
            h = 0.0
        else:
            h = math.log(n) - sum(c * math.log(c)
                                  for c in counts.values()) / n
        per_source[src].append(h)
    got = {r.source: r
           for r in char_entropy_flags(spark, sf_smoke).collect()}
    assert set(got) == set(per_source)
    for src, hs in per_source.items():
        row = got[src]
        n_low = sum(1 for h in hs if h < 2.5)
        assert row.n_docs == len(hs)
        assert row.n_low_entropy == n_low
        assert abs(row.min_entropy - min(hs)) < 1e-6
        assert abs(row.max_entropy - max(hs)) < 1e-6
        # natural-language corpus: character entropy must be sane
        assert 0.0 <= row.max_entropy < math.log(128)


def test_kn_bigram_ppl_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import kn_bigram_ppl
    from travel_data_pipeline_spark.sources.readers import load_table

    docs = [(r.doc_id, _norm_words(r.text))
            for r in load_table(spark, sf_smoke, "documents")
            .select("doc_id", "text").collect()]
    D = 0.75
    bg = defaultdict(int)
    ctx_n = defaultdict(int)
    fwd = defaultdict(set)
    back = defaultdict(set)
    for _, ws in docs:
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] += 1
            ctx_n[a] += 1
            fwd[a].add(b)
            back[b].add(a)
    n_types = len(bg)
    got = {r.doc_id: r for r in kn_bigram_ppl(spark, sf_smoke).collect()}
    for doc_id, ws in docs:
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert doc_id not in got
            continue
        total = 0.0
        for a, b in pairs:
            p = ((max(bg[(a, b)] - D, 0.0)
                  + D * len(fwd[a]) * (len(back[b]) / n_types))
                 / ctx_n[a])
            total += -math.log(p)
        ppl = math.exp(total / len(pairs))
        row = got[doc_id]
        assert row.n_bigrams == len(pairs)
        assert abs(row.kn_ppl - ppl) < max(1e-4, ppl * 1e-6)
    # KN must be a proper distribution-ish score: ppl >= 1 everywhere
    assert all(r.kn_ppl >= 1.0 for r in got.values())


def test_ams_f2_matches_python_sketch(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import (
        _AMS_K,
        ams_f2_join_size,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    users = defaultdict(int)
    for r in (load_table(spark, sf_smoke, "events")
              .select("user_id").collect()):
        users[r.user_id] += 1
    f2 = sum(c * c for c in users.values())

    def sign(j: int, u: int) -> int:
        h = hashlib.md5(f"ams{j}:{u}".encode()).hexdigest()
        return 1 - 2 * (int(h[:15], 16) % 2)

    ests = []
    for g in range(_AMS_K // 4):
        tot = 0
        for j in range(4 * g, 4 * g + 4):
            x = sum(sign(j, u) * c for u, c in users.items())
            tot += x * x
        ests.append(tot / 4)
    ests.sort()
    est = (ests[1] + ests[2]) / 2
    row = ams_f2_join_size(spark, sf_smoke).first()
    assert row.exact_f2 == f2
    assert abs(row.est_f2 - est) < 1e-6
    assert abs(row.rel_err - abs(est - f2) / f2) < 1e-6
    # an unbiased 16-counter sketch should land within ~3 sigma
    # (sd ~ sqrt(2/4)*F2 per group, median-of-means tightens it);
    # loose sanity bound only
    assert row.rel_err < 2.0


def test_matrix_profile_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import (
        _MP_M,
        matrix_profile_motifs,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    days = [r.d for r in
            (load_table(spark, sf_smoke, "events")
             .select(F.col("ts").cast("date").alias("d")).collect())]
    d0 = min(days)
    dd = (max(days) - d0).days + 1
    counts = [0] * dd
    for d in days:
        counts[(d - d0).days] += 1
    n_sub = dd - _MP_M + 1
    ref = {}
    for i in range(n_sub):
        best = None
        for j in range(n_sub):
            if abs(i - j) < _MP_M:
                continue
            d2 = sum((counts[i + k] - counts[j + k]) ** 2
                     for k in range(_MP_M))
            if best is None or (d2, j) < best:
                best = (d2, j)
        ref[i] = best
    lo = min(v[0] for v in ref.values())
    hi = max(v[0] for v in ref.values())
    got = {r.start_day: r
           for r in matrix_profile_motifs(spark, sf_smoke).collect()}
    assert len(got) == n_sub
    from datetime import timedelta

    for i, (d2, j) in ref.items():
        row = got[(d0 + timedelta(days=i)).strftime("%Y-%m-%d")]
        assert row.d2 == d2
        assert row.nn_day == (d0 + timedelta(days=j)).strftime("%Y-%m-%d")
        assert abs(row.dist - math.sqrt(d2)) < 1e-6
        want = ("motif" if d2 == lo
                else "discord" if d2 == hi else "normal")
        assert row.role == want
    assert any(r.role == "motif" for r in got.values())
    assert any(r.role == "discord" for r in got.values())


def test_clustering_depth_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import (
        _CD_FILE_ROWS,
        clustering_depth_audit,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    orders = [(r.o_orderkey, r.o_totalprice)
              for r in load_table(spark, sf_smoke, "orders")
              .select("o_orderkey", "o_totalprice").collect()]

    def md5l(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    layouts = {
        "natural": sorted(orders, key=lambda t: t[0]),
        "sorted": sorted(orders, key=lambda t: (t[1], t[0])),
        "hashed": sorted(orders, key=lambda t: (md5l(f"cd:{t[0]}"), t[0])),
    }
    got = {r.layout: r
           for r in clustering_depth_audit(spark, sf_smoke).collect()}
    assert set(got) == set(layouts)
    for label, rows in layouts.items():
        zones = []
        for s in range(0, len(rows), _CD_FILE_ROWS):
            chunk = [v for _, v in rows[s:s + _CD_FILE_ROWS]]
            zones.append((min(chunk), max(chunk)))
        depths = [sum(1 for (glo, ghi) in zones if glo <= lo <= ghi)
                  for (lo, _) in zones]
        row = got[label]
        assert row.n_files == len(zones)
        assert row.max_depth == max(depths)
        assert abs(row.avg_depth - sum(depths) / len(depths)) < 1e-6
        share1 = sum(1 for d in depths if d == 1) / len(depths)
        assert abs(row.share_depth1 - share1) < 1e-6
    # semantics: a value-sorted layout must be (weakly) shallower than
    # the hashed one
    assert got["sorted"].avg_depth <= got["hashed"].avg_depth


def test_silhouette_matches_pure_python_kmeans(spark, sf_smoke):
    """Independent python Lloyd's (same deterministic init / 6-dp
    centroid rounding contract) -> simplified silhouette; guards the
    whole kmeans+silhouette chain against shared Spark/SQL blind
    spots."""
    from travel_data_pipeline_spark.queries_ml import _ITERS, _K
    from travel_data_pipeline_spark.queries_round13 import (
        silhouette_by_cluster,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    pts = sorted((r.vec_id, [float(x) for x in r.embedding])
                 for r in load_table(spark, sf_smoke, "embeddings")
                 .select("vec_id", "embedding").collect())
    cent = {i: v[:] for i, (_, v) in enumerate(pts[:_K])}

    def dist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return math.sqrt(acc)

    def assign():
        out = {}
        for vid, v in pts:
            out[vid] = min((dist(v, cv), cid)
                           for cid, cv in cent.items())
        return out

    a = assign()
    for _ in range(_ITERS - 1):
        groups = defaultdict(list)
        for vid, v in pts:
            groups[a[vid][1]].append(v)
        cent = {cid: [round(sum(col) / len(col), 6)
                      for col in zip(*vs)]
                for cid, vs in groups.items()}
        a = assign()

    # final centroids from the final assignment
    groups = defaultdict(list)
    for vid, v in pts:
        groups[a[vid][1]].append(v)
    cfin = {cid: [round(sum(col) / len(col), 6) for col in zip(*vs)]
            for cid, vs in groups.items()}
    per_cluster = defaultdict(list)
    for vid, v in pts:
        da, cid = a[vid]
        b = min(dist(v, cv) for c2, cv in cfin.items() if c2 != cid)
        s = 0.0 if max(da, b) == 0 else (b - da) / max(da, b)
        per_cluster[cid].append(round(s, 6))
    got = {r.cluster: r
           for r in silhouette_by_cluster(spark, sf_smoke).collect()}
    assert set(got) == set(per_cluster)
    for cid, ss in per_cluster.items():
        row = got[cid]
        assert row.n == len(ss)
        assert abs(row.mean_silhouette - sum(ss) / len(ss)) < 1e-5
        assert abs(row.min_silhouette - min(ss)) < 1e-6
        neg = sum(1 for s in ss if s < 0) / len(ss)
        assert abs(row.share_negative - neg) < 1e-6


def test_shapley_matches_python_and_is_efficient(spark, sf_smoke):
    """Independent python Shapley over the same coalition-value
    definition, plus the efficiency axiom: sum(phi) = v(N) - v(empty)."""
    from itertools import combinations

    from travel_data_pipeline_spark.queries_round13 import (
        _SHAP_CHANNELS,
        shapley_channel_attribution,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("user_id", "event_type", "ts").collect())
    first_p = {}
    for r in rows:
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    users = defaultdict(lambda: [set(), 0])
    for r in rows:
        u = users[r.user_id]
        if r.event_type == "purchase":
            u[1] = 1
        elif r.event_type in _SHAP_CHANNELS:
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                u[0].add(r.event_type)

    def v(S):
        sel = [conv for touched, conv in users.values()
               if touched <= set(S)]
        return sum(sel) / len(sel) if sel else 0.0

    n = len(_SHAP_CHANNELS)
    fact = math.factorial
    phi = {}
    for i, c in enumerate(_SHAP_CHANNELS):
        others = [x for x in _SHAP_CHANNELS if x != c]
        tot = 0.0
        for size in range(n):
            for S in combinations(others, size):
                w = fact(size) * fact(n - size - 1) / fact(n)
                tot += w * (v(S + (c,)) - v(S))
        phi[c] = tot
    got = {r.channel: r.shapley
           for r in shapley_channel_attribution(spark, sf_smoke).collect()}
    assert set(got) == set(phi)
    for c in phi:
        assert abs(got[c] - phi[c]) < 1e-5
    # efficiency: contributions sum to v(N) - v(empty)
    assert abs(sum(phi.values())
               - (v(_SHAP_CHANNELS) - v(()))) < 1e-9


def test_qini_matches_python(spark, sf_smoke):
    from travel_data_pipeline_spark.queries_round13 import (
        _QINI_BINS,
        qini_uplift_deciles,
    )
    from travel_data_pipeline_spark.sources.readers import load_table

    rows = (load_table(spark, sf_smoke, "events")
            .select("user_id", "event_type", "ts").collect())
    first_p = {}
    for r in rows:
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    users = defaultdict(lambda: [0, 0])
    for r in rows:
        u = users[r.user_id]
        if r.event_type == "purchase":
            u[1] = 1
        elif r.event_type == "click":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                u[0] += 1
    ranked = sorted(
        ((uid, sc, cv, _md5_arm("exp:", uid))
         for uid, (sc, cv) in users.items()),
        key=lambda t: (-t[1], t[0]))
    n = len(ranked)
    dec = defaultdict(lambda: [0, 0, 0, 0])  # n, n_t, c_t, c_c
    for rk, (uid, sc, cv, tr) in enumerate(ranked):
        d = (rk * _QINI_BINS) // n
        cell = dec[d]
        cell[0] += 1
        cell[1] += tr
        if tr:
            cell[2] += cv
        else:
            cell[3] += cv
    got = {r.decile: r for r in qini_uplift_deciles(spark,
                                                    sf_smoke).collect()}
    assert set(got) == set(dec)
    cn = ct = cc = cnt_t = 0
    for d in sorted(dec):
        n_u, n_t, c_t, c_c = dec[d]
        cn += n_u - n_t
        cnt_t += n_t
        ct += c_t
        cc += c_c
        row = got[d]
        assert (row.cum_n_treat, row.cum_n_ctrl) == (cnt_t, cn)
        assert (row.cum_conv_treat, row.cum_conv_ctrl) == (ct, cc)
        want = ct - cc * cnt_t / cn if cn else None
        if want is None:
            assert row.qini is None
        else:
            assert abs(row.qini - want) < 1e-6
    # last decile qini = overall uplift estimate; curve covers all users
    assert got[max(got)].cum_n_treat + got[max(got)].cum_n_ctrl == n


def test_bigram_queries_skip_short_docs(spark, tmp_path):
    """ADVICE r09: empty/one-word docs made F.sequence(1, size-1)
    descend to [1, 0] and element_at(words, 0) throw under ANSI,
    while the DuckDB oracle's generate_series(1, 0) is empty. Both
    bigram queries must now SKIP those docs, not crash."""
    import travel_data_pipeline_spark.registry  # noqa: F401  (import order)
    from travel_data_pipeline_spark.queries_cleaning import (
        bigram_lm_perplexity,
    )
    from travel_data_pipeline_spark.queries_round13 import kn_bigram_ppl

    rows = [
        (1, "", "en", "web", 0),
        (2, "one", "en", "web", 3),
        (3, "   ", "en", "web", 3),          # whitespace-only -> [""]
        (4, "two words here", "en", "web", 14),
        (5, "two words again", "en", "web", 15),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet"))

    kn = {r.doc_id: r for r in kn_bigram_ppl(spark, str(tmp_path)).collect()}
    lm = {r.doc_id: r
          for r in bigram_lm_perplexity(spark, str(tmp_path)).collect()}
    assert set(kn) == {4, 5} and set(lm) == {4, 5}
    assert all(r.n_bigrams == 2 for r in kn.values())
    assert all(r.ppl >= 1.0 for r in lm.values())
