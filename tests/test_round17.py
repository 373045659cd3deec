"""Round-12 tests: IVF auto routing (VERDICT r11 #1).

``assign_clusters(impl='auto')`` / ``ivf_topk(assign_impl='auto')``
route the index build to the certified Arrow assign when the
corpus-size probe says the expr fold would dominate (n_vec x n_cent x
dim fold elements over AUTO_ASSIGN_FOLD_ELEMENTS), else stay on the
zero-overhead expr spelling. The two impls are pinned bit-identical by
tests/test_round16.py, so these tests cover the ROUTING seam: the pure
decision function, the probe wiring, and that a forced-arrow route
still reproduces expr rows exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from travel_data_pipeline_spark.operators import similarity as S
from travel_data_pipeline_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _fixtures(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = (emb.filter(F.col("vec_id") % 50 == 0)
             .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    return emb, cents


def _canon(rows):
    return sorted((r[0], r[1], repr(r[2])) for r in rows)


def test_route_assign_impl_decision():
    # sf0.001-shaped build: tiny -> expr
    assert S.route_assign_impl(600, 12, 64) == "expr"
    # the stress_ann-shaped build (2M x 64 x 256 = 3.3e10) -> arrow
    assert S.route_assign_impl(2_000_000, 64, 256) == "arrow"
    # threshold is exclusive: exactly at the boundary stays expr
    assert S.route_assign_impl(S.AUTO_ASSIGN_FOLD_ELEMENTS, 1, 1) == "expr"
    assert S.route_assign_impl(S.AUTO_ASSIGN_FOLD_ELEMENTS + 1, 1, 1) == "arrow"
    # custom threshold flows through
    assert S.route_assign_impl(10, 10, 10, threshold=999) == "arrow"


def test_probe_assign_route_small_corpus(spark):
    emb, cents = _fixtures(spark)
    assert S._probe_assign_route(emb, cents, "embedding") == "expr"


def test_assign_clusters_auto_equals_expr(spark):
    emb, cents = _fixtures(spark)
    auto = S.assign_clusters(emb, cents, impl="auto").collect()
    expr = S.assign_clusters(emb, cents, impl="expr").collect()
    assert _canon(auto) == _canon(expr)


def test_assign_clusters_auto_forced_arrow_equals_expr(spark, monkeypatch):
    """When the probe says 'arrow', the auto path must still be
    row-identical to expr (bit-parity certified in test_round16; this
    asserts the routing wiring actually reaches the arrow impl)."""
    emb, cents = _fixtures(spark)
    monkeypatch.setattr(S, "_probe_assign_route",
                        lambda *a, **k: "arrow")
    # assert the routing seam directly (ADVICE r12): record that the
    # arrow impl was actually invoked instead of grepping a private
    # Py4J plan rendering that varies across Spark versions
    called = {}
    real_arrow = S._assign_clusters_arrow

    def spy(*a, **k):
        called["arrow"] = True
        return real_arrow(*a, **k)

    monkeypatch.setattr(S, "_assign_clusters_arrow", spy)
    auto = S.assign_clusters(emb, cents, impl="auto")
    assert called.get("arrow") is True
    expr = S.assign_clusters(emb, cents, impl="expr").collect()
    assert _canon(auto.collect()) == _canon(expr)


def test_ivf_topk_default_is_auto(spark):
    """ivf_topk's default assign_impl is 'auto' (VERDICT r11 #1): on a
    small corpus it routes to expr and matches the pinned-expr result
    exactly."""
    emb, cents = _fixtures(spark)
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    default = S.ivf_topk(emb, cents, queries, k=5, n_probe=2).collect()
    pinned = S.ivf_topk(emb, cents, queries, k=5, n_probe=2,
                        assign_impl="expr").collect()
    key = lambda rows: sorted((r.query_id, r.neighbor_id,
                               repr(r.cosine_sim), r.rnk) for r in rows)
    assert key(default) == key(pinned)


def test_assign_clusters_bad_impl_raises(spark):
    emb, cents = _fixtures(spark)
    with pytest.raises(ValueError, match="impl must be"):
        S.assign_clusters(emb, cents, impl="gpu")
