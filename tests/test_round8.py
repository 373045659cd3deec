"""Round-8 candidate queries (authored round 7) — invariants the
oracle comparison can't see: recall monotonicity, grid completeness."""

from __future__ import annotations

from travel_data_pipeline_spark.queries_round8 import (
    _RECALL_KS,
    _RECALL_PROBES,
    ivf_recall_at_k,
)


def test_ivf_recall_monotone_in_n_probe(spark, sf_smoke):
    """More probed clusters only ADD candidates, and truth@k members
    stay in the top-k of any candidate subset containing them (the
    ranking is one total order), so ivf_exact recall is weakly
    monotone in n_probe for every k. The int8_rerank path's top-20
    keep is not set-monotone, so it is only pinned to the [0,1] range
    and the full grid."""
    rows = ivf_recall_at_k(spark, sf_smoke).collect()
    by_path: dict[str, dict[tuple[int, int], float]] = {}
    for r in rows:
        by_path.setdefault(r.path, {})[(r.k, r.n_probe)] = r.recall_at_k
    assert set(by_path) == {"ivf_exact", "int8_rerank"}
    grid = {(k, p) for k in _RECALL_KS for p in _RECALL_PROBES}
    for path, cells in by_path.items():
        assert set(cells) == grid, path
        assert all(0.0 <= v <= 1.0 for v in cells.values()), path
    ivf = by_path["ivf_exact"]
    for k in _RECALL_KS:
        seq = [ivf[(k, p)] for p in sorted(_RECALL_PROBES)]
        assert seq == sorted(seq), (k, seq)
    # the audit must certify something: probing 4 of ~10 clusters has
    # to beat probing 1 somewhere on this corpus, else the grid is
    # degenerate and the query measures nothing
    assert any(ivf[(k, max(_RECALL_PROBES))] > ivf[(k, min(_RECALL_PROBES))]
               for k in _RECALL_KS)
