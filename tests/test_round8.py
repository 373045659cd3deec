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


def test_bpe_apply_learned_totals_consistent(spark, sf_smoke):
    """Application counts must reconcile exactly with the token-total
    drops, counts are non-negative, and ranks are contiguous from 1
    (the train loop's argmax always exists on this corpus)."""
    from travel_data_pipeline_spark.queries_round8 import bpe_apply_learned

    rows = sorted(bpe_apply_learned(spark, sf_smoke).collect(),
                  key=lambda r: r.merge_rank)
    assert [r.merge_rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows, "training corpus produced no merges"
    for prev, cur in zip(rows, rows[1:]):
        assert (prev.heldout_tokens_after - cur.n_applied_heldout
                == cur.heldout_tokens_after)
    for r in rows:
        assert r.n_train_pairs > 0
        assert r.n_applied_heldout >= 0
        assert " " in r.pair and "▁" not in r.pair.split(" ")[0][:0]
