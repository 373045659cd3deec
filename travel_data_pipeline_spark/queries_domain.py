"""Domain-pipeline queries (reference-semantics golden ops).

Filled by the exchange / trends / flights plan recompositions — each
pins the reference's exact edge semantics (epsilon growth, clamps,
NaN asymmetry, EUR fan-out) against inline VALUES fixtures so the
DuckDB oracle can replay them.
"""
