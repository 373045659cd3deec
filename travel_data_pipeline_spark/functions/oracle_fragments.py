"""Shared DuckDB oracle SQL fragments used by more than one queries
module. LEAF module — must not import the registry or any queries_*
module, so any queries module can import it at decoration time without
re-entering the registry's import chain (the circular-import seam that
broke direct `import queries_round8` / `import queries_northstar`)."""

from __future__ import annotations

# Symmetric per-vector int8 quantization of the embeddings table —
# mirrors operators/ml.quantize_int8 (scale = max|x|/127, clamp to
# [-127, 127], HALF_UP round): q8 computes the guarded scale, quant
# the int vector alongside the full-precision one.
Q8_CTE = """
q8 AS (
    SELECT vec_id, v,
           CASE WHEN list_max(list_transform(v, x -> abs(x))) / 127.0 = 0.0
                THEN 1.0
                ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
           END AS scale
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
),
quant AS (
    SELECT vec_id, v, scale,
           list_transform(v, x -> CAST(greatest(-127.0,
               least(127.0, round(x / scale, 0))) AS INT)) AS qv
    FROM q8
)"""

# Exact int8 dot product between a.qv and b.qv (64-dim embeddings) —
# integer arithmetic, order-independent, engine-deterministic.
INT_DOT = ("list_reduce(list_transform(generate_series(1, 64), "
           "i -> CAST(a.qv[i] AS BIGINT) * b.qv[i]), (x, y) -> x + y)")
