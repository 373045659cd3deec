"""Distributed ML primitives over the embeddings table — Lloyd's
k-means as an unrolled declarative DAG and int8 vector quantization.

Scale design
------------
- k-means never collects points or centroids: each Lloyd iteration is
  (broadcast k centroids) x (one pass over the points) -> assignment,
  then one posexplode + two-level hash aggregation for the update.
  Iterations are *unrolled into one logical plan*, so Catalyst sees the
  whole DAG; at cluster scale each iteration is one shuffle of
  (k x dim) partial sums — independent of the corpus size.
- Distances are sequential left folds over the vector (`aggregate` over
  `zip_with`) so the DuckDB oracle (`list_reduce` over
  `list_transform`) reproduces them bit-for-bit; centroid coordinates
  are rounded to 6 dp after every update so the floating avg (whose
  summation order IS engine-dependent) re-converges to identical
  inputs on both sides.
- Quantization is a pure per-row projection — no shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_vec(vec: Column) -> Column:
    return vec.cast("array<double>")


def squared_l2(v: Column, c: Column) -> Column:
    """Sequential left-fold sum of squared differences (deterministic
    per-row; matches DuckDB's list_reduce fold order)."""
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_init(points: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """Deterministic init: the k points with smallest id become
    centroids 0..k-1. The limit(k) relation is tiny — the single
    partition window over it is k rows, not a scale concern."""
    seed = points.orderBy(id_col).limit(k)
    w = Window.orderBy(id_col)
    return seed.select(
        (F.row_number().over(w) - 1).cast("int").alias("cid"),
        F.col(vec_col).alias("cv"))


def kmeans_assign(points: DataFrame, centroids: DataFrame,
                  id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """One assignment pass with ZERO shuffle: the k centroids collapse
    into a single 1-row array (collect_list of (cid, vector) structs),
    broadcast to every task; the argmin is then a per-row array_min
    over (dist, cid) structs — lexicographic struct comparison gives
    the min distance with ties broken by smallest cid, independent of
    the collect_list order. No row expansion, no window sort: at
    cluster scale each Lloyd assignment is a pure projection over the
    points. Returns id, vector, cid, dist."""
    carr = centroids.agg(
        F.collect_list(F.struct("cid", "cv")).alias("cs"))
    best = F.array_min(F.transform(
        F.col("cs"),
        lambda c: F.struct(
            F.sqrt(squared_l2(F.col(vec_col), c["cv"])).alias("d"),
            c["cid"].alias("cid"))))
    return (points.crossJoin(F.broadcast(carr))
            .select(id_col, vec_col,
                    best["cid"].alias("cid"), best["d"].alias("d")))


def kmeans_update(assigned: DataFrame, vec_col: str = "v",
                  decimals: int = 6) -> DataFrame:
    """Centroid update: element-wise mean via posexplode + two-level
    hash agg (map-side partials shrink the shuffle to k x dim rows),
    coordinates rounded so both engines continue from identical
    doubles."""
    per_coord = (assigned
                 .select("cid", F.posexplode(vec_col).alias("i", "val"))
                 .groupBy("cid", "i")
                 .agg(F.round(F.avg("val"), decimals).alias("val")))
    return (per_coord
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "val"))).alias("s"))
            .select("cid", F.transform("s", lambda e: e["val"]).alias("cv")))


def kmeans(points: DataFrame, k: int, iterations: int,
           id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """Lloyd's k-means, iterations unrolled into one declarative plan.

    Returns the final assignment (id, cid, dist). ``iterations`` is the
    number of assignment passes; centroid updates run between them.
    """
    cent = kmeans_init(points, k, id_col, vec_col)
    assigned = kmeans_assign(points, cent, id_col, vec_col)
    for _ in range(iterations - 1):
        cent = kmeans_update(assigned, vec_col)
        assigned = kmeans_assign(points, cent, id_col, vec_col)
    return assigned


def quantize_int8(vec: Column) -> tuple[Column, Column, Column, Column]:
    """Symmetric per-vector int8 quantization.

    Returns (scale, quantized ints, n_clipped, mean_abs_err). ``scale``
    uses exact (order-independent) max-abs; the error term is a
    sequential fold, deterministic per-row.
    """
    scale_raw = F.array_max(F.transform(vec, F.abs)) / F.lit(127.0)
    scale = F.when(scale_raw == 0.0, F.lit(1.0)).otherwise(scale_raw)
    levels = F.transform(vec, lambda x: F.round(x / scale))
    q = F.transform(levels,
                    lambda l: F.greatest(F.lit(-127.0), F.least(F.lit(127.0), l))
                    .cast("int"))
    n_clipped = F.size(F.filter(levels, lambda l: F.abs(l) > 127))
    err = F.aggregate(
        F.zip_with(vec, q, lambda x, qi: F.abs(x - qi.cast("double") * scale)),
        F.lit(0.0), lambda acc, x: acc + x) / F.size(vec)
    return scale, q, n_clipped, err


def pca_top_component_by_label(emb: DataFrame, dim: int,
                               id_col: str = "vec_id",
                               vec_col: str = "v",
                               label_col: str = "label") -> DataFrame:
    """Per-label top principal component of the embedding cloud via
    grouped applyInPandas — the batch half of the sanctioned pandas
    surface (SURVEY.md §2.9; the streaming half is
    applyInPandasWithState). Eigen-decomposition is genuinely
    non-SQL-expressible, so this query carries a rows-only driver
    check; tests/test_ml.py asserts the numbers against numpy run
    directly on the same vectors.

    Scale: one shuffle on the label key; each group's work is
    O(n_label * dim^2) covariance + one O(dim^3) eig in C (numpy),
    with Arrow moving columnar batches. Output is dim+2 doubles per
    label. Sign convention: each eigenvector is flipped so its
    largest-|coordinate| entry is positive (eigenvectors are
    sign-ambiguous; pinning it makes results rerun-stable).
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField(label_col, T.IntegerType()),
        T.StructField("n_vecs", T.LongType()),
        T.StructField("top_eigenvalue", T.DoubleType()),
        T.StructField("explained_ratio", T.DoubleType()),
        T.StructField("component_head", T.ArrayType(T.DoubleType())),
    ])

    # self-contained closure: executors may not have this repo on path
    def pca(pdf):
        import numpy as np
        import pandas as pd

        x = np.vstack(pdf[vec_col].to_numpy())
        n = x.shape[0]
        c = np.cov(x, rowvar=False, bias=False)
        vals, vecs = np.linalg.eigh(c)
        top = vals[-1]
        comp = vecs[:, -1]
        if comp[np.argmax(np.abs(comp))] < 0:
            comp = -comp
        return pd.DataFrame({
            label_col: [int(pdf[label_col].iloc[0])],
            "n_vecs": [n],
            "top_eigenvalue": [float(top)],
            "explained_ratio": [float(top / vals.sum())],
            "component_head": [[float(v) for v in comp[:8]]],
        })

    return emb.groupBy(label_col).applyInPandas(pca, out_schema)
