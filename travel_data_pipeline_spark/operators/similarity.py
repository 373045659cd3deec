"""Similarity search over embedding columns — SURVEY.md §2.10.

Two paths over ``embeddings (vec_id, embedding array<float>, label)``:

- **Brute-force cosine top-k** — the correctness baseline: broadcast the
  (small) query set against every vector, cosine via ``zip_with`` +
  ``aggregate`` expressions (JVM-side, codegen'd — no Python), top-k per
  query via the W2 row_number pattern.
- **IVF (inverted-file) top-k** — the scale path: assign every vector to
  its nearest centroid once (one broadcast pass), then probe only the
  ``n_probe`` closest clusters per query. At 100 TB this turns a full
  scan per query into a ~(n_probe/n_centroids) partial scan, and the
  cluster assignment is a partition key so probes prune partitions.

All arithmetic is double (embeddings cast up once) and the final score
is rounded to 6 dp so the DuckDB oracle hashes identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns (expression)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query row.

    ``queries`` has (query_id, embedding); it is broadcast, so the big
    side streams with no shuffle until the top-k aggregation.
    Excludes self-matches when ids collide. Deterministic: ties break on
    neighbor id.
    """
    q = queries.select(F.col(query_id), as_double(F.col(vec_col)).alias("q_vec"))
    base = embeddings.select(F.col(id_col).alias("neighbor_id"),
                             as_double(F.col(vec_col)).alias("n_vec"))
    scored = (base.join(F.broadcast(q), F.col(query_id) != F.col("neighbor_id"))
              .select(query_id, "neighbor_id",
                      F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6)
                       .alias("cosine_sim")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(),
                                             F.col("neighbor_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(query_id, "neighbor_id", "cosine_sim", "rnk"))


def random_planes(n_planes: int, dim: int, seed: int = 13) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH, generated
    driver-side and embedded as LITERALS in both the Spark expression
    and the oracle SQL — bit-identical by construction."""
    import random

    rng = random.Random(seed)
    return [[round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
            for _ in range(n_planes)]


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket key: bit p = (dot(vec, plane_p) >= 0)."""
    total = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(vec, lit_plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        total = total + bit
    return total


def cosine_near_dup_lsh(embeddings: DataFrame, planes: list[list[float]],
                        bands: int = 2, threshold: float = 0.99,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        max_bucket: int = 1000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, sign-LSH bucketed.

    Same scale shape as the text dedup family: signature -> banded
    bucket keys -> bucket-local pair expansion (no self-join) -> exact
    cosine verify. A pair survives if ANY band matches and cosine >=
    threshold. Bits-per-band = len(planes)//bands controls collision
    rate exactly like SimHash band width.
    """
    from travel_data_pipeline_spark.operators.dedup import bucket_pairs

    n_planes = len(planes)
    band_bits = n_planes // bands
    mask = (1 << band_bits) - 1
    sigged = embeddings.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v"),
        signature_bits(as_double(F.col(vec_col)), planes).alias("sig"))
    banded = sigged.select(
        id_col, "v",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_idx"),
                     F.shiftright(F.col("sig"), b * band_bits)
                      .bitwiseAND(F.lit(mask)).alias("band_key"))
            for b in range(bands)
        ])).alias("band"),
    ).select(id_col, "v", "band.band_idx", "band.band_key")

    pairs = bucket_pairs(
        banded, ["band_idx", "band_key"],
        F.struct(F.col(id_col).alias("id"), F.col("v").alias("v")),
        max_bucket)
    scored = (pairs.select(
        F.col("pair.a.id").alias("vec_a"), F.col("pair.b.id").alias("vec_b"),
        F.round(cosine(F.col("pair.a.v"), F.col("pair.b.v")), 6)
         .alias("cosine_sim"))
        .distinct())
    return scored.filter(F.col("cosine_sim") >= threshold)


def assign_clusters(embeddings: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    centroid_id: str = "centroid_id") -> DataFrame:
    """IVF build step: nearest centroid per vector (max cosine).

    Centroids are tiny by construction -> broadcast; one pass over the
    data, an argmax aggregation, no shuffle of the vectors themselves.
    Deterministic tie-break on centroid id.
    """
    c = centroids.select(F.col(centroid_id), as_double(F.col(vec_col)).alias("c_vec"))
    v = embeddings.select(F.col(id_col), as_double(F.col(vec_col)).alias("v_vec"))
    scored = v.join(F.broadcast(c)).select(
        id_col, centroid_id,
        F.round(cosine(F.col("v_vec"), F.col("c_vec")), 6).alias("sim"))
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(),
                                           F.col(centroid_id).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select(id_col, centroid_id, F.col("sim").alias("centroid_sim")))


def ivf_topk(embeddings: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: int = 5, n_probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", query_id: str = "query_id",
             assignments: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: probe only the n_probe nearest clusters.

    Recall < 1.0 by design; the bench pairs this with brute_force_topk
    to report recall@k. The candidate scan is
    |clusters probed| / |clusters| of the data — the 100 TB path.

    ``assignments`` lets a caller inject a PRE-BUILT (id, centroid_id)
    index (the dedup_scorecard ``pairs=`` seam pattern): in production
    the IVF index is built once and searched many times — per-search
    re-assignment would re-scan the corpus against every centroid.
    Semantics are identical because the internal build is exactly
    assign_clusters.
    """
    if assignments is None:
        assignments = assign_clusters(embeddings, centroids,
                                      id_col, vec_col)
    indexed = embeddings.join(assignments.select(id_col, "centroid_id"), id_col)

    q_probe = assign_clusters(
        queries.withColumnRenamed(query_id, id_col), centroids, id_col, vec_col)
    # top n_probe clusters per query (re-rank all centroids, keep n_probe)
    c = centroids.select("centroid_id", as_double(F.col(vec_col)).alias("c_vec"))
    qv = queries.select(F.col(query_id), as_double(F.col(vec_col)).alias("q_vec"))
    probes = qv.join(F.broadcast(c)).select(
        query_id, "centroid_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"))
    wp = Window.partitionBy(query_id).orderBy(F.col("sim").desc(),
                                              F.col("centroid_id").asc())
    probed = (probes.withColumn("rnk", F.row_number().over(wp))
              .filter(F.col("rnk") <= n_probe).select(query_id, "centroid_id"))

    candidates = (indexed.join(probed.hint("broadcast"), "centroid_id")
                  .select(query_id, F.col(id_col).alias("neighbor_id"),
                          as_double(F.col(vec_col)).alias("n_vec")))
    scored = (candidates.join(F.broadcast(qv), query_id)
              .filter(F.col("neighbor_id") != F.col(query_id))
              .select(query_id, "neighbor_id",
                      F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6)
                       .alias("cosine_sim")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(),
                                             F.col("neighbor_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(query_id, "neighbor_id", "cosine_sim", "rnk"))
