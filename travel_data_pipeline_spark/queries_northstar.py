"""North-star queries: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md §2.10) — each with a DuckDB oracle that
replays the same algorithm (md5-based hashing is identical in both
engines; see functions/hashing.py).

The documents table has no natural duplicates (synthetic distinct
texts), so dedup queries run on ``documents ∪ exact copies of doc_id<5``
(same augmentation in both engines) — the planted pairs make the
candidate-generation paths observable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions.hashing import HEX_CHARS
from travel_data_pipeline_spark.functions.parity import round_sql
from travel_data_pipeline_spark.operators import dedup, similarity, text
from travel_data_pipeline_spark.operators.multimodal import (
    decode_image_meta,
    documents_as_media,
    frame_sample_stub,
)
from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

NUM_HASHES, BANDS = 8, 4
PLANT_OFFSET = 100000
# engine-side bucket cap (operators/dedup.py bucket_pairs) — every
# banded oracle below replicates it so both engines drop the same
# degenerate buckets. Unreachable at driver scale; the parity is what
# matters.
MAX_BUCKET = 1000


def _capped_sql(src: str, keys: str, name: str) -> str:
    """CTE mirroring bucket_pairs' max_bucket guard: keep only rows of
    buckets with <= MAX_BUCKET members (>= 2 is implicit in the pair
    self-join)."""
    return f"""{name} AS (
    SELECT * EXCLUDE (_bsz) FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY {keys}) AS _bsz FROM {src})
    WHERE _bsz <= {MAX_BUCKET}
)"""

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

_AUG_DOCS = f"""
docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_OFFSET}, text FROM documents WHERE doc_id < 5
)"""

_NORMED = """
normed AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM docs
)"""


def _md5_long_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, {HEX_CHARS})) AS BIGINT)"


_SHINGLED = """
shingled AS (
    SELECT w.doc_id, array_to_string(w.words[i.i:i.i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(norm, ' ') AS words FROM normed) w,
         unnest(generate_series(1, greatest(len(w.words) - 2, 0))) AS i(i)
)"""

from travel_data_pipeline_spark.functions.hashing import (  # noqa: E402
    affine_hash_sql,
    affine_params,
    minhash_base_sql,
)

_SIG_COLS = ", ".join(
    "min(" + affine_hash_sql("base", a, b) + f") AS h{s}"
    for s, (a, b) in enumerate(affine_params(NUM_HASHES)))

_SIGS = f"""
based AS (
    SELECT doc_id, {minhash_base_sql('shingle')} AS base FROM shingled
),
sigs AS (
    SELECT doc_id, {_SIG_COLS}
    FROM based GROUP BY doc_id
)"""


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (d.filter(F.col("doc_id") < 5)
               .select((F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"))
    return d.unionByName(planted)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@register("dedup_exact", f"""
WITH {_AUG_DOCS},
{_NORMED}
SELECT md5(norm) AS text_key, MIN(doc_id) AS doc_id
FROM normed GROUP BY md5(norm)
""")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augmented_docs(spark, sf_dir)
    return dedup.exact_dedup(docs).select("text_key", "doc_id")


# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs (+ exact-Jaccard verification)
# ---------------------------------------------------------------------------

def _banded_sql() -> str:
    rows_per_band = NUM_HASHES // BANDS
    selects = []
    for b in range(BANDS):
        parts = " || '|' || ".join(
            f"CAST(h{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band))
        selects.append(
            f"SELECT doc_id, {b} AS band_idx, {parts} AS band_key FROM sigs")
    return "banded AS (\n" + "\nUNION ALL\n".join(selects) + "\n)"


_PAIRS_CTE = """pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bcap a JOIN bcap b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
)"""

_LSH_PAIRS_SQL = f"""
WITH {_AUG_DOCS},
{_NORMED},
{_SHINGLED},
{_SIGS},
{_banded_sql()},
{_capped_sql('banded', 'band_idx, band_key', 'bcap')},
{_PAIRS_CTE}
SELECT doc_a, doc_b FROM pairs
"""


@register("dedup_minhash_lsh", _LSH_PAIRS_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augmented_docs(spark, sf_dir)
    sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES)
    return dedup.lsh_candidate_pairs(sigs, num_hashes=NUM_HASHES, bands=BANDS,
                                     max_bucket=MAX_BUCKET)


@register("dedup_minhash_jaccard", f"""
WITH {_AUG_DOCS},
{_NORMED},
{_SHINGLED},
{_SIGS},
{_banded_sql()},
{_capped_sql('banded', 'band_idx, band_key', 'bcap')},
{_PAIRS_CTE},
sets AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
    GROUP BY p.doc_a, p.doc_b
)
SELECT p.doc_a, p.doc_b,
       ROUND(COALESCE(i.inter_n, 0)
             / (za.set_size + zb.set_size - COALESCE(i.inter_n, 0)), 6)
         AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
JOIN sizes za ON za.doc_id = p.doc_a
JOIN sizes zb ON zb.doc_id = p.doc_b
WHERE ROUND(COALESCE(i.inter_n, 0)
            / (za.set_size + zb.set_size - COALESCE(i.inter_n, 0)), 6) >= 0.5
""")
def dedup_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup pipeline: LSH candidates -> exact Jaccard
    verify at 0.5 — plausible-but-different pairs die here.

    The shingle relation is persisted and shared by the signature and
    verify stages (the pipeline_training_data pattern, VERDICT r04 #4)
    so the corpus is exploded once, not once per stage."""
    from pyspark.storagelevel import StorageLevel

    docs = _augmented_docs(spark, sf_dir)
    shingles = dedup.shingle_sets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES,
                                    shingles=shingles)
    # the candidate-pair set is consumed three times downstream
    # (id semi-join, intersection join, final select) — materialize it
    # once; post-LSH it is tiny relative to the corpus. persist, not
    # eager localCheckpoint (optimization r14): all three consumers
    # live inside the query's one final action, so the cache fills
    # there instead of a separate serial construction-time job —
    # measured 3.30 -> 2.58 s build+exec / 3.86 -> 3.75 s
    # first-computation in the interleaved A/B at sf0.1.
    pairs = dedup.lsh_candidate_pairs(
        sigs, num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket=MAX_BUCKET).persist()
    return dedup.jaccard_pairs(docs, pairs, threshold=0.5,
                               shingles=shingles)


@register("containment_pairs", f"""
WITH {_AUG_DOCS},
{_NORMED},
{_SHINGLED},
{_SIGS},
{_banded_sql()},
{_capped_sql('banded', 'band_idx, band_key', 'bcap')},
{_PAIRS_CTE},
sets AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
    GROUP BY p.doc_a, p.doc_b
)
SELECT doc_a, doc_b, contain_a, contain_b FROM (
    SELECT p.doc_a, p.doc_b,
           ROUND(COALESCE(i.inter_n, 0) / za.set_size, 6) AS contain_a,
           ROUND(COALESCE(i.inter_n, 0) / zb.set_size, 6) AS contain_b
    FROM pairs p
    LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    JOIN sizes za ON za.doc_id = p.doc_a
    JOIN sizes zb ON zb.doc_id = p.doc_b
)
WHERE greatest(contain_a, contain_b) >= 0.8
""")
def containment_pairs(spark: SparkSession, sf_dir: str,
                      pairs: DataFrame | None = None) -> DataFrame:
    """Asymmetric Jaccard containment (|A∩B|/|A| and |A∩B|/|B|) over
    LSH candidates — catches near-SUBSET duplication (a doc embedded
    in a longer one) that symmetric Jaccard under-scores: a 100-shingle
    doc fully inside a 1000-shingle doc has jaccard 0.1 but
    containment 1.0. Same candidate generation + overlap counting as
    the Jaccard verify (operators/dedup.py overlap_pairs), one extra
    projection. Shares one persisted shingle relation across the
    signature and overlap stages (VERDICT r04 #4).

    ``pairs`` lets a composing caller (dedup_scorecard) inject the
    SAME LSH candidate relation it already computed via
    dedup_minhash_lsh, so the signature+banding pipeline runs once
    per composition instead of once per component (VERDICT r08 #3);
    semantics are identical because this function's internal build is
    exactly dedup_minhash_lsh's."""
    from pyspark.storagelevel import StorageLevel

    docs = _augmented_docs(spark, sf_dir)
    shingles = dedup.shingle_sets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    if pairs is None:
        sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES,
                                        shingles=shingles)
        # eager localCheckpoint, NOT persist (optimization r14): the
        # single-action persist variant measured WORSE here
        # (1.97 -> 2.67 s first-computation in the interleaved A/B) —
        # unlike dedup_minhash_jaccard, the containment readout's
        # extra greatest()-filter consumer pattern loses more to the
        # un-materialized LSH lineage than the saved serial job returns
        pairs = dedup.lsh_candidate_pairs(
            sigs, num_hashes=NUM_HASHES, bands=BANDS,
            max_bucket=MAX_BUCKET).localCheckpoint(eager=True)
    ov = dedup.overlap_pairs(docs, pairs, shingles=shingles)
    out = ov.select(
        "doc_a", "doc_b",
        F.round(F.col("inter_n") / F.col("size_a"), 6).alias("contain_a"),
        F.round(F.col("inter_n") / F.col("size_b"), 6).alias("contain_b"))
    return out.filter(F.greatest("contain_a", "contain_b") >= 0.8)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_sql(bits: int = 32) -> str:
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS bit{b}"
        for b in range(bits))
    fp = " + ".join(
        f"(CASE WHEN bit{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
tokens AS (
    SELECT DISTINCT doc_id, t FROM (
        SELECT doc_id, unnest(string_split(norm, ' ')) AS t FROM normed
    ) WHERE t <> ''
),
hashed AS (SELECT doc_id, {_md5_long_sql("'s99:' || t")} AS h FROM tokens),
bitsums AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bitsums)"""


@register("dedup_simhash_fingerprints", f"""
WITH {_AUG_DOCS},
{_NORMED},
{_simhash_sql()}
SELECT doc_id, simhash FROM fp
""")
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augmented_docs(spark, sf_dir)
    return dedup.simhash_fingerprints(docs)


def _simhash_bands_sql(bits: int = 32, bands: int = 4) -> str:
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    selects = [
        f"SELECT doc_id, simhash, {b} AS band_idx, "
        f"(simhash >> {b * band_bits}) & {mask} AS band_key FROM fp"
        for b in range(bands)
    ]
    return "sbanded AS (\n" + "\nUNION ALL\n".join(selects) + "\n)"


@register("simhash_near_pairs", f"""
WITH {_AUG_DOCS},
{_NORMED},
{_simhash_sql()},
{_simhash_bands_sql()},
{_capped_sql('sbanded', 'band_idx, band_key', 'scap')}
SELECT doc_a, doc_b, hamming FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS hamming
    FROM scap a JOIN scap b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
) WHERE hamming <= 3
""")
def simhash_near_pairs(spark: SparkSession, sf_dir: str,
                       materialize: str = "checkpoint") -> DataFrame:
    docs = _augmented_docs(spark, sf_dir)
    fp = dedup.simhash_fingerprints(docs)
    return dedup.simhash_near_pairs(fp, max_bucket=MAX_BUCKET,
                                    materialize=materialize)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COSINE_SQL = ("ROUND(list_dot_product(q.qv, n.nv) / "
               "(sqrt(list_dot_product(q.qv, q.qv)) * "
               "sqrt(list_dot_product(n.nv, n.nv))), 6)")


@register("embedding_cosine_topk", f"""
WITH q AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id < 5
),
base AS (
    SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
    FROM embeddings
),
scored AS (
    SELECT q.query_id, n.neighbor_id, {_COSINE_SQL} AS cosine_sim
    FROM base n CROSS JOIN q WHERE q.query_id <> n.neighbor_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
    FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 5
""")
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for 5 query vectors —
    the correctness baseline for ANN."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = similarity.brute_force_topk(emb, queries, k=5)
    return out.withColumn("rnk", F.col("rnk").cast("int"))


@register("embedding_ivf_topk", f"""
WITH cent AS (
    SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
    FROM embeddings WHERE vec_id % 50 = 0
),
base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings
),
assigned AS (
    SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
                   ROUND(list_dot_product(c.cv, b.nv) /
                         (sqrt(list_dot_product(c.cv, c.cv)) *
                          sqrt(list_dot_product(b.nv, b.nv))), 6) DESC,
                   c.centroid_id ASC) AS rnk
        FROM base b CROSS JOIN cent c
    ) WHERE rnk = 1
),
q AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id < 5
),
probes AS (
    SELECT query_id, centroid_id FROM (
        SELECT q.query_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                   ROUND(list_dot_product(q.qv, c.cv) /
                         (sqrt(list_dot_product(q.qv, q.qv)) *
                          sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                   c.centroid_id ASC) AS rnk
        FROM q CROSS JOIN cent c
    ) WHERE rnk <= 2
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id
    FROM probes p JOIN assigned a ON a.centroid_id = p.centroid_id
),
scored AS (
    SELECT c.query_id, c.neighbor_id, {_COSINE_SQL} AS cosine_sim
    FROM cand c
    JOIN (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
          FROM embeddings) n USING (neighbor_id)
    JOIN q ON q.query_id = c.query_id
    WHERE c.neighbor_id <> c.query_id
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS INT) AS rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
    FROM scored
) WHERE rnk <= 5
""")
def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: 10 fixed centroids (vec_id % 50 == 0),
    probe the 2 nearest clusters — the 100 TB scan-pruning path."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = (emb.filter(F.col("vec_id") % 50 == 0)
                 .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    # assign_impl pinned on the oracle-parity expr spelling (VERDICT
    # r11 #1); non-oracle callers get 'auto' corpus-size routing.
    out = similarity.ivf_topk(emb, centroids, queries, k=5, n_probe=2,
                              assign_impl="expr")
    return out.withColumn("rnk", F.col("rnk").cast("int"))


# ---------------------------------------------------------------------------
# Standalone character-n-gram Jaccard with blocking (the classic
# "blocked pairwise" dedup: candidates = same (lang, length-bucket),
# not LSH — completes the dedup-method family)
# ---------------------------------------------------------------------------

@register("dedup_ngram_jaccard_blocked", f"""
WITH blocked AS (
    SELECT doc_id, lang, CAST(n_chars // 100 AS INT) AS len_bucket,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
{_capped_sql('blocked', 'lang, len_bucket', 'blkcap')},
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM blkcap a JOIN blkcap b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.doc_id < b.doc_id
),
grams AS (
    SELECT doc_id, substr(norm, i.i, 5) AS g
    FROM blocked, unnest(generate_series(1, greatest(length(norm) - 4, 0)))
         AS i(i)
),
sets AS (SELECT DISTINCT doc_id, g FROM grams),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
    FROM (SELECT doc_a, doc_b FROM pairs) p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b AND sb.g = sa.g
    GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(i.inter_n / (za.n + zb.n - i.inter_n), 6) AS char_jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE ROUND(i.inter_n / (za.n + zb.n - i.inter_n), 6) >= 0.5
""")
def dedup_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard over blocked candidates (same lang and
    100-char length bucket). Blocking bounds the quadratic term the way
    production blocked-dedup does when no LSH index exists; the n-gram
    intersection is an equi-join on (doc_b, gram) — no theta join.

    Pair generation goes through bucket_pairs: one shuffle on the block
    key, no self-join, and the max_bucket cap drops hot blocks (all
    English docs of 100-200 chars in a web corpus would otherwise be
    O(n^2)) — same guard, same oracle spelling as the LSH paths."""
    docs = load_table(spark, sf_dir, "documents")
    blocked = docs.select(
        "doc_id", "lang",
        (F.col("n_chars") / 100).cast("int").alias("len_bucket"),
        dedup.normalize_text(F.col("text")).alias("norm"))

    pairs = (dedup.bucket_pairs(blocked.select("doc_id", "lang", "len_bucket"),
                                ["lang", "len_bucket"], F.col("doc_id"),
                                max_bucket=MAX_BUCKET)
             .select(F.col("pair.a").alias("doc_a"),
                     F.col("pair.b").alias("doc_b")))

    n_grams = F.greatest(F.length("norm") - F.lit(4), F.lit(0))
    grams = blocked.select(
        "doc_id",
        F.explode(F.when(n_grams >= 1, F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.col("norm").substr(i, F.lit(5))))
            .otherwise(F.array().cast("array<string>"))).alias("g"))
    sets = grams.distinct()
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))

    sa = sets.select(F.col("doc_id").alias("doc_a"), "g")
    sb = sets.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (pairs.join(sa, "doc_a").join(sb, ["doc_b", "g"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter_n")))

    out = (inter
           .join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "n_a"}), "doc_a")
           .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "n_b"}), "doc_b")
           .withColumn("char_jaccard",
                       F.round(F.col("inter_n")
                               / (F.col("n_a") + F.col("n_b") - F.col("inter_n")),
                               6)))
    return (out.filter(F.col("char_jaccard") >= 0.5)
            .select("doc_a", "doc_b", "char_jaccard"))


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (sign-LSH bucketed; planted scaled copies —
# cosine is scale-invariant, so a 1.5x copy is an exact near-dup)
# ---------------------------------------------------------------------------

_PLANES = similarity.random_planes(16, 64)


def _near_dup_oracle() -> str:
    bands, band_bits = 2, 8
    mask = (1 << band_bits) - 1
    plane_lits = ["[" + ", ".join(repr(x) for x in p) + "]" for p in _PLANES]
    sig = " + ".join(
        f"(CASE WHEN list_dot_product(v, {pl}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, pl in enumerate(plane_lits))
    band_rows = "\nUNION ALL\n".join(
        f"SELECT vec_id, v, {b} AS band_idx, (sig >> {b * band_bits}) & {mask}"
        f" AS band_key FROM sigged" for b in range(bands))
    return f"""
WITH aug AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    UNION ALL
    SELECT vec_id + {PLANT_OFFSET},
           list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5)
    FROM embeddings WHERE vec_id < 5
),
sigged AS (SELECT vec_id, v, CAST({sig} AS BIGINT) AS sig FROM aug),
banded AS ({band_rows}),
{_capped_sql('banded', 'band_idx, band_key', 'bcap')},
pairs AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_sim
    FROM bcap a JOIN bcap b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.99
"""


@register("dedup_embedding_cosine", _near_dup_oracle())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = (emb.filter(F.col("vec_id") < 5)
               .select((F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
                       F.transform(F.col("embedding").cast("array<double>"),
                                   lambda x: x * 1.5).alias("embedding")))
    aug = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("embedding")) \
             .unionByName(planted)
    return similarity.cosine_near_dup_lsh(aug, _PLANES, bands=2, threshold=0.99,
                                          max_bucket=MAX_BUCKET)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def _stop_list_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS[lang]) + "]"


def lang_pred_case_sql() -> str:
    """DuckDB spelling of operators/text.language_pred (argmax stopword
    hits over a ``toks`` list column; same tie order as the Spark
    when-chain)."""
    hits = {lang: f"len(list_filter(toks, x -> list_contains({_stop_list_sql(lang)}, x)))"
            for lang in text.STOPWORDS}
    best = "GREATEST(" + ", ".join(hits.values()) + ")"
    return "CASE " + " ".join(
        f"WHEN {best} > 0 AND {h} = {best} THEN '{lang}'"
        for lang, h in hits.items()) + " ELSE 'und' END"


def _lang_sql() -> str:
    hits = {lang: f"len(list_filter(toks, x -> list_contains({_stop_list_sql(lang)}, x)))"
            for lang in text.STOPWORDS}
    best = "GREATEST(" + ", ".join(hits.values()) + ")"
    case = lang_pred_case_sql()
    return f"""
WITH toked AS (
    SELECT doc_id, text,
           list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '') AS toks
    FROM documents
)
SELECT doc_id, text, {case} AS pred_lang,
       ROUND({best} / GREATEST(len(toks), 1), 6) AS stopword_ratio
FROM toked
"""


@register("text_lang_id", _lang_sql())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.language_id(docs)


@register("text_quality_scores", f"""
WITH toked AS (
    SELECT doc_id, text,
           length(text) AS n_chars,
           list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '') AS toks,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
           length(text) - length(regexp_replace(text,
               '[.,;:!?''"()\\[\\]{{}}]', '', 'g')) AS punct_chars
    FROM documents
),
feats AS (
    SELECT doc_id,
           n_chars AS n_chars_engine,
           len(toks) AS n_tokens,
           ROUND(alpha_chars / GREATEST(len(toks), 1), 6) AS mean_word_len,
           ROUND(alpha_chars / GREATEST(n_chars, 1), 6) AS alpha_ratio,
           ROUND(punct_chars / GREATEST(n_chars, 1), 6) AS punct_ratio,
           ROUND(len(list_filter(toks,
               x -> list_contains({_stop_list_sql('en')}, x)))
               / GREATEST(len(toks), 1), 6) AS stopword_ratio,
           LEAST(log10(CAST(n_chars AS DOUBLE) + 1.0) * 25.0, 60.0)
             + (alpha_chars / GREATEST(n_chars, 1)) * 20.0
             + (len(list_filter(toks,
                    x -> list_contains({_stop_list_sql('en')}, x)))
                / GREATEST(len(toks), 1)) * 30.0
             - (punct_chars / GREATEST(n_chars, 1)) * 40.0 AS raw
    FROM toked
)
SELECT doc_id, n_chars_engine, n_tokens, mean_word_len, alpha_ratio,
       punct_ratio, stopword_ratio,
       ROUND(GREATEST(0.0, LEAST(100.0, raw)), 6) AS quality_score
FROM feats
""")
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_features(docs)


@register("text_token_stats", """
SELECT doc_id,
       len(list_filter(string_split(
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
           x -> x <> '')) AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))
         AS bpe_tokens,
       ROUND(length(text) / GREATEST(
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')),
           1), 6) AS chars_per_token
FROM documents
""")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.token_stats(docs)


@register("text_fingerprints", """
WITH normed AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
chunks AS (
    SELECT n.doc_id, n.norm,
           md5(substr(n.norm, (i.i - 1) * 32 + 1, 64)) AS chunk_md5
    FROM normed n,
         unnest(generate_series(1,
             GREATEST(CAST(floor((length(n.norm) - 64) / 32.0) AS INT) + 1, 1)
         )) AS i(i)
)
SELECT doc_id, md5(norm) AS full_md5, MIN(chunk_md5) AS winnow_fp
FROM chunks GROUP BY doc_id, md5(norm)
""")
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprints(docs)


# ---------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas; fake decode is SQL-expressible so the
# metadata path gets a real oracle; frame sampling is rows-only)
# ---------------------------------------------------------------------------

@register("multimodal_decode_meta", """
SELECT doc_id AS media_id,
       'application/fake-image' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
       md5(text) AS checksum
FROM documents
""")
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(documents_as_media(docs))


@register("multimodal_frame_sample", """
SELECT d.doc_id AS media_id,
       CAST(f.i AS INTEGER) AS frame_idx,
       md5(d.text || '#' || CAST(f.i AS VARCHAR)) AS frame_checksum
FROM documents d,
     UNNEST(range(0, GREATEST(octet_length(encode(d.text)) // 100, 1), 3))
       AS f(i)
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over synthetic media (payload = utf-8
    text bytes). The stub emits one row per strided fake frame
    (1 frame / 100 bytes, every 3rd); because the fake checksum is
    md5(payload || '#' || idx), the whole output — including the
    checksum computed inside mapInPandas — is reproducible by the
    DuckDB oracle above, closing the r02 ``no_oracle`` gap."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_stub(documents_as_media(docs), every_n=3)


# ---------------------------------------------------------------------------
# The composed training-data curation pipeline: quality filter -> lang
# filter -> exact dedup -> near-dup removal -> token accounting. One
# declarative plan, every stage reused from the operators above.
# ---------------------------------------------------------------------------

@register("pipeline_training_data", f"""
WITH {_AUG_DOCS},
{_NORMED},
{_SHINGLED},
{_SIGS},
{_banded_sql()},
{_capped_sql('banded', 'band_idx, band_key', 'bcap')},
{_PAIRS_CTE},
sets AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
    GROUP BY p.doc_a, p.doc_b
),
neardups AS (
    SELECT i.doc_b AS dropped
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE ROUND(i.inter_n / (za.set_size + zb.set_size - i.inter_n), 6) >= 0.8
),
exact_survivors AS (
    SELECT MIN(doc_id) AS doc_id FROM normed GROUP BY md5(norm)
),
quality AS (
    SELECT d.doc_id, d.norm,
           length(d.norm) AS n_chars,
           list_filter(string_split(d.norm, ' '), x -> x <> '') AS toks
    FROM normed d
)
SELECT q.doc_id,
       CAST(len(q.toks) AS INT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars
FROM quality q
JOIN exact_survivors e USING (doc_id)
WHERE q.doc_id NOT IN (SELECT dropped FROM neardups)
  AND len(q.toks) >= 10
  AND len(list_filter(q.toks,
        x -> list_contains({_stop_list_sql('en')}, x))) > 0
""")
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: exact dedup (keep min id) -> MinHash-LSH
    candidates -> Jaccard >= 0.8 near-dup removal (drop the larger id)
    -> length + english-stopword quality gate -> token accounting.

    At 100 TB each stage is a bounded-shuffle operator from
    operators/dedup.py; nothing collects to the driver. The exploded
    shingle relation is built ONCE and persisted (MEMORY_AND_DISK —
    spills instead of OOM, lineage intact for executor loss), then
    consumed by both the signature and Jaccard stages: measured ~19%
    faster at sf0.1 than re-exploding per stage, which itself beat
    caching the raw docs (in-memory relation breaks whole-stage
    codegen over the explode paths).
    """
    from pyspark.storagelevel import StorageLevel

    docs = _augmented_docs(spark, sf_dir)

    shingles = dedup.shingle_sets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES,
                                    shingles=shingles)
    # materialized once — consumed three times by the Jaccard stage
    # (measured 16% off the whole pipeline at sf0.1). KEPT as an eager
    # checkpoint: the r14-optimization persist variant measured worse
    # on the honest first-computation metric (3.00 -> 4.67 s in the
    # interleaved A/B) — this pipeline's quality-gate + accounting
    # consumers fan out wider than the plain verify, and the
    # un-materialized LSH lineage bloats that action's stage graph
    pairs = dedup.lsh_candidate_pairs(
        sigs, num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket=MAX_BUCKET).localCheckpoint(eager=True)
    verified = dedup.jaccard_pairs(docs, pairs, threshold=0.8,
                                   shingles=shingles)
    dropped = verified.select(F.col("doc_b").alias("doc_id")).distinct()

    survivors = dedup.exact_dedup(docs).select("doc_id")

    normed = docs.select(
        "doc_id", dedup.normalize_text(F.col("text")).alias("norm"))
    toks = text.token_array(F.col("norm"))
    quality = normed.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.length("norm").cast("long").alias("n_chars"),
        F.size(F.filter(toks, lambda t: t.isin(
            *[F.lit(w) for w in text.STOPWORDS["en"]]))).alias("_en_hits"))

    return (quality
            .join(survivors, "doc_id", "left_semi")
            .join(dropped, "doc_id", "left_anti")
            .filter((F.col("n_tokens") >= 10) & (F.col("_en_hits") > 0))
            .select("doc_id", "n_tokens", "n_chars"))


# ---------------------------------------------------------------------------
# Connected-components dedup clustering: LSH pairs -> Jaccard verify ->
# min-label clusters -> full-corpus keep/drop map
# ---------------------------------------------------------------------------

from travel_data_pipeline_spark.operators import graph  # noqa: E402

_CC_CTES = f"""{_AUG_DOCS},
{_NORMED},
{_SHINGLED},
{_SIGS},
{_banded_sql()},
{_capped_sql('banded', 'band_idx, band_key', 'bcap')},
{_PAIRS_CTE},
sets AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
    GROUP BY p.doc_a, p.doc_b
),
jpairs AS (
    SELECT p.doc_a, p.doc_b
    FROM pairs p
    LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
    JOIN sizes za ON za.doc_id = p.doc_a
    JOIN sizes zb ON zb.doc_id = p.doc_b
    WHERE ROUND(COALESCE(i.inter_n, 0)
                / (za.set_size + zb.set_size - COALESCE(i.inter_n, 0)), 6)
          >= 0.5
),
sym AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
        UNION SELECT doc_b AS u, doc_a AS v FROM jpairs),
reach AS (
    SELECT u AS id, v AS r FROM sym
    UNION
    SELECT re.id, s.v FROM reach re JOIN sym s ON s.u = re.r
),
comp AS (SELECT id AS doc_id, LEAST(id, MIN(r)) AS component
         FROM reach GROUP BY id)"""


def _jaccard_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _augmented_docs(spark, sf_dir)
    sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES)
    pairs = dedup.lsh_candidate_pairs(
        sigs, num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket=MAX_BUCKET).localCheckpoint(eager=True)
    return (dedup.jaccard_pairs(docs, pairs, threshold=0.5)
            .select("doc_a", "doc_b"))


@register("dedup_cluster_components", f"""
WITH RECURSIVE {_CC_CTES}
SELECT doc_id, component FROM comp
""")
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clusters of verified near-duplicates (component = min doc_id
    reachable): large-star/small-star contraction in Spark (the
    diameter-proof 100 TB path — pinned here so the driver certifies
    it against the oracle; auto would pick propagation at this SF),
    min-reachable-id recursive CTE in DuckDB — both are the same
    fixpoint, so parity holds no matter how many rounds each needs."""
    return graph.connected_components(_jaccard_edges(spark, sf_dir),
                                      algorithm="star")


@register("dedup_canonical_map", f"""
WITH RECURSIVE {_CC_CTES}
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS keep_id,
       CAST(CASE WHEN COALESCE(c.component, d.doc_id) <> d.doc_id
                 THEN 1 ELSE 0 END AS INTEGER) AS is_duplicate
FROM docs d LEFT JOIN comp c ON c.doc_id = d.doc_id
""")
def dedup_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus keep/drop decision: every doc points at its cluster
    canonical (or itself). This is the artifact a curation pipeline
    actually persists — the pair list is evidence, this is the verdict."""
    docs = _augmented_docs(spark, sf_dir)
    comps = graph.connected_components(_jaccard_edges(spark, sf_dir))
    return graph.canonical_map(docs, comps)


@register("text_repetition_signals", """
WITH toked AS (
    SELECT doc_id,
           list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '') AS toks
    FROM documents
),
base AS (
    SELECT doc_id, len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_types, toks
    FROM toked
),
grams AS (
    SELECT doc_id, toks[i.i] || ' ' || toks[i.i + 1] AS gram
    FROM base, unnest(generate_series(1, len(toks) - 1)) AS i(i)
    WHERE len(toks) >= 2
),
gram_counts AS (
    SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
),
rep AS (
    SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total_grams,
           SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ
    FROM gram_counts GROUP BY 1
)
SELECT b.doc_id, b.n_tokens, b.n_types,
       ROUND(b.n_types / GREATEST(b.n_tokens, 1), 6) AS ttr,
       ROUND(COALESCE(r.top_c, 0)
             / GREATEST(COALESCE(r.total_grams, 0), 1), 6) AS top_2gram_frac,
       ROUND(COALESCE(r.dup_occ, 0)
             / GREATEST(COALESCE(r.total_grams, 0), 1), 6) AS dup_2gram_frac
FROM base b LEFT JOIN rep r USING (doc_id)
""")
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 table A1):
    type-token ratio, top-bigram share, duplicate-bigram share. The
    reference has no analogue; this is north-star curation surface.
    Word-count-shaped — see operators/text.repetition_signals."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_signals(docs)


@register("text_curation_flags", """
WITH toked AS (
    SELECT doc_id, text, lower(text) AS low,
           list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '') AS toks,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
           length(text) - length(regexp_replace(text, '[#{}|]', '', 'g'))
             AS symbols
    FROM documents
),
flags AS (
    SELECT doc_id,
           len(toks) AS n_tokens,
           alpha_chars / GREATEST(len(toks), 1) AS mean_wl,
           len(toks) < 5 AS flag_too_short,
           (alpha_chars / GREATEST(len(toks), 1) < 3.0
            OR alpha_chars / GREATEST(len(toks), 1) > 10.0) AS flag_word_len,
           symbols / GREATEST(len(toks), 1) > 0.1 AS flag_symbol_ratio,
           contains(low, 'lorem ipsum') AS flag_lorem,
           contains(low, '{') AS flag_brace
    FROM toked
)
SELECT doc_id, n_tokens, ROUND(mean_wl, 6) AS mean_word_len,
       flag_too_short, flag_word_len, flag_symbol_ratio, flag_lorem,
       flag_brace,
       NOT (flag_too_short OR flag_word_len OR flag_symbol_ratio
            OR flag_lorem OR flag_brace) AS keep
FROM flags
""")
def text_curation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style keep/drop flags (Raffel et al. 2020 C4 section 2.2;
    Rae et al. 2021 A1): shuffle-free row-local expressions, the form a
    100 TB pre-filter pass wants."""
    docs = load_table(spark, sf_dir, "documents")
    return text.curation_flags(docs)


_SIG_EQ_SUM = " + ".join(
    f"(CASE WHEN sa.h{s} = sb.h{s} THEN 1 ELSE 0 END)"
    for s in range(NUM_HASHES))


@register("minhash_estimate_error", f"""
WITH {_AUG_DOCS},
{_NORMED},
{_SHINGLED},
{_SIGS},
{_banded_sql()},
{_capped_sql('banded', 'band_idx, band_key', 'bcap')},
{_PAIRS_CTE},
est AS (
    SELECT p.doc_a, p.doc_b,
           ({_SIG_EQ_SUM}) / {NUM_HASHES}.0 AS est_j
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.doc_a
    JOIN sigs sb ON sb.doc_id = p.doc_b
),
sets AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
    GROUP BY p.doc_a, p.doc_b
)
SELECT e.doc_a, e.doc_b,
       ROUND(e.est_j, 6) AS est_j,
       ROUND(COALESCE(i.inter_n, 0)
             / (za.set_size + zb.set_size - COALESCE(i.inter_n, 0)), 6)
           AS exact_j,
       ROUND(abs(e.est_j
                 - COALESCE(i.inter_n, 0)
                   / (za.set_size + zb.set_size - COALESCE(i.inter_n, 0))), 6)
           AS abs_err
FROM est e
LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN sizes za ON za.doc_id = e.doc_a
JOIN sizes zb ON zb.doc_id = e.doc_b
""")
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch calibration: for every LSH candidate pair, the MinHash
    signature-agreement estimate of Jaccard vs the exact value, with
    the absolute error — the measurement that justifies (or indicts)
    the signature width k=8 before scaling a dedup run. Candidates
    only — the estimate is free (signatures already exist); the exact
    side reuses overlap_pairs' semi-joined shingle counting."""
    docs = _augmented_docs(spark, sf_dir)
    sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES)
    # eager checkpoint KEPT (optimization r14): the single-action
    # persist variant measured worse on both accounting views
    # (2.46 -> 2.90 s build+exec, 2.67 -> 3.00 s first-computation in
    # the interleaved A/B) — the signature-agreement legs re-join the
    # same sigs relation the pair lineage embeds, and the analyzer's
    # self-join dedup defeats cache matching (the hits_from_edges
    # lesson)
    pairs = dedup.lsh_candidate_pairs(
        sigs, num_hashes=NUM_HASHES, bands=BANDS,
        max_bucket=MAX_BUCKET).localCheckpoint(eager=True)
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     *[F.col(f"h{s}").alias(f"a{s}")
                       for s in range(NUM_HASHES)])
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     *[F.col(f"h{s}").alias(f"b{s}")
                       for s in range(NUM_HASHES)])
    eq_sum = None
    for s in range(NUM_HASHES):
        t = F.when(F.col(f"a{s}") == F.col(f"b{s}"), 1).otherwise(0)
        eq_sum = t if eq_sum is None else eq_sum + t
    est = (pairs.join(sa, "doc_a").join(sb, "doc_b")
           .select("doc_a", "doc_b",
                   (eq_sum / float(NUM_HASHES)).alias("est_j")))
    ov = dedup.overlap_pairs(docs, pairs)
    exact = ov.select(
        "doc_a", "doc_b",
        (F.col("inter_n")
         / (F.col("size_a") + F.col("size_b") - F.col("inter_n")))
        .alias("exact_raw"))
    return (est.join(exact, ["doc_a", "doc_b"])
            .select("doc_a", "doc_b",
                    F.round("est_j", 6).alias("est_j"),
                    F.round("exact_raw", 6).alias("exact_j"),
                    F.round(F.abs(F.col("est_j") - F.col("exact_raw")), 6)
                    .alias("abs_err")))


@register("dedup_rate_by_source", """
WITH normed_src AS (
    SELECT source,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS text_key
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT text_key) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT text_key) AS BIGINT) AS n_dups,
       round(1.0 - COUNT(DISTINCT text_key) / COUNT(*), 6) AS dup_rate
FROM normed_src GROUP BY source
""")
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication accounting — the dashboard number a
    curation run reports before and after dedup (which sources are
    boilerplate-heavy, which are clean). One grouped pass over md5
    text keys; COUNT(DISTINCT) shuffles 32-byte digests per source,
    never documents."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "source", F.md5(dedup.normalize_text(F.col("text"))).alias("text_key"))
    return (keyed.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("text_key").alias("n_unique"))
            .select("source", "n_docs", "n_unique",
                    (F.col("n_docs") - F.col("n_unique")).alias("n_dups"),
                    F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6)
                    .alias("dup_rate")))


# ---------------------------------------------------------------------------
# Two-stage ANN: int8-quantized IVF candidate scan + full-precision rerank.
# ---------------------------------------------------------------------------

from travel_data_pipeline_spark.functions.oracle_fragments import (
    INT_DOT as _INT_DOT,
    Q8_CTE as _Q8_CTE,
)


@register("ivf_quantized_rerank", f"""
WITH cent AS (
    SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cv
    FROM embeddings WHERE vec_id % 50 = 0
),
{_Q8_CTE.strip()},
assigned AS (
    SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY
                   ROUND(list_dot_product(c.cv, b.v) /
                         (sqrt(list_dot_product(c.cv, c.cv)) *
                          sqrt(list_dot_product(b.v, b.v))), 6) DESC,
                   c.centroid_id ASC) AS rnk
        FROM quant b CROSS JOIN cent c
    ) WHERE rnk = 1
),
q AS (SELECT vec_id AS query_id, v AS qv_full, qv, scale FROM quant
      WHERE vec_id < 5),
probes AS (
    SELECT query_id, centroid_id FROM (
        SELECT q.query_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                   ROUND(list_dot_product(q.qv_full, c.cv) /
                         (sqrt(list_dot_product(q.qv_full, q.qv_full)) *
                          sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                   c.centroid_id ASC) AS rnk
        FROM q CROSS JOIN cent c
    ) WHERE rnk <= 2
),
cand AS (
    SELECT p.query_id, x.vec_id AS neighbor_id
    FROM probes p JOIN assigned x ON x.centroid_id = p.centroid_id
),
stage1 AS (
    SELECT c.query_id, c.neighbor_id,
           ROUND(CAST({_INT_DOT} AS DOUBLE) * a.scale * b.scale, 6)
               AS approx_dot,
           ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
               ROUND(CAST({_INT_DOT} AS DOUBLE) * a.scale * b.scale, 6) DESC,
               c.neighbor_id ASC) AS rnk1
    FROM cand c
    JOIN q a ON a.query_id = c.query_id
    JOIN quant b ON b.vec_id = c.neighbor_id
    WHERE c.neighbor_id <> c.query_id
),
rerank AS (
    SELECT s.query_id, s.neighbor_id, s.approx_dot,
           ROUND(list_dot_product(a.qv_full, b.v) /
                 (sqrt(list_dot_product(a.qv_full, a.qv_full)) *
                  sqrt(list_dot_product(b.v, b.v))), 6) AS cosine_sim
    FROM stage1 s
    JOIN q a ON a.query_id = s.query_id
    JOIN quant b ON b.vec_id = s.neighbor_id
    WHERE s.rnk1 <= 20
)
SELECT query_id, neighbor_id, approx_dot, cosine_sim,
       CAST(rnk AS INT) AS rnk
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
    FROM rerank
) WHERE rnk <= 5
""")
def ivf_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production two-stage ANN: the IVF probe scan scores candidates
    with the int8-quantized dot product (exact integer arithmetic
    times two scales — 4x less memory traffic, engine-deterministic),
    keeps the top 20 per query, and reranks ONLY those with the
    full-precision cosine. At 100 TB the quantized stage is the one
    touching the big index; full vectors load for ~20 rows per query.

    Determinism: the integer dot is exact regardless of order; both
    ranking stages sort on 6-dp-rounded scores with id tie-breaks."""
    emb = load_table(spark, sf_dir, "embeddings")
    from travel_data_pipeline_spark.operators import ml

    v = ml.as_double_vec(F.col("embedding"))
    scale_c, q_c, _, _ = ml.quantize_int8(v)
    quant = emb.select("vec_id", v.alias("v"), scale_c.alias("scale"),
                       q_c.alias("qv"))
    cent = (emb.filter(F.col("vec_id") % 50 == 0)
            .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    assigned = similarity.assign_clusters(emb, cent)

    queries = quant.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv_full"), F.col("qv").alias("qa"),
        F.col("scale").alias("scale_a"))

    cq = cent.select("centroid_id",
                     ml.as_double_vec(F.col("embedding")).alias("c_vec"))
    probes = (queries.crossJoin(F.broadcast(cq))
              .select("query_id", "centroid_id",
                      F.round(similarity.cosine(F.col("qv_full"),
                                                F.col("c_vec")), 6)
                      .alias("sim")))
    wp = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                                F.asc("centroid_id"))
    probed = (probes.withColumn("rnk", F.row_number().over(wp))
              .filter(F.col("rnk") <= 2).select("query_id", "centroid_id"))

    indexed = quant.join(assigned.select("vec_id", "centroid_id"), "vec_id")
    cand = (indexed.join(probed.hint("broadcast"), "centroid_id")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    F.col("v").alias("nv"), F.col("qv").alias("qb"),
                    F.col("scale").alias("scale_b")))

    int_dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: (x.cast("long") * y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    stage1 = (cand.join(F.broadcast(queries), "query_id")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id", "nv", "qv_full",
                      F.round(int_dot.cast("double")
                              * F.col("scale_a") * F.col("scale_b"), 6)
                      .alias("approx_dot")))
    w1 = Window.partitionBy("query_id").orderBy(F.desc("approx_dot"),
                                                F.asc("neighbor_id"))
    kept = (stage1.withColumn("rnk1", F.row_number().over(w1))
            .filter(F.col("rnk1") <= 20))
    rerank = kept.select(
        "query_id", "neighbor_id", "approx_dot",
        F.round(similarity.cosine(F.col("qv_full"), F.col("nv")), 6)
         .alias("cosine_sim"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"),
                                                F.asc("neighbor_id"))
    return (rerank.withColumn("rnk", F.row_number().over(w2))
            .filter(F.col("rnk") <= 5)
            .select("query_id", "neighbor_id", "approx_dot", "cosine_sim",
                    F.col("rnk").cast("int").alias("rnk")))


# ---------------------------------------------------------------------------
# Incremental dedup — a NEW batch probed against the EXISTING corpus.
#
# The production shape for continuously-arriving data: never re-pair
# the corpus against itself, only band the incoming batch and
# equi-join the (pre-computed, stored) corpus band index. Pairs are
# strictly cross-side (existing x incoming): no incoming-incoming, no
# existing-existing work. At 100 TB the corpus band index is a table
# maintained by the versioned sink; the incoming side is small enough
# to BROADCAST against it — the whole probe is then shuffle-free.
#
# Batch split here: doc_id < 400 plays the corpus, >= 400 the incoming
# batch, plus exact copies of 3 corpus docs planted INTO the batch so
# the cross-probe provably catches arriving duplicates.
# ---------------------------------------------------------------------------

INC_BOUNDARY = 400
_INC_DOCS = f"""
docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {PLANT_OFFSET}, text FROM documents WHERE doc_id < 3
)"""


@register("dedup_incremental_lsh", f"""
WITH {_INC_DOCS},
{_NORMED},
{_SHINGLED},
{_SIGS},
{_banded_sql()},
pairs AS (
    SELECT DISTINCT e.doc_id AS doc_a, i.doc_id AS doc_b
    FROM banded e JOIN banded i
      ON e.band_idx = i.band_idx AND e.band_key = i.band_key
     AND e.doc_id < {INC_BOUNDARY} AND i.doc_id >= {INC_BOUNDARY}
),
sets AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sets GROUP BY doc_id),
inter AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter_n
    FROM pairs p
    JOIN sets sa ON sa.doc_id = p.doc_a
    JOIN sets sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
    GROUP BY p.doc_a, p.doc_b
)
SELECT p.doc_a, p.doc_b,
       ROUND(COALESCE(i.inter_n, 0)
             / (za.set_size + zb.set_size - COALESCE(i.inter_n, 0)), 6)
         AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
JOIN sizes za ON za.doc_id = p.doc_a
JOIN sizes zb ON zb.doc_id = p.doc_b
WHERE ROUND(COALESCE(i.inter_n, 0)
            / (za.set_size + zb.set_size - COALESCE(i.inter_n, 0)), 6) >= 0.5
""")
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs between the incoming batch (doc_id >= 400, plus 3
    planted corpus copies) and the existing corpus (doc_id < 400) —
    banded cross-probe, exact-Jaccard verified at 0.5.

    Deliberately NOT on the shared-persisted-shingle pattern (VERDICT
    r04 #4): measured best-of-3 at sf0.1 shows the persist costs 36%
    here (1.37 s vs 1.01 s) because the verify stage only ever explodes
    the few candidate docs (semi-join first), so caching the full
    corpus explode is pure overhead — and this query's incremental
    corpus shares no shingle plan with the augmented-corpus family."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (d.filter(F.col("doc_id") < 3)
               .select((F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
                       "text"))
    docs = d.unionByName(planted)
    sigs = dedup.minhash_signatures(docs, num_hashes=NUM_HASHES)
    banded = dedup.band_explode(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    existing = (banded.filter(F.col("doc_id") < INC_BOUNDARY)
                .withColumnRenamed("doc_id", "doc_a"))
    incoming = (banded.filter(F.col("doc_id") >= INC_BOUNDARY)
                .withColumnRenamed("doc_id", "doc_b"))
    # jaccard_pairs consumes the pair set three times (id semi-join,
    # intersection join, final join) — materialize the tiny post-LSH
    # relation once instead of replaying the signature build per
    # consumer (same measured pattern as dedup_minhash_jaccard).
    # eager checkpoint KEPT (optimization r14): the single-action
    # persist variant measured 2.88 -> 3.28 s on the honest
    # first-computation metric in the interleaved A/B.
    pairs = (existing.join(F.broadcast(incoming),
                           ["band_idx", "band_key"])
             .select("doc_a", "doc_b").distinct()
             .localCheckpoint(eager=True))
    return dedup.jaccard_pairs(docs, pairs, threshold=0.5)


# ---------------------------------------------------------------------------
# Quality-aware canonical selection: within each verified near-dup
# cluster keep the LONGEST member (ties -> smallest doc_id) instead of
# the smallest id — the policy real curation pipelines use (drop the
# truncated/mirrored copies, keep the fullest text).
# ---------------------------------------------------------------------------

@register("dedup_canonical_by_quality", f"""
WITH RECURSIVE {_CC_CTES},
member AS (
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
           length(d.text) AS n_chars
    FROM docs d LEFT JOIN comp c ON c.doc_id = d.doc_id
),
keepers AS (
    SELECT component, doc_id AS keep_id FROM (
        SELECT component, doc_id,
               row_number() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM member) WHERE rn = 1
)
SELECT m.doc_id, m.component, CAST(m.n_chars AS BIGINT) AS n_chars,
       k.keep_id,
       CAST(CASE WHEN m.doc_id <> k.keep_id THEN 1 ELSE 0 END AS INTEGER)
           AS is_duplicate
FROM member m JOIN keepers k USING (component)
""")
def dedup_canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best canonical map over the near-dup clusters: the keeper
    is the longest member (quality proxy), not the smallest id.

    Scale shape: components come from the checkpointed LSH+verify
    pipeline (bounded-shuffle); the keeper election is ONE window pass
    partitioned by component (top-1 pushes down as WindowGroupLimit),
    and the verdict join is component-keyed — no corpus self-join."""
    from pyspark.sql import Window

    docs = _augmented_docs(spark, sf_dir).select(
        "doc_id", F.length("text").alias("n_chars"))
    comps = graph.connected_components(_jaccard_edges(spark, sf_dir))
    member = (docs.join(comps, "doc_id", "left")
              .select("doc_id",
                      F.coalesce("component", "doc_id").alias("component"),
                      "n_chars"))
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    keepers = (member.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("component", F.col("doc_id").alias("keep_id")))
    return (member.join(keepers, "component")
            .select("doc_id", "component", "n_chars", "keep_id",
                    (F.col("doc_id") != F.col("keep_id"))
                    .cast("int").alias("is_duplicate")))


@register("multimodal_resize_meta", """
WITH src AS (
    SELECT doc_id AS media_id, text,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS src_w,
           CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS src_h
    FROM documents
),
scaled AS (
    SELECT media_id, text, src_w, src_h,
           GREATEST(1, CAST(floor(src_w * least(256.0 / src_w,
                                                256.0 / src_h)) AS INT))
             AS dst_w,
           GREATEST(1, CAST(floor(src_h * least(256.0 / src_w,
                                                256.0 / src_h)) AS INT))
             AS dst_h
    FROM src
)
SELECT media_id, src_w, src_h, dst_w, dst_h,
       md5(text || '@' || CAST(dst_w AS VARCHAR) || 'x'
           || CAST(dst_h AS VARCHAR)) AS resized_checksum
FROM scaled
""")
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-fit resize plumbing over synthetic media (payload = utf-8
    text bytes). The scale math is plain double arithmetic spelled
    identically in the oracle, and the fake resized checksum is
    md5(payload || '@' || WxH) — fully SQL-reproducible."""
    from travel_data_pipeline_spark.operators.multimodal import resize_stub

    docs = load_table(spark, sf_dir, "documents")
    return resize_stub(documents_as_media(docs))


@register("multimodal_feature_extract", f"""
SELECT doc_id AS media_id,
       CAST(f.i AS INTEGER) AS dim_idx,
       {round_sql("CAST(('0x' || substr(md5(text || ':' "
                  "|| CAST(f.i AS VARCHAR)), 1, 8)) AS BIGINT)"
                  " / 4294967296.0")} AS value
FROM documents, UNNEST(range(0, 8)) AS f(i)
""")
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-derived fake feature vectors in long format (8 dims per
    media row), Arrow-batched; values round(6) with the parity spelling
    in the oracle (hash/2^32 quotients can graze the .5 boundary)."""
    from travel_data_pipeline_spark.operators.multimodal import (
        feature_extract_stub,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = feature_extract_stub(documents_as_media(docs))
    return feats.select("media_id", "dim_idx",
                        F.round("value", 6).alias("value"))


# ---------------------------------------------------------------------------
# PPJoin-style prefix-filtered set-similarity self-join (Xiao et al.
# 2008) — the THIRD candidate-generation strategy in the dedup family,
# alongside MinHash-LSH banding and SimHash Hamming blocks: for
# Jaccard >= t, two shingle sets ordered by global rarity MUST share a
# token inside their first (|s| - ceil(t*|s|) + 1) rarest tokens, so
# the self-join touches only those short prefixes. Prefix tokens are
# by construction the LOW-df shingles, so bucket fan-out stays small;
# the established MAX_BUCKET cap guards adversarial skew.
# ---------------------------------------------------------------------------

_PP_T = 0.8


@register("ppjoin_prefix_candidates", f"""
WITH {_AUG_DOCS},
{_NORMED},
{_SHINGLED},
ss AS (SELECT DISTINCT doc_id, shingle FROM shingled),
sdf AS (SELECT shingle, count(*) AS dfreq FROM ss GROUP BY shingle),
srank AS (
    SELECT shingle, row_number() OVER (ORDER BY dfreq, shingle) AS srk
    FROM sdf
),
sets AS (
    SELECT doc_id, list(srk ORDER BY srk) AS toks,
           CAST(count(*) AS BIGINT) AS sz
    FROM ss JOIN srank USING (shingle) GROUP BY doc_id
),
prefixes AS (
    SELECT doc_id,
           unnest(toks[1:CAST(sz - ceil({_PP_T} * sz) + 1 AS BIGINT)])
             AS srk
    FROM sets
),
{_capped_sql('prefixes', 'srk', 'pcap')},
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM pcap a JOIN pcap b ON a.srk = b.srk AND a.doc_id < b.doc_id
),
verified AS (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(sa.toks, sb.toks)) AS BIGINT) AS inter,
           sa.sz + sb.sz - len(list_intersect(sa.toks, sb.toks)) AS uni
    FROM cand c
    JOIN sets sa ON sa.doc_id = c.doc_a
    JOIN sets sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS jaccard
FROM verified
WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {_PP_T}
""")
def ppjoin_prefix_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard self-join at t=0.8 over shingle
    sets (corpus augmented with the planted exact copies).

    The global rarity ranking is one window over the shingle
    VOCABULARY (not the corpus); prefixes are ~20% of each set's
    rarest shingles; candidates come only from equality joins on those
    rare tokens, capped per bucket. Verification is an array intersect
    over the two candidate sets — never a corpus-wide pair join.

    Routing (VERDICT r04 #3): dedup.ppjoin_routed_pairs computes the
    exact candidate bound from the prefix relation and falls back to
    banded-LSH candidate generation when it exceeds 5M — on this
    fixture the bound is tiny, so the oracle mirrors the PPJoin path;
    the duplicate-heavy fallback is exercised by tools/stress_ops.py
    and tests/test_cleaning.py."""
    aug = _augmented_docs(spark, sf_dir)
    pairs, strategy = dedup.ppjoin_routed_pairs(
        aug, threshold=_PP_T, max_bucket=MAX_BUCKET)
    assert strategy == "ppjoin", (
        "fixture corpus unexpectedly routed to the LSH fallback — "
        "the oracle mirrors the PPJoin path")
    return pairs
