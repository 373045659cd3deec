"""Training-data curation operators beyond dedup — the rest of what a
large-scale LLM data pipeline runs over a corpus (north-star mandate,
SURVEY.md §2.10 family): deterministic splits, benchmark-contamination
checks, stratified sampling, PII redaction, vocabulary statistics.

Everything is expression-level (md5-keyed determinism, regexp, window
top-k) with an exact DuckDB twin. Scale notes per query; none of them
collects to the driver or self-joins the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from travel_data_pipeline_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from travel_data_pipeline_spark.operators import dedup, text
from travel_data_pipeline_spark.registry import register
from travel_data_pipeline_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Deterministic train/valid/test split — hash the id, not rand(): the
# assignment must survive reruns, repartitioning, and engine changes
# (rand() is none of those). 80/10/10 on a 0..99 bucket.
# ---------------------------------------------------------------------------

_split_hash = md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")
_SPLIT_BUCKET = f"({_split_hash} % 100)"


@register("split_train_valid_test", f"""
SELECT doc_id,
       CAST({_SPLIT_BUCKET} AS INT) AS bucket,
       CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
            WHEN {_SPLIT_BUCKET} < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM documents
""")
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure map — no shuffle at any scale; the split column then serves
    as a partition key for the writer."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (md5_long(F.concat(F.lit("split:"),
                                F.col("doc_id").cast("string"))) % 100)
    return docs.select(
        "doc_id", bucket.cast("int").alias("bucket"),
        F.when(bucket < 80, "train").when(bucket < 90, "valid")
         .otherwise("test").alias("split"))


# ---------------------------------------------------------------------------
# Benchmark-contamination check: fraction of each training doc's
# 5-gram shingles that appear in ANY eval doc (doc_id < 10 plays the
# benchmark set). The eval shingle set is corpus-independent-small ->
# broadcast; the train side streams through one semi-joinable pass.
# ---------------------------------------------------------------------------

@register("contamination_ngram_overlap", """
WITH normed AS (
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
    FROM documents
),
shingled AS (
    SELECT DISTINCT w.doc_id, array_to_string(w.words[i.i:i.i+4], ' ') AS g
    FROM (SELECT doc_id, string_split(norm, ' ') AS words FROM normed) w,
         unnest(generate_series(1, greatest(len(w.words) - 4, 0))) AS i(i)
),
eval_grams AS (SELECT DISTINCT g FROM shingled WHERE doc_id < 10),
train AS (SELECT doc_id, g FROM shingled WHERE doc_id >= 10),
scored AS (
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
    FROM train t LEFT JOIN eval_grams e ON t.g = e.g
    GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_hit AS BIGINT) AS n_hit,
       ROUND(n_hit / n_grams, 6) AS contamination
FROM scored WHERE n_hit > 0
""")
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination, the n-gram way. At 100 TB the eval
    side is a benchmark suite (MBs) — broadcast it; one pass over the
    training shingles, no corpus self-join."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_sets(docs, shingle_n=5).withColumnRenamed("shingle", "g")
    eval_grams = sh.filter(F.col("doc_id") < 10).select("g").distinct()
    train = sh.filter(F.col("doc_id") >= 10)
    scored = (train.join(F.broadcast(eval_grams.withColumn("_hit", F.lit(1))),
                         "g", "left")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_grams"),
                   F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit")))
    return (scored.filter(F.col("n_hit") > 0)
            .select("doc_id", "n_grams", "n_hit",
                    F.round(F.col("n_hit") / F.col("n_grams"), 6)
                     .alias("contamination")))


# ---------------------------------------------------------------------------
# Stratified sampling: per-language keep-rates, hash-thresholded so the
# sample is deterministic and rerun-stable (the curation analogue of
# TABLESAMPLE ... REPEATABLE, but portable).
# ---------------------------------------------------------------------------

_RATES = {"en": 200, "de": 100, "fr": 100}  # out of 1000
_samp_hash = md5_long_sql("'samp:' || CAST(doc_id AS VARCHAR)")
_SAMP_HASH = f"({_samp_hash} % 1000)"
_RATE_SQL = ("CASE " + " ".join(
    f"WHEN lang = '{lg}' THEN {r}" for lg, r in _RATES.items()) +
    " ELSE 50 END")


@register("sample_stratified_by_lang", f"""
SELECT doc_id, lang
FROM documents
WHERE {_SAMP_HASH} < {_RATE_SQL}
""")
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter — predicate-pushdown-friendly, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.lit("samp:"),
                          F.col("doc_id").cast("string"))) % 1000
    rate = F.lit(50)
    for lg, r in _RATES.items():
        rate = F.when(F.col("lang") == lg, F.lit(r)).otherwise(rate)
    return docs.filter(h < rate).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# PII redaction: mask emails/phone-shaped substrings, count what was
# masked. The corpus has no planted PII, so both engines augment
# deterministically (doc_id % 7 == 0 gets a synthetic contact line) —
# the observable is the redaction arithmetic, not the data.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
_PHONE_RE = "[+][0-9]{2}[- ][0-9]{3,4}[- ][0-9]{4}"


@register("pii_redaction", f"""
WITH augmented AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com or +82 10-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-1234'
                ELSE text END AS text
    FROM documents
),
redacted AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(lower(text),
               '{_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PHONE_RE}', '[PHONE]', 'g') AS clean
    FROM augmented
)
SELECT doc_id,
       CAST(len(regexp_extract_all(clean, '\\[EMAIL\\]')) AS INT)
         AS n_emails,
       CAST(len(regexp_extract_all(clean, '\\[PHONE\\]')) AS INT)
         AS n_phones,
       md5(clean) AS clean_md5
FROM redacted
WHERE doc_id % 7 = 0
""")
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masking is regexp_replace — JVM-side, streaming-friendly, no
    shuffle. Counts come from the redacted text so the query also
    proves the masks landed (md5 pins the exact output)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"),
                        F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com or +82 10-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"),
                               4, "0"),
                        F.lit("-1234")))
         .otherwise(F.col("text")).alias("text"))
    clean = F.regexp_replace(
        F.regexp_replace(F.lower("text"), _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE, "[PHONE]")
    return (aug.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id",
                    F.size(F.regexp_extract_all(clean, F.lit(r"\[EMAIL\]"), 0))
                     .alias("n_emails"),
                    F.size(F.regexp_extract_all(clean, F.lit(r"\[PHONE\]"), 0))
                     .alias("n_phones"),
                    F.md5(clean).alias("clean_md5")))


# ---------------------------------------------------------------------------
# Vocabulary statistics: top-5 tokens per language by frequency — the
# W2 pattern over an exploded token relation (corpus token histogram).
# ---------------------------------------------------------------------------

@register("corpus_vocab_topk", """
WITH toks AS (
    SELECT lang, unnest(list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '')) AS token
    FROM documents
),
counted AS (
    SELECT lang, token, COUNT(*) AS n
    FROM toks GROUP BY lang, token
)
SELECT lang, token, n, CAST(rnk AS INT) AS rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
        ORDER BY n DESC, token ASC) AS rnk
    FROM counted
) WHERE rnk <= 5
""")
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two shuffles ((lang, token) count, then lang top-k) — the
    second operates on the already-aggregated histogram, which is
    vocabulary-sized, not corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.filter(text.token_array(
            dedup.normalize_text(F.col("text"))),
            lambda t: t != "")).alias("token"))
    counted = toks.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(),
                                           F.col("token").asc())
    return (counted.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
            .select("lang", "token", "n", F.col("rnk").cast("int")))


# ---------------------------------------------------------------------------
# Token-budget shard packing: assign each doc to a ~TOKEN_BUDGET-token
# shard, the precursor of sequence packing for LLM training. The
# running sum is windowed WITHIN (source, lang) streams — each stream
# sorts independently (sessionize shape), so no global single-reducer
# sort; a corpus writer then writes one file set per
# (source, lang, shard). Deterministic order (doc_id) keeps the
# assignment stable across reruns and repartitioning.
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 120


@register("pack_token_shards", f"""
WITH toked AS (
    SELECT doc_id, source, lang,
           len(list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '')) AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, source, lang, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY source, lang ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM toked
)
SELECT doc_id, source, lang, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(floor((cum_tokens - n_tokens) / {TOKEN_BUDGET}.0) AS BIGINT)
         AS shard_id
FROM packed
""")
def pack_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy shard assignment: a doc opens a new shard when the
    running token count crosses the budget. ``shard_id`` derives from
    the cumsum BEFORE adding the current doc, so every shard holds at
    least one doc and overruns by at most one doc — the standard
    streaming-packing rule."""
    docs = load_table(spark, sf_dir, "documents")
    w = (Window.partitionBy("source", "lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    toked = docs.select(
        "doc_id", "source", "lang",
        text.whitespace_token_count(F.col("text")).alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return toked.select(
        "doc_id", "source", "lang", "n_tokens",
        cum.cast("long").alias("cum_tokens"),
        F.floor((cum - F.col("n_tokens")) / float(TOKEN_BUDGET))
         .cast("long").alias("shard_id"))


# ---------------------------------------------------------------------------
# Source-mixture weighting — the "data mixing" step: given a target
# share per source (uniform here), compute the capped sampling rate
# that moves the corpus toward it (public recipe: The Pile /
# Dolma-style source reweighting). Shape: one full-scan token count ->
# per-source aggregate (tiny) -> 1-row total broadcast — the scalar-
# subquery pattern; nothing wide ever re-shuffles.
# ---------------------------------------------------------------------------

@register("mixture_weights_by_source", """
WITH toked AS (
    SELECT source,
           len(list_filter(string_split(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
               x -> x <> '')) AS n_tokens
    FROM documents
),
per AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM toked GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens, COUNT(*) AS k
    FROM per
)
SELECT p.source, p.n_docs, p.n_tokens,
       ROUND(p.n_tokens / t.tot_tokens, 6) AS token_share,
       ROUND(1.0 / t.k, 6) AS target_share,
       ROUND(LEAST(1.0, (t.tot_tokens / t.k) / p.n_tokens), 6)
         AS sampling_rate,
       CAST(floor(p.n_tokens
                  * LEAST(1.0, (t.tot_tokens / t.k) / p.n_tokens))
            AS BIGINT) AS sampled_tokens
FROM per p, tot t
""")
def mixture_weights_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-target mixture weights per source. Oversized sources get
    rate < 1 (downsample); undersized keep rate 1.0 (no upsampling —
    repetition policy belongs to the trainer, not the curator)."""
    docs = load_table(spark, sf_dir, "documents")
    per = (docs
           .select("source",
                   text.whitespace_token_count(F.col("text")).alias("n_tokens"))
           .groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens")))
    tot = per.agg(F.sum("n_tokens").alias("tot_tokens"),
                  F.count("*").alias("k"))
    rate = F.least(F.lit(1.0),
                   (F.col("tot_tokens") / F.col("k")) / F.col("n_tokens"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens",
        F.round(F.col("n_tokens") / F.col("tot_tokens"), 6)
         .alias("token_share"),
        F.round(F.lit(1.0) / F.col("k"), 6).alias("target_share"),
        F.round(rate, 6).alias("sampling_rate"),
        F.floor(F.col("n_tokens") * rate).cast("long")
         .alias("sampled_tokens"))


# ---------------------------------------------------------------------------
# Flagship curation v2: entropy-gate -> context-window chunk -> shard
# packing — the assembly line from raw docs to training-ready shards.
# ---------------------------------------------------------------------------

_V2_TOKS = ("list_filter(string_split(trim(regexp_replace(lower(text), "
            "'\\s+', ' ', 'g')), ' '), t -> t <> '')")
_V2_BUDGET = 1000


@register("pipeline_chunked_shards", f"""
WITH tok AS (
    SELECT doc_id, lang, t AS term
    FROM (SELECT doc_id, lang, unnest({_V2_TOKS}) AS t FROM documents)
),
tf AS (SELECT doc_id, lang, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
stats AS (
    SELECT doc_id, lang,
           SUM(tf) AS n_tokens, COUNT(*) AS n_terms,
           round(ln(SUM(tf)) - SUM(tf * ln(tf)) / SUM(tf), 6) AS entropy
    FROM tf GROUP BY doc_id, lang
),
gated AS (
    SELECT doc_id, lang FROM stats
    WHERE n_tokens >= 20 AND 1.0 * n_terms / n_tokens >= 0.2
      AND entropy >= 2.0
),
words AS (
    SELECT d.doc_id, g.lang, {_V2_TOKS} AS ws, len({_V2_TOKS}) AS n
    FROM documents d JOIN gated g USING (doc_id)
),
chunks AS (
    SELECT w.doc_id, w.lang,
           CAST((s.s - 1) // 30 AS INT) AS chunk_idx,
           len(w.ws[s.s : s.s + 39]) AS n_chunk
    FROM words w, unnest(generate_series(1, w.n, 30)) s(s)
),
packed AS (
    SELECT lang, doc_id, chunk_idx, n_chunk,
           SUM(n_chunk) OVER (PARTITION BY lang
                              ORDER BY doc_id, chunk_idx
                              ROWS UNBOUNDED PRECEDING) AS cum
    FROM chunks
)
SELECT lang,
       CAST(floor((cum - n_chunk) / {_V2_BUDGET}.0) AS BIGINT) AS shard_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(n_chunk) AS BIGINT) AS n_tokens,
       COUNT(DISTINCT doc_id) AS n_docs
FROM packed
GROUP BY lang, floor((cum - n_chunk) / {_V2_BUDGET}.0)
""")
def pipeline_chunked_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation assembly line v2: token-entropy quality gate ->
    overlapping context-window chunking (40/30) -> greedy token-budget
    shard packing per language -> per-shard accounting.

    Scale shape: the gate and chunker are one explode + grouped agg
    and one pure projection; packing reuses pack_token_shards' running
    cumsum rule (per-stream window ordered by (doc_id, chunk_idx) —
    each language is an independent packing stream, so parallelism =
    |langs|; for more streams the partition key widens to
    (lang, doc_id bucket) exactly as in pack_token_shards). Everything
    stays integer arithmetic — no float drift anywhere."""
    from travel_data_pipeline_spark.operators.text import token_array

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang",
                      F.explode(token_array(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "lang", "term").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("doc_id", "lang").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_terms"),
        F.round(F.log(F.sum("tf"))
                - F.sum(F.col("tf") * F.log("tf")) / F.sum("tf"), 6)
         .alias("entropy"))
    gated = stats.filter(
        (F.col("n_tokens") >= 20)
        & (1.0 * F.col("n_terms") / F.col("n_tokens") >= 0.2)
        & (F.col("entropy") >= 2.0)).select("doc_id", "lang")
    words = (docs.join(gated.select("doc_id"), "doc_id")
             .select("doc_id", "lang", token_array(F.col("text")).alias("ws")))
    words = words.withColumn("n", F.size("ws")).filter(F.col("n") >= 1)
    chunks = (words.select(
        "doc_id", "lang",
        F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(30))).alias("s"),
        "ws")
        .select("doc_id", "lang",
                F.expr("CAST((s - 1) DIV 30 AS INT)").alias("chunk_idx"),
                F.size(F.slice(F.col("ws"), F.col("s"), 40)).alias("n_chunk")))
    w = (Window.partitionBy("lang").orderBy("doc_id", "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = chunks.withColumn("cum", F.sum("n_chunk").over(w))
    shard = F.floor((F.col("cum") - F.col("n_chunk")) / float(_V2_BUDGET))
    return (packed
            .groupBy("lang", shard.cast("long").alias("shard_id"))
            .agg(F.count("*").alias("n_chunks"),
                 F.sum("n_chunk").alias("n_tokens"),
                 F.countDistinct("doc_id").alias("n_docs")))


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES / Efraimidis-Spirakis):
# each row draws a deterministic hash-uniform u in (0, 1] and competes
# on key = ln(u) / weight; the top-k keys per group ARE a weighted
# sample without replacement. Hash-derived u (not rand()) keeps the
# sample rerun- and partitioning-stable — same contract as
# split_train_valid_test / sample_stratified_by_lang, but with
# per-row weights (here n_chars: longer docs proportionally likelier).
# Scale: one window top-k per group, no global sort, no driver state.
# ---------------------------------------------------------------------------

_WS_K = 5
_ws_hash = md5_long_sql("'wsamp:' || CAST(doc_id AS VARCHAR)")
_ws_u = f"((({_ws_hash}) % 1000000) + 1) / 1000000.0"


@register("weighted_sample_docs", f"""
WITH keyed AS (
    SELECT lang, doc_id, n_chars,
           ln({_ws_u}) / n_chars AS k
    FROM documents
),
ranked AS (
    SELECT lang, doc_id, n_chars, k,
           row_number() OVER (PARTITION BY lang
                              ORDER BY k DESC, doc_id) AS rn
    FROM keyed
)
SELECT lang, doc_id, n_chars,
       round(k, 6) + 0.0 AS sample_key,   -- +0.0: u=1 gives k=-0.0 in one
       CAST(rn AS INT) AS rn              -- engine, +0.0 in the other
FROM ranked WHERE rn <= {_WS_K}
""")
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (k=5 per language), weight =
    n_chars. The ln(u)/w keys are bit-identical in both engines (u is
    integer-derived), so the rank order — and therefore the sample —
    matches exactly."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    u = ((md5_long(F.concat(F.lit("wsamp:"),
                            F.col("doc_id").cast("string")))
          % 1000000 + 1) / F.lit(1000000.0))
    keyed = docs.select("lang", "doc_id", "n_chars",
                        (F.log(u) / F.col("n_chars")).alias("k"))
    w = Window.partitionBy("lang").orderBy(F.col("k").desc(), F.col("doc_id"))
    return (keyed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _WS_K)
            .select("lang", "doc_id", "n_chars",
                    (F.round("k", 6) + F.lit(0.0)).alias("sample_key"),
                    F.col("rn").cast("int").alias("rn")))


# ---------------------------------------------------------------------------
# Governance layer: the checks a training-data platform runs BEFORE a
# corpus ships — split-leakage detection, per-source datasheet stats,
# deterministic contrastive negatives, and tokenizer-fertility audits.
# ---------------------------------------------------------------------------

_LEAK_OFFSET = 100000  # planted-copy id space (cf. queries_northstar)
_leak_hash = md5_long_sql("'split:' || CAST(doc_id AS VARCHAR)")
_LEAK_BUCKET = f"({_leak_hash} % 100)"
_LEAK_SPLIT = (f"CASE WHEN {_LEAK_BUCKET} < 80 THEN 'train' "
               f"WHEN {_LEAK_BUCKET} < 90 THEN 'valid' ELSE 'test' END")


@register("split_leakage_check", f"""
WITH docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_LEAK_OFFSET}, text FROM documents WHERE doc_id < 10
),
assigned AS (
    SELECT doc_id, md5(text) AS content_hash, {_LEAK_SPLIT} AS split
    FROM docs
),
leaks AS (
    SELECT content_hash,
           count(*) AS n_docs,
           count(DISTINCT split) AS n_splits,
           array_to_string(list_sort(list(DISTINCT split)), ',') AS splits
    FROM assigned GROUP BY content_hash
)
SELECT content_hash, n_docs, n_splits, splits
FROM leaks WHERE n_splits > 1
""")
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect identical documents assigned to different train/valid/test
    splits — the eval-leakage bug class the split must be audited for
    whenever dedup runs AFTER splitting.

    Same hash-bucket assignment as split_train_valid_test; the corpus
    is augmented with exact copies of doc_id < 10 (the synthetic corpus
    has no natural duplicates) so the leak path is observable. One
    groupBy(content_hash) shuffle carrying a 32-byte hash per doc —
    never the text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (docs.filter(F.col("doc_id") < 10)
               .select((F.col("doc_id") + _LEAK_OFFSET).alias("doc_id"),
                       "text"))
    aug = docs.unionByName(planted)
    bucket = (md5_long(F.concat(F.lit("split:"),
                                F.col("doc_id").cast("string"))) % 100)
    assigned = aug.select(
        F.md5("text").alias("content_hash"),
        F.when(bucket < 80, "train").when(bucket < 90, "valid")
         .otherwise("test").alias("split"))
    return (assigned.groupBy("content_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("split").alias("n_splits"),
                 F.array_join(F.array_sort(F.collect_set("split")), ",")
                  .alias("splits"))
            .filter(F.col("n_splits") > 1))


@register("dataset_card_stats", """
WITH toked AS (
    SELECT source, lang, n_chars,
           len(list_filter(string_split(trim(regexp_replace(lower(text),
               '\\s+', ' ', 'g')), ' '), t -> t <> '')) AS ws_toks
    FROM documents
)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(ws_toks) AS BIGINT) AS tok_total,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       round(CAST(sum(ws_toks) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS mean_toks,
       round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) + 0.0 AS en_share
FROM toked GROUP BY source
""")
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source datasheet rollup (docs, langs, token/char volume,
    language share) — the 'data card' table published with a corpus
    release. One map-side-combinable groupBy over exact integer
    accumulators; the two ratios are single deterministic double
    divisions at the end."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "source", "lang", "n_chars",
        text.whitespace_token_count(F.col("text")).alias("ws_toks"))
    n = F.count("*")
    return (toked.groupBy("source")
            .agg(n.alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("ws_toks").alias("tok_total"),
                 F.sum("n_chars").alias("chars_total"),
                 F.round(F.sum("ws_toks").cast("double")
                         / n.cast("double"), 6).alias("mean_toks"),
                 (F.round(F.sum(F.when(F.col("lang") == "en", 1)
                                .otherwise(0)).cast("double")
                          / n.cast("double"), 6) + 0.0).alias("en_share")))


_NEG_K = 5          # negatives per anchor
_NEG_POOL = 50      # candidate-pool rate, out of 1000 (5% of corpus)
_neg_pool_hash = md5_long_sql("'pool:' || CAST(doc_id AS VARCHAR)")
_neg_rank_hash = md5_long_sql(
    "'neg:' || CAST(anchor_id AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")


@register("negative_sample_pairs", f"""
WITH anchors AS (
    SELECT doc_id AS anchor_id, source AS anchor_source
    FROM documents WHERE doc_id < 20
),
pool AS (
    SELECT doc_id, source FROM documents
    WHERE ({_neg_pool_hash} % 1000) < {_NEG_POOL}
),
scored AS (
    SELECT a.anchor_id, p.doc_id,
           {_neg_rank_hash} AS rk
    FROM anchors a JOIN pool p ON p.source <> a.anchor_source
),
ranked AS (
    SELECT anchor_id, doc_id, rk,
           row_number() OVER (PARTITION BY anchor_id
                              ORDER BY rk, doc_id) AS neg_rank
    FROM scored
)
SELECT anchor_id, doc_id AS neg_id, CAST(neg_rank AS INT) AS neg_rank
FROM ranked WHERE neg_rank <= {_NEG_K}
""")
def negative_sample_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: for each anchor doc, the
    _NEG_K pseudo-random corpus docs (different source) ranked by a
    seeded hash — reproducible across reruns, engines, and partitioning,
    unlike rand()-based sampling.

    Scale shape: the corpus is FIRST thinned to a ~5% hash-gated
    candidate pool (a pushed-down scan filter), so the anchor x pool
    join and the per-anchor top-k window run over a bounded relation —
    never anchors x full-corpus."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    anchors = (docs.filter(F.col("doc_id") < 20)
               .select(F.col("doc_id").alias("anchor_id"),
                       F.col("source").alias("anchor_source")))
    pool_gate = (md5_long(F.concat(F.lit("pool:"),
                                   F.col("doc_id").cast("string"))) % 1000)
    pool = (docs.filter(pool_gate < _NEG_POOL).select("doc_id", "source"))
    scored = (pool.join(F.broadcast(anchors),
                        F.col("source") != F.col("anchor_source"))
              .select("anchor_id", "doc_id",
                      md5_long(F.concat(
                          F.lit("neg:"),
                          F.col("anchor_id").cast("string"), F.lit(":"),
                          F.col("doc_id").cast("string"))).alias("rk")))
    w = Window.partitionBy("anchor_id").orderBy("rk", "doc_id")
    return (scored.withColumn("neg_rank", F.row_number().over(w))
            .filter(F.col("neg_rank") <= _NEG_K)
            .select("anchor_id", F.col("doc_id").alias("neg_id"),
                    F.col("neg_rank").cast("int").alias("neg_rank")))


_BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


@register("tokenizer_fertility_by_lang", f"""
WITH toked AS (
    SELECT lang,
           len(list_filter(string_split(trim(regexp_replace(lower(text),
               '\\s+', ' ', 'g')), ' '), t -> t <> '')) AS ws_toks,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_toks
    FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(ws_toks) AS BIGINT) AS ws_total,
       CAST(sum(bpe_toks) AS BIGINT) AS bpe_total,
       round(CAST(sum(bpe_toks) AS DOUBLE) / CAST(sum(ws_toks) AS DOUBLE), 6)
         AS fertility
FROM toked GROUP BY lang
""")
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility audit: BPE-ish pieces per whitespace word,
    by language — the standard check that a tokenizer doesn't tax some
    languages with far more pieces per word than others. Both token
    counts are exact integers (sum-combinable); the fertility ratio is
    one double division per output row."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "lang",
        text.whitespace_token_count(F.col("text")).alias("ws_toks"),
        text.bpe_ish_token_count(F.col("text")).alias("bpe_toks"))
    return (toked.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("ws_toks").alias("ws_total"),
                 F.sum("bpe_toks").alias("bpe_total"),
                 F.round(F.sum("bpe_toks").cast("double")
                         / F.sum("ws_toks").cast("double"), 6)
                  .alias("fertility")))
