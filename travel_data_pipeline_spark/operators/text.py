"""Text-analysis operators — SURVEY.md §2.10 (north-star mandate).

Language-ID, quality scoring, token counting, and document
fingerprinting over the ``documents`` table. All pure Column
expressions (regexp/length/md5) — JVM-side, whole-stage-codegen'd, and
reproducible by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from travel_data_pipeline_spark.operators.dedup import normalize_text

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# (Public common-word lists; the heuristic is ratio-of-hits per language.)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "del", "para"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "人", "这"),
}


def token_array(text: Column) -> Column:
    """Whitespace tokens of normalized text (empty-safe)."""
    return F.filter(F.split(normalize_text(text), " "), lambda t: t != "")


def whitespace_token_count(text: Column) -> Column:
    return F.size(token_array(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: count word pieces + digits + punctuation runs
    with a GPT-2-style pre-tokenizer regex (public pattern)."""
    return F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(token_array(text),
                           lambda t: t.isin(*[F.lit(w) for w in words])))


def language_scores(t: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit columns, built ONCE — callers needing
    both the argmax decision and the best score pass these to
    ``language_pred`` instead of rebuilding the regex/array work per
    use (higher-order filter expressions are not reliably
    subexpression-eliminated by Catalyst)."""
    return [(lang, stopword_hits(t, lang)) for lang in STOPWORDS]


def language_pred(t: Column,
                  hits: list[tuple[str, Column]] | None = None) -> Column:
    """The language-ID decision column: argmax of per-language
    stopword hits ('und' when no list scores). First-declared language
    wins ties — the when-chain mirrors the oracle CASE order."""
    if hits is None:
        hits = language_scores(t)
    # argmax via greatest over structs (score, -lang ordinal) is clumsy;
    # a when-chain over the 5 fixed languages stays a flat expression.
    best_score = F.greatest(*[h for _, h in hits])
    pred = F.lit("und")
    for lang, h in reversed(list(hits)):
        pred = F.when((best_score > 0) & (h == best_score),
                      F.lit(lang)).otherwise(pred)
    return pred


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Heuristic language-ID: argmax of per-language stopword-hit ratio;
    below ``min_ratio`` falls back to 'und' (undetermined).

    One projection pass — |langs| countings per row, no shuffle at all;
    the hit expressions are shared between the decision and the ratio.
    """
    t = F.col(text_col)
    n_tokens = whitespace_token_count(t)
    hits = language_scores(t)
    best_score = F.greatest(*[h for _, h in hits])
    return docs.select(
        F.col(id_col), F.col(text_col),
        language_pred(t, hits).alias("pred_lang"),
        F.round(best_score / F.greatest(n_tokens, F.lit(1)), 6)
         .alias("stopword_ratio"),
    )


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a blended [0,100] quality score.

    Features follow the public C4/Gopher-style filters: length, mean
    word length, punctuation density, alpha ratio, stopword presence,
    duplicate-line ratio.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    tokens = token_array(t)
    n_tokens = F.size(tokens)
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct_chars = F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}]", ""))
    en_hits = stopword_hits(t, "en")

    alpha_ratio_raw = alpha_chars / F.greatest(n_chars, F.lit(1))
    punct_ratio_raw = punct_chars / F.greatest(n_chars, F.lit(1))
    stop_ratio_raw = en_hits / F.greatest(n_tokens, F.lit(1))
    mean_word_len = F.round(alpha_chars / F.greatest(n_tokens, F.lit(1)), 6)
    alpha_ratio = F.round(alpha_ratio_raw, 6)
    punct_ratio = F.round(punct_ratio_raw, 6)
    stop_ratio = F.round(stop_ratio_raw, 6)

    # Blend: reward length (log-saturated), alpha text, some stopwords;
    # punish extreme punctuation. Clamped [0, 100]. Uses the UNROUNDED
    # ratios (the rounded forms are display columns only).
    raw = (F.least(F.log10(n_chars.cast("double") + 1.0) * 25.0, F.lit(60.0))
           + alpha_ratio_raw * 20.0 + stop_ratio_raw * 30.0
           - punct_ratio_raw * 40.0)
    score = F.round(F.greatest(F.lit(0.0), F.least(F.lit(100.0), raw)), 6)

    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_engine"),
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts, chars per token."""
    t = F.col(text_col)
    ws = whitespace_token_count(t)
    bpe = bpe_ish_token_count(t)
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(F.length(t) / F.greatest(bpe, F.lit(1)), 6).alias("chars_per_token"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher-style repetition statistics per document (public filter
    family: Rae et al. 2021 "Scaling Language Models", table A1).

    - ``ttr``             type-token ratio (distinct/total tokens)
    - ``top_ngram_frac``  share of n-gram occurrences taken by the most
                          frequent n-gram of the document
    - ``dup_ngram_frac``  share of n-gram occurrences whose n-gram
                          appears more than once

    Scale shape: ONE corpus scan. ttr inputs are computed as array
    expressions before the explode; the per-doc constants ride along
    the exploded (id, gram) rows (two ints — negligible shuffle
    weight), so no second scan or join-back is needed. Aggregation is
    word-count-shaped — (id, gram) then (id); both keys fine-grained
    and skew-free, the wide text column is dropped before the explode,
    and a doc's grams never meet another doc's, so nothing is
    quadratic — this survives a 100 TB corpus.
    """
    did = F.col(id_col)
    # spread the CPU-heavy tokenize/gram expressions across cores when
    # the input arrives in few partitions (single-file scan); same
    # pattern as dedup's shingle explode
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, id_col)
    base = docs.select(
        did,
        token_array(F.col(text_col)).alias("toks"),
    ).select(
        did,
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_types"),
        F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(F.col("toks"), i + j)
                           for j in range(n)])),
        ).otherwise(F.array().cast("array<string>")).alias("grams"),
    )
    # explode_outer keeps gram-less docs (empty / single-token) as one
    # null-gram row, so they survive to the final result without a join
    gram_counts = (base.select(did, "n_tokens", "n_types",
                               F.explode_outer("grams").alias("gram"))
                   .groupBy(id_col, "gram")
                   .agg(F.count("*").alias("c"),
                        F.first("n_tokens").alias("n_tokens"),
                        F.first("n_types").alias("n_types")))
    real = F.col("gram").isNotNull()
    rep = gram_counts.groupBy(id_col).agg(
        F.first("n_tokens").alias("n_tokens"),
        F.first("n_types").alias("n_types"),
        F.max(F.when(real, F.col("c"))).alias("top_c"),
        F.sum(F.when(real, F.col("c")).otherwise(F.lit(0)))
         .alias("total_grams"),
        F.sum(F.when(real & (F.col("c") > 1), F.col("c")).otherwise(F.lit(0)))
         .alias("dup_occ"),
    )
    denom = F.greatest(F.col("total_grams"), F.lit(1))
    return rep.select(
        did,
        F.col("n_tokens"),
        F.col("n_types"),
        F.round(F.col("n_types") / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
         .alias("ttr"),
        F.round(F.coalesce(F.col("top_c"), F.lit(0)) / denom, 6)
         .alias(f"top_{n}gram_frac"),
        F.round(F.col("dup_occ") / denom, 6)
         .alias(f"dup_{n}gram_frac"),
    )


def curation_flags(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """C4/Gopher-style document filter flags + keep decision (public
    filter family: Raffel et al. 2020 C4 §2.2, Rae et al. 2021 A1).

    Row-local expressions only — no shuffle, fully codegen'd: word
    count bounds, mean-word-length window, symbol-to-word ratio,
    boilerplate markers (lorem ipsum / curly brace)."""
    t = F.col(text_col)
    toks = token_array(t)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    mean_wl = alpha_chars / F.greatest(n_tokens, F.lit(1))
    symbols = F.length(t) - F.length(F.regexp_replace(t, r"[#{}\|]", ""))
    low = F.lower(t)
    flag_short = n_tokens < 5
    flag_word_len = (mean_wl < 3.0) | (mean_wl > 10.0)
    flag_symbols = (symbols / F.greatest(n_tokens, F.lit(1))) > 0.1
    flag_lorem = low.contains("lorem ipsum")
    flag_brace = low.contains("{")
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        flag_short.alias("flag_too_short"),
        flag_word_len.alias("flag_word_len"),
        flag_symbols.alias("flag_symbol_ratio"),
        flag_lorem.alias("flag_lorem"),
        flag_brace.alias("flag_brace"),
        (~(flag_short | flag_word_len | flag_symbols | flag_lorem
           | flag_brace)).alias("keep"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 window: int = 64, stride: int = 32) -> DataFrame:
    """Content fingerprints: full-text md5 + winnowed rolling fingerprint.

    The rolling form is the winnowing scheme (public MOSS-style): hash
    every ``window``-char chunk at ``stride`` offsets, keep the min —
    robust to local edits. All string expressions, oracle-reproducible.
    """
    t = normalize_text(F.col(text_col))
    n_windows = F.greatest(
        ((F.length(t) - F.lit(window)) / F.lit(stride)).cast("int") + 1, F.lit(1))
    chunk_hashes = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda i: F.md5(t.substr(i * stride + 1, F.lit(window))))
    return docs.select(
        F.col(id_col),
        F.md5(t).alias("full_md5"),
        F.array_min(chunk_hashes).alias("winnow_fp"),
    )
