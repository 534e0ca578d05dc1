"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Mirrors the reference's per-doc text gates (language filter F8,
services/indexer/utils/utils.py:80-84; summary/length handling F9) as
deterministic, SQL-expressible column plans — built-ins only, fully
codegen'd, no Python in the hot path.  The py3langid classifier is
replaced by a stopword-overlap heuristic (the classic n-gram/function-word
method) so results are reproducible without model files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import tokens_col

# Tiny frozen function-word lists (the langid feature sets). Deliberately
# literal-in-repo for determinism (SURVEY.md §7.3 — no runtime downloads).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with", "that", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que"],
}

EN_STOPWORDS = LANG_MARKERS["en"]


def _marker_hits(lang: str) -> Column:
    toks = tokens_col()
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(
        F.filter(toks, lambda t: F.array_contains(markers, t))
    )


def language_id(docs: DataFrame) -> DataFrame:
    """F8 analogue: predict language by function-word overlap ratio;
    'und' (undetermined) when no marker hits.  Ties break by the frozen
    language order en > de > fr (greatest-first comparison)."""
    hits = {lang: _marker_hits(lang) for lang in LANG_MARKERS}
    n_toks = F.size(tokens_col())
    pred = (
        F.when(F.greatest(*hits.values()) == F.lit(0), F.lit("und"))
        .when(hits["en"] >= F.greatest(hits["de"], hits["fr"]), F.lit("en"))
        .when(hits["de"] >= hits["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        F.round(
            F.when(n_toks > 0, hits["en"] / n_toks).otherwise(F.lit(0.0)), 6
        ).alias("en_marker_ratio"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score (the standard pretraining
    corpus filters: length, mean word length, stopword ratio, symbol
    ratio).  score = stopword_ratio·0.4 + clamp(n_tokens/100)·0.3 +
    (1-symbol_ratio)·0.3 — frozen weights."""
    t = tokens_col(text_col)
    text = F.col(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(text)
    sw = F.array(*[F.lit(m) for m in EN_STOPWORDS])
    sw_hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    alnum_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    symbol_ratio = F.when(
        n_chars > 0, (n_chars - alnum_chars - F.length(F.regexp_replace(text, "[^ ]", ""))) / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, sw_hits / n_tokens).otherwise(F.lit(0.0))
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(
            stop_ratio * 0.4 + length_score * 0.3 + (F.lit(1.0) - symbol_ratio) * 0.3,
            6,
        ).alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting three ways per doc: whitespace tokens, alnum tokens
    (frozen tokenizer), and a BPE-ish subword count (runs of letters,
    runs of digits, or single non-space symbols — the pre-merge piece
    count a byte-pair encoder starts from)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, " +"), lambda x: x != F.lit("")))
    alnum = F.size(tokens_col(text_col))
    bpe = F.regexp_count(F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        alnum.cast("long").alias("alnum_tokens"),
        bpe.cast("long").alias("bpe_pieces"),
    )


def fingerprints(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Document fingerprint: the min-hash of word n-gram shingles (a
    1-sample winnowing fingerprint) + the distinct-shingle count.  Equal
    fingerprints => near-certain shared content prefix window."""
    from .dedup import doc_shingles

    sh = doc_shingles(docs, n, text_col)
    return (
        sh.groupBy("doc_id")
        .agg(
            F.min(F.md5("shingle")).alias("fingerprint"),
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.45,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """Composed training-data curation pipeline — the order every
    large-scale pretraining pipeline runs: (1) quality gate (composite
    score + token-count bounds), (2) exact dedup keeping the lowest
    doc_id per distinct content.  Returns the kept docs with their
    features.  Cost at scale: the quality gate is a pure column plan
    (pushes into the scan); the only shuffle is the dedup groupBy on the
    content hash — linear in survivors.

    NEAR-dup removal is the next stage: feed this output's doc_ids to
    dedup.dedup_keep_one (quality=this frame's quality_score), which
    clusters the verified LSH pair graph via connected components and
    keeps the best-quality doc per cluster — see
    tests/test_textstats_analytics.py::test_curation_then_near_dup for
    the composed pipeline."""
    q = quality_scores(docs, text_col)
    passing = (
        docs.select("doc_id", text_col)
        .join(q, "doc_id")
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
        )
    )
    canon = (
        passing.groupBy(F.md5(F.col(text_col)).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        passing.join(canon, "doc_id", "semi")
        .select("doc_id", "n_tokens", "quality_score")
        .orderBy("doc_id")
    )
