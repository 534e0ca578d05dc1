"""Image-index variant — moogle's second inverted index, re-expressed.

The reference builds `word_images`: an inverted index over image filename
and alt-text tokens, weighted by whether the token also appears in the
host page's keywords (services/image-indexer/main.py:166-183, A4:
weight x100 if filename word ∈ page keywords else 30), materialized via a
keywords × images cross join within each page (main.py:219-237, J6), and
queried by the same $match/$group/$sort pipeline as the text index
(QuerySearchController.php:118-216) — note image search SKIPS the fuzzy
rewrite (`:366`).

Here the engine is index-generic, so the variant is: derive an "asset"
table from each doc's path-like column (filenames stand in for images),
tokenize the filename with the same frozen splitter, boost by page-term
overlap, and reuse the group-sum ranked retrieval.  Demonstrates that a
second postings table with a different analyzer/boost drops into the same
query machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import term_frequencies, tokens_col

KEYWORD_BOOST = 100  # image-indexer/main.py:176
DEFAULT_WEIGHT = 30  # image-indexer/main.py:181


def image_assets(docs: DataFrame, asset_col: str = "source") -> DataFrame:
    """One row per (doc, asset): the stand-in for moogle's per-page image
    set (image url + alt).  asset_id is deterministic."""
    return docs.select(
        "doc_id",
        F.concat(F.col(asset_col), F.lit("#"), F.col("doc_id").cast("string")).alias(
            "asset_id"
        ),
        F.col(asset_col).alias("asset_name"),
    )


def image_postings(docs: DataFrame, asset_col: str = "source") -> DataFrame:
    """The `word_images` analogue: (term, asset_id, weight) where term is
    a filename token, weight = 100 if the term is also a page keyword
    (appears in the doc body) else 30 — A4 exactly.  The body-term lookup
    is the J6 join expressed as a semi-join instead of a cross join."""
    assets = image_assets(docs, asset_col)
    name_terms = assets.select(
        "doc_id",
        "asset_id",
        F.explode(tokens_col("asset_name")).alias("term"),
    ).distinct()
    body_terms = (
        term_frequencies(docs).select("doc_id", "term").withColumn("kw", F.lit(True))
    )
    return name_terms.join(body_terms, ["doc_id", "term"], "left").select(
        "term",
        "asset_id",
        "doc_id",
        F.when(F.col("kw").isNotNull(), F.lit(KEYWORD_BOOST))
        .otherwise(F.lit(DEFAULT_WEIGHT))
        .cast("long")
        .alias("weight"),
    )


def search_images(
    docs: DataFrame, query_terms: list[str], k: int = 5, asset_col: str = "source"
) -> DataFrame:
    """getTopImages pipeline (QuerySearchController.php:118-216): $match
    terms -> $group by asset (sum weight, count matched) -> $sort
    {matchCount desc, cumWeight desc} -> $limit 5 (reference topImages=5).
    No fuzzy rewrite, matching `:366`."""
    terms = [t.lower() for t in query_terms]
    p = image_postings(docs, asset_col).filter(F.col("term").isin(terms))
    return (
        p.groupBy("asset_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("match_count"),
            F.sum("weight").cast("long").alias("cum_weight"),
        )
        .orderBy(F.desc("match_count"), F.desc("cum_weight"), F.asc("asset_id"))
        .limit(k)
    )


def search_images_enriched(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 5,
    asset_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """J5 — the reference's two-level image-result enrichment
    (QuerySearchController.php:166-213): ranked asset ids are joined back
    to the image data (page url + filename, `:180-190`) and then to the
    host page's metadata (title/summary, `:193-213`, incl. the substr
    snippet X9 at `:205-212`).  The k-row ranked side is the BUILD side
    of both hash joins (broadcast on the right of inner joins — a
    broadcast-left outer join cannot build left, Spark would silently
    fall back to corpus-sized sort-merge shuffles), so enrichment costs
    two broadcast probes regardless of corpus size.  Inner ≡ left here:
    every ranked asset_id exists in assets by construction (same docs)."""
    ranked = search_images(docs, query_terms, k, asset_col)
    assets = image_assets(docs, asset_col)
    pages = docs.select(
        "doc_id",
        F.col("lang").alias("page_lang"),
        F.col(asset_col).alias("page_url"),
        F.substring(F.col(text_col), 1, 100).alias("snippet"),
    )
    step1 = assets.join(F.broadcast(ranked), "asset_id", "inner")
    return (
        pages.join(F.broadcast(step1), "doc_id", "inner")
        .select(
            "asset_id",
            "match_count",
            "cum_weight",
            "doc_id",
            "asset_name",
            "page_lang",
            "page_url",
            "snippet",
        )
        .orderBy(F.desc("match_count"), F.desc("cum_weight"), F.asc("asset_id"))
    )
