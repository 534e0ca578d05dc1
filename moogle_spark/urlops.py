"""URL operators + crawl-frontier semantics — the spider's most-tested
logic (the reference's ONLY unit-tested code) re-expressed as column
expressions, plus the frontier queue and backlink aggregation.

Reference semantics, mirrored exactly:
  * normalize_url (spider/internal/utils/normalize_url.go:9-37; tests
    normalize_url_test.go:9-55): drop the scheme, strip a leading 'www.',
    drop query string and fragment, trim the trailing '/'.
  * strip_url (strip_url.go:10-33): keep scheme://host/path only (drop
    query + fragment), preserving the scheme.
  * is_valid_url (is_valid_url.go:8-24): reject URLs containing
    non-ASCII characters, percent-escapes, or 'w/index.php'.
  * frontier push (crawl.go:91-112 + redis_client.go:77-110, S3):
    dedupe by normalized url, score = BFS depth clamped to
    [-1000, 10000] (spider/internal/utils/constants.go:11-12).
  * frontier pop (redis_client.go:169-193, S2/T9): min-score first.
  * backlinks (backlinks-processor/data/mongo_client.py:44-69, A13):
    per-target set of distinct sources.

Everything is built-in regexp/column functions — Catalyst-codegen'd,
SQL-mirrorable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_SCORE = -1000  # spider/internal/utils/constants.go:11
MAX_SCORE = 10000  # spider/internal/utils/constants.go:12


def normalize_url(url: Column) -> Column:
    """normalize_url.go:9-37: scheme off, 'www.' off, query/fragment off,
    trailing '/' off, lowercased host handled by lowercasing the whole
    (the reference compares case-sensitively after scheme strip; we follow
    its test cases, which only lowercase the scheme)."""
    u = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    return F.regexp_replace(u, r"/$", "")


def strip_url(url: Column) -> Column:
    """strip_url.go:10-33: drop query string and fragment, keep scheme."""
    return F.regexp_replace(url, r"[?#].*$", "")


def is_valid_url(url: Column) -> Column:
    """is_valid_url.go:8-24: ASCII-only, no %-escapes, no 'w/index.php'."""
    return (
        url.rlike("^[\\x20-\\x7e]*$")
        & ~url.contains("%")
        & ~url.contains("w/index.php")
    )


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("normalized_url", normalize_url(F.col(url_col)))


def frontier_push(
    frontier: DataFrame, discovered: DataFrame, url_col: str = "url"
) -> DataFrame:
    """S3: union new links into the frontier — dedupe on normalized url
    (min depth kept; among raw urls sharing a normalized form the
    LEXICOGRAPHIC-MIN url is retained — a deterministic stand-in for the
    reference's arbitrary first-writer-wins ZAdd), clamp depth to
    [MIN_SCORE, MAX_SCORE]."""
    both = frontier.select(url_col, "depth").union(discovered.select(url_col, "depth"))
    clamped = both.withColumn(
        "depth",
        F.least(F.greatest(F.col("depth"), F.lit(MIN_SCORE)), F.lit(MAX_SCORE)),
    )
    return (
        clamped.withColumn("normalized_url", normalize_url(F.col(url_col)))
        .groupBy("normalized_url")
        .agg(F.min("depth").alias("depth"), F.min(url_col).alias(url_col))
    )


def frontier_pop(frontier: DataFrame, batch: int = 100) -> DataFrame:
    """S2/T9: BFS order — lowest depth first (BZPopMin), deterministic
    tie-break on url; batch = the reference's -max-pages (100)."""
    return frontier.orderBy(F.asc("depth"), F.asc("normalized_url")).limit(batch)


def backlinks(edges: DataFrame) -> DataFrame:
    """A13: per-destination sorted distinct source list (the mirrored
    `backlinks` collection, materialized by aggregation instead of by a
    second mirrored table)."""
    return (
        edges.groupBy(F.col("dst").alias("doc_id"))
        .agg(F.array_sort(F.collect_set("src")).alias("backlinks"))
        .withColumn("n_backlinks", F.size("backlinks").cast("long"))
    )


# X7 — RFC1123 timestamps.  The reference serializes/parses page and
# metadata timestamps as RFC1123 strings (spider page.go:56 via
# time.RFC1123 "Mon, 02 Jan 2006 15:04:05 MST"; indexer
# models/metadata.py:29-33 and utils/parse.go:21-28 parse the same form).
# We standardize on TimestampType internally and expose the format at the
# edges, all JVM-side (to_timestamp/date_format, no Python).

RFC1123_FMT = "EEE, dd MMM yyyy HH:mm:ss 'GMT'"


def parse_rfc1123(col: Column) -> Column:
    """RFC1123 string -> timestamp (UTC), e.g.
    'Sun, 06 Nov 1994 08:49:37 GMT'.  The redundant weekday prefix is
    stripped before parsing (Spark's proleptic parser rejects 'EEE' as a
    parse pattern; the weekday carries no information)."""
    return F.to_timestamp(
        F.regexp_replace(col, "^[A-Za-z]{3}, ", ""), "dd MMM yyyy HH:mm:ss 'GMT'"
    )


def format_rfc1123(col: Column) -> Column:
    """timestamp -> RFC1123 string (GMT suffix, reference wire format)."""
    return F.date_format(col, RFC1123_FMT)
