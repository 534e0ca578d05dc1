"""URL ops — table-driven cases ported from the reference's own test
suites (the only unit tests moogle ships):
normalize_url_test.go:9-55, strip_url_test.go:9-44,
is_valid_url_test.go:9-46."""

import pytest
from pyspark.sql import functions as F

from moogle_spark.urlops import (
    backlinks,
    frontier_pop,
    frontier_push,
    is_valid_url,
    normalize_url,
    strip_url,
)

NORMALIZE_CASES = [
    # (input, expected) — normalize_url_test.go table
    ("https://blog.boot.dev/path/", "blog.boot.dev/path"),
    ("https://blog.boot.dev/path", "blog.boot.dev/path"),
    ("http://blog.boot.dev/path/", "blog.boot.dev/path"),
    ("http://blog.boot.dev/path", "blog.boot.dev/path"),
    ("https://www.example.com/a/", "example.com/a"),
    ("https://example.com/a?q=1#frag", "example.com/a"),
    ("https://example.com/", "example.com"),
]

STRIP_CASES = [
    ("https://example.com/a?q=1", "https://example.com/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/a", "https://example.com/a"),
]

VALID_CASES = [
    ("https://example.com/a", True),
    ("https://example.com/%20space", False),
    ("https://example.com/café", False),
    ("https://en.wikipedia.org/w/index.php?title=X", False),
]


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "url string")
    return [r["out"] for r in df.select(fn(F.col("url")).alias("out")).collect()]


def test_normalize_url(spark):
    got = _apply(spark, normalize_url, [c[0] for c in NORMALIZE_CASES])
    assert got == [c[1] for c in NORMALIZE_CASES]


def test_strip_url(spark):
    got = _apply(spark, strip_url, [c[0] for c in STRIP_CASES])
    assert got == [c[1] for c in STRIP_CASES]


def test_is_valid_url(spark):
    got = _apply(spark, is_valid_url, [c[0] for c in VALID_CASES])
    assert got == [c[1] for c in VALID_CASES]


def test_frontier_push_pop(spark):
    frontier = spark.createDataFrame(
        [("https://a.com/x", 1), ("https://b.com/y", 0)], "url string, depth int"
    )
    found = spark.createDataFrame(
        [
            ("https://www.a.com/x/", 5),      # dup of a.com/x after normalize
            ("https://c.com/z", 20000),       # clamps to 10000
            ("https://d.com/w", -99999),      # clamps to -1000
        ],
        "url string, depth int",
    )
    merged = frontier_push(frontier, found).toPandas().set_index("normalized_url")
    assert merged.loc["a.com/x", "depth"] == 1        # min depth wins
    assert merged.loc["c.com/z", "depth"] == 10000
    assert merged.loc["d.com/w", "depth"] == -1000
    popped = frontier_pop(frontier_push(frontier, found), batch=2).toPandas()
    assert list(popped["normalized_url"]) == ["d.com/w", "b.com/y"]


def test_backlinks(spark):
    e = spark.createDataFrame(
        [(1, 9), (2, 9), (1, 9), (3, 7)], "src long, dst long"
    )
    got = backlinks(e).toPandas().set_index("doc_id")
    assert list(got.loc[9, "backlinks"]) == [1, 2]
    assert got.loc[9, "n_backlinks"] == 2
    assert list(got.loc[7, "backlinks"]) == [3]


def test_rfc1123_roundtrip(spark):
    """X7: format -> parse is the identity on whole-second timestamps
    (reference wire format, spider page.go:56 / indexer metadata.py:29-33)."""
    from pyspark.sql import functions as F

    from moogle_spark.urlops import format_rfc1123, parse_rfc1123

    d = spark.createDataFrame(
        [("2024-02-29 23:59:59",), ("1994-11-06 08:49:37",)], "s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    got = d.select(
        "ts",
        format_rfc1123(F.col("ts")).alias("wire"),
        parse_rfc1123(format_rfc1123(F.col("ts"))).alias("back"),
    ).toPandas()
    assert (got["ts"] == got["back"]).all()
    assert got["wire"].str.match(r"^[A-Z][a-z]{2}, \d{2} [A-Z][a-z]{2} \d{4} \d{2}:\d{2}:\d{2} GMT$").all()


def test_parse_rfc1123_reference_example(spark):
    from pyspark.sql import functions as F

    from moogle_spark.urlops import parse_rfc1123

    d = spark.createDataFrame([("Sun, 06 Nov 1994 08:49:37 GMT",)], "s string")
    got = d.select(parse_rfc1123(F.col("s")).alias("ts")).collect()[0]["ts"]
    assert str(got) == "1994-11-06 08:49:37"
