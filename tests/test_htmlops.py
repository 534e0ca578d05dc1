"""HTML chain F4-F7 + X11 display formatting + S8 staging expiry."""

import os
import time

import pytest


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (
            "https://h.example/dir/a.html",
            '<html><head><title>plain One</title>'
            '<meta property="og:title" content="OG One"/>'
            '<meta name="description" content="plain desc"/></head>'
            '<body><a href="/rooted/x">r</a><a href="rel.html">l</a>'
            '<a href="https://ext.example/abs">e</a><a href="bäd">n</a>'
            '<a href="../parent.html">p</a><a href="./same.html">s</a>'
            '<a href="deep/x/../y.html">d</a>'
            '<img src="i.png" alt="an image"/>'
            "<p>first para</p><p>second [strip me] para</p></body></html>",
        ),
        (
            "https://h.example/b.html",
            "<html><head><title>only Title</title></head>"
            "<body><p>lone</p></body></html>",
        ),
        (
            # PATH-LESS base: relatives must resolve against host + '/'
            "https://root.example",
            '<html><body><a href="style.css">c</a>'
            '<a href="/abs.html">a</a><p>r</p></body></html>',
        ),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_links_resolves_and_skips_nonascii(spark, pages):
    from moogle_spark.htmlops import extract_links

    got = extract_links(pages).toPandas()
    links = set(got[got["url"] == "https://h.example/dir/a.html"]["link"])
    assert links == {
        "https://h.example/rooted/x",          # rooted
        "https://h.example/dir/rel.html",      # relative -> base dir
        "https://ext.example/abs",             # absolute passes through
        "https://h.example/parent.html",       # ../ collapses out of dir
        "https://h.example/dir/same.html",     # ./ stripped
        "https://h.example/dir/deep/y.html",   # interior seg/../ collapse
    }  # "bäd" (non-ASCII) skipped — reference drops it
    rootless = set(got[got["url"] == "https://root.example"]["link"])
    assert rootless == {
        "https://root.example/style.css",  # NOT https://style.css
        "https://root.example/abs.html",
    }


def test_extract_images(spark, pages):
    from moogle_spark.htmlops import extract_images

    got = extract_images(pages).toPandas()
    assert len(got) == 1
    assert got.iloc[0]["img_src"] == "https://h.example/dir/i.png"
    assert got.iloc[0]["img_alt"] == "an image"


def test_meta_projection_coalesce(spark, pages):
    from moogle_spark.htmlops import meta_projection

    got = meta_projection(pages).toPandas().set_index("url")
    a = got.loc["https://h.example/dir/a.html"]
    assert a["title"] == "OG One"          # og wins over <title>
    assert a["description"] == "plain desc"
    assert a["canonical_url"] == "https://h.example/dir/a.html"
    b = got.loc["https://h.example/b.html"]
    assert b["title"] == "only Title"      # fallback to <title>
    assert b["description"] is None        # neither form present


def test_paragraph_text_bracket_strip(spark, pages):
    from moogle_spark.htmlops import paragraph_text

    got = paragraph_text(pages).toPandas().set_index("url")
    assert (
        got.loc["https://h.example/dir/a.html", "paragraphs"]
        == "first para second  para"
    )
    assert got.loc["https://h.example/b.html", "paragraphs"] == "lone"


def test_display_format_ucwords_not_initcap(spark):
    from moogle_spark.htmlops import display_format

    df = spark.createDataFrame(
        [("osCar wILde page", 1234567)], "title string, total_hits long"
    )
    got = display_format(df).collect()[0]
    # PHP ucwords: first letter up, REST UNTOUCHED (initcap would give
    # 'Oscar Wilde Page')
    assert got["display_title"] == "OsCar WILde Page"
    assert got["display_hits"] == "1,234,567"


def test_expire_stale_staging(tmp_path):
    from moogle_spark.tables import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    # committed table: manifest present -> never swept
    os.makedirs(wh.path("committed_t"))
    open(os.path.join(wh.path("committed_t"), "_MANIFEST.json"), "w").write("{}")
    old_file = os.path.join(wh.path("committed_t"), "part-0.parquet")
    open(old_file, "w").write("x")
    os.utime(old_file, (time.time() - 7200, time.time() - 7200))
    # abandoned staging, 2h old -> swept
    os.makedirs(wh.path("stale_stage"))
    f = os.path.join(wh.path("stale_stage"), "part-0.parquet")
    open(f, "w").write("x")
    os.utime(f, (time.time() - 7200, time.time() - 7200))
    # live (fresh) staging -> kept
    os.makedirs(wh.path("live_stage"))
    open(os.path.join(wh.path("live_stage"), "part-0.parquet"), "w").write("x")
    # lineage dir -> never swept even when old
    os.makedirs(wh.path("lineage"))
    lf = os.path.join(wh.path("lineage"), "old.parquet")
    open(lf, "w").write("x")
    os.utime(lf, (time.time() - 7200, time.time() - 7200))

    removed = wh.expire_stale_staging(ttl_seconds=3600)
    assert removed == ["stale_stage"]
    assert os.path.exists(wh.path("committed_t"))
    assert os.path.exists(wh.path("live_stage"))
    assert os.path.exists(wh.path("lineage"))
    assert not os.path.exists(wh.path("stale_stage"))


def test_resolve_url_adjacent_dot_segments(spark):
    """'(?:/\\.)+/' collapses ADJACENT './' runs in one pass — the old
    single '/\\./' global replace left 'a/././b' half-collapsed because
    the regex engine resumes scanning after each replacement."""
    from pyspark.sql import functions as F

    from moogle_spark.htmlops import resolve_url

    df = spark.createDataFrame(
        [
            ("https://h.example/dir/page.html", "./././x.html"),
            ("https://h.example/dir/page.html", "a/././b.html"),
            ("https://h.example/dir/page.html", "./x/./y.html"),
        ],
        "url string, href string",
    )
    got = [
        r["out"]
        for r in df.select(
            resolve_url(F.col("url"), F.col("href")).alias("out")
        ).collect()
    ]
    assert got == [
        "https://h.example/dir/x.html",
        "https://h.example/dir/a/b.html",
        "https://h.example/dir/x/y.html",
    ]
