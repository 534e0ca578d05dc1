"""Degenerate-input hardening: empty corpus, unicode/null content."""

from pyspark.sql import functions as F


def test_empty_corpus_build_and_search(spark, tmp_path):
    """A zero-doc build must commit every stage (schema recorded in the
    manifests) and serve empty results — not crash on schema inference
    over file-less tables."""
    from moogle_spark.build import build_index
    from moogle_spark.query import SearchEngine

    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, content string"
    )
    wh = str(tmp_path / "wh0")
    info = build_index(spark, empty, wh)
    assert info.n_docs == 0
    eng = SearchEngine(spark, wh, cache=False)
    assert eng.n_docs == 0
    assert eng.search("anything at all", k=5).count() == 0
    assert eng.search_phrase("any thing", k=5).count() == 0


def test_unicode_and_null_content(spark, tmp_path):
    """Unicode content indexes via the frozen sub-split analyzer, and a
    unicode QUERY word now reaches the same split form (doc-analyzer
    fallback), so 'héllo' finds the doc containing 'héllo'.  Null and
    control-character content must not break the build."""
    from moogle_spark.build import build_index
    from moogle_spark.query import SearchEngine

    rows = [
        ("r", "a", "c1", "py", "héllo wörld naïve café 日本語 😀 flumetoken"),
        ("r", "b", "c1", "py", None),
        ("r", "c", "c1", "py", "tabs\tand\nnewlines\x00null ok flumetoken"),
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    wh = str(tmp_path / "wh1")
    info = build_index(spark, docs, wh)
    assert info.n_docs == 3
    eng = SearchEngine(spark, wh, cache=False)
    # ASCII query path untouched
    assert eng.search("flumetoken", k=5).count() == 2
    # unicode query word matches its own indexed (sub-split) form
    got = eng.search("héllo", k=5, enrich=True).toPandas()
    assert len(got) >= 1 and "a" in set(got["path"])
    # null-content doc exists with doc_len 0 and is unsearchable but safe
    ds = eng.doc_stats.filter(F.col("path") == "b").collect()
    assert len(ds) == 1 and ds[0]["doc_len"] == 0


def test_page_zero_raises(spark, tmp_path):
    from moogle_spark.build import build_index
    from moogle_spark.corpus import generate_docs
    from moogle_spark.query import SearchEngine

    import pytest

    wh = str(tmp_path / "whp")
    build_index(spark, generate_docs(spark, 30), wh)
    eng = SearchEngine(spark, wh, cache=False)
    with pytest.raises(ValueError, match="1-based"):
        eng.search("hotterm0", k=5, page=0)
    with pytest.raises(ValueError, match="1-based"):
        eng.search("hotterm0", k=5, page=-1)
