"""Image-index variant: A4 keyword boost + getTopImages pipeline."""

import pytest

from moogle_spark.imageindex import image_postings, search_images


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark shuffle merge join", "spark-logo"),
        (2, "completely unrelated words here", "spark-banner"),
        (3, "spark spark spark", "other-image"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_keyword_boost(spark, docs):
    p = image_postings(docs).toPandas()
    w = {(r["doc_id"], r["term"]): r["weight"] for _, r in p.iterrows()}
    assert w[(1, "spark")] == 100  # filename token present in body
    assert w[(2, "spark")] == 30   # filename token absent from body
    assert w[(1, "logo")] == 30
    assert (3, "spark") not in w   # doc3's filename has no 'spark'


def test_search_images_pipeline(spark, docs):
    got = search_images(docs, ["spark", "logo"], k=5).toPandas()
    # doc1's asset matches both terms (100+30); doc2's matches one (30)
    assert got.iloc[0]["asset_id"].startswith("spark-logo")
    assert got.iloc[0]["match_count"] == 2
    assert got.iloc[0]["cum_weight"] == 130
    assert got.iloc[1]["asset_id"].startswith("spark-banner")
    assert got.iloc[1]["cum_weight"] == 30
    assert len(got) == 2


def test_search_images_case_and_no_fuzzy(spark, docs):
    got = search_images(docs, ["SPARK"], k=5).toPandas()
    assert len(got) == 2  # lowercased match, but no fuzzy rewrite
    assert search_images(docs, ["sprk"], k=5).count() == 0


def test_search_images_enriched(spark):
    """J5: every ranked asset comes back with its page metadata and a
    <=100-char snippet (QuerySearchController.php:166-213 enrichment)."""
    from moogle_spark.imageindex import search_images_enriched

    rows = [
        (1, "spark shuffle notes about joins", "en", "img/spark_logo.png"),
        (2, "unrelated text body", "en", "img/cat_photo.jpg"),
        (3, "spark tuning guide content", "de", "docs/spark_guide.txt"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = search_images_enriched(d, ["spark"], k=5).toPandas()
    assert len(got) == 2  # docs 1 and 3 have 'spark' in the asset name
    assert set(got["doc_id"]) == {1, 3}
    # keyword boost: 'spark' is in both docs' bodies -> weight 100 each
    assert (got["cum_weight"] == 100).all()
    assert (got["page_url"] == got["asset_name"]).all()
    assert got["snippet"].str.len().max() <= 100
    assert set(got.columns) == {
        "asset_id", "match_count", "cum_weight", "doc_id",
        "asset_name", "page_lang", "page_url", "snippet",
    }


def test_search_with_images_composed(spark, built_warehouse):
    """QuerySearchController.php:344-347 — page 1 carries web top-k AND
    top-5 images; page > 1 carries no images; each half equals the
    standalone call (images side unfuzzied, :366)."""
    from moogle_spark.imageindex import search_images_enriched
    from moogle_spark.query import SearchEngine

    eng = SearchEngine(spark, built_warehouse, cache=False)
    rows = [
        (1, "hotterm0 spark shuffle", "hotterm0-alpha.png", "en"),
        (2, "hotterm0 hotterm0 merge", "hotterm0-beta.png", "en"),
        (3, "completely unrelated words", "img-gamma.png", "de"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )

    out = eng.search_with_images("hotterm0", docs, k=5, image_k=2)
    web = out["web"].toPandas()
    img = out["images"].toPandas()
    sep_web = eng.search("hotterm0", k=5, enrich=True).toPandas()
    sep_img = search_images_enriched(docs, ["hotterm0"], k=2).toPandas()
    assert list(web["doc_id"]) == list(sep_web["doc_id"])
    assert [repr(s) for s in web["score"]] == [repr(s) for s in sep_web["score"]]
    assert list(img["asset_id"]) == list(sep_img["asset_id"])
    assert len(img) == 2

    out2 = eng.search_with_images("hotterm0", docs, k=5, page=2)
    assert out2["images"] is None
    page2 = eng.search("hotterm0", k=5, page=2, enrich=True).toPandas()
    assert list(out2["web"].toPandas()["doc_id"]) == list(page2["doc_id"])
