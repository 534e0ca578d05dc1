"""Text analysis + search analytics operators."""

import datetime as dt

import pytest

from moogle_spark.analytics import (
    daily_search_counts,
    search_suggestions,
    top_searches,
    windowed_counts,
)
from moogle_spark.textstats import fingerprints, language_id, quality_scores, token_counts


@pytest.fixture(scope="module")
def log(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(100):
        q = ["spark", "spark", "search", "shuffle", "other"][i % 5]
        rows.append((base + dt.timedelta(minutes=37 * i), q))
    return spark.createDataFrame(rows, "ts timestamp, query string")


def test_top_searches(spark, log):
    got = top_searches(log, k=3).toPandas()
    assert list(got["query"]) == ["spark", "other", "search"]
    assert got.iloc[0]["searches"] == 40


def test_search_suggestions_prefix(spark, log):
    got = search_suggestions(log, "s").toPandas()
    assert list(got["query"]) == ["spark", "search", "shuffle"]
    got_up = search_suggestions(log, "SPA").toPandas()
    assert list(got_up["query"]) == ["spark"]


def test_daily_counts_total(spark, log):
    got = daily_search_counts(log).toPandas()
    assert got["searches"].sum() == 100
    assert got["day"].is_monotonic_increasing


def test_windowed_counts_sum(spark, log):
    got = windowed_counts(log, window="1 hour").toPandas()
    assert got["searches"].sum() == 100
    by_q = got.groupby("query")["searches"].sum()
    assert by_q["spark"] == 40


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog went to the store in the rain", "en"),
        (2, "der hund und die katze ist nicht mit der maus", "de"),
        (3, "xqz blorp 123 %%% !!!", "xx"),
        (4, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_language_id(spark, docs):
    got = language_id(docs).toPandas().set_index("doc_id")
    assert got.loc[1, "predicted_lang"] == "en"
    assert got.loc[2, "predicted_lang"] == "de"
    assert got.loc[3, "predicted_lang"] == "und"
    assert got.loc[1, "en_marker_ratio"] > 0.3


def test_quality_scores(spark, docs):
    got = quality_scores(docs).toPandas().set_index("doc_id")
    assert got.loc[1, "stopword_ratio"] > got.loc[3, "stopword_ratio"]
    assert got.loc[3, "symbol_ratio"] > got.loc[1, "symbol_ratio"]
    assert got.loc[1, "quality_score"] > got.loc[3, "quality_score"]
    assert got.loc[4, "quality_score"] == pytest.approx(0.3)  # empty doc floor


def test_token_counts(spark, docs):
    got = token_counts(docs).toPandas().set_index("doc_id")
    assert got.loc[1, "ws_tokens"] == 12
    assert got.loc[1, "alnum_tokens"] == 12
    assert got.loc[3, "alnum_tokens"] == 3
    assert got.loc[3, "bpe_pieces"] == 9  # xqz|blorp|123|%%%!!! -> 3 words + 6 symbols
    assert got.loc[4, "ws_tokens"] == 0


def test_fingerprints(spark, docs):
    got = fingerprints(docs, n=3).toPandas().set_index("doc_id")
    assert 4 not in got.index  # empty doc has no shingles
    assert got.loc[1, "n_shingles"] == 10  # 12 tokens -> 10 distinct 3-grams
    assert len(got.loc[1, "fingerprint"]) == 32


def test_curate_corpus_pipeline(spark):
    """Composed curation: junk (low-quality / too-short) docs are gated
    out, exact duplicates collapse to the lowest doc_id."""
    from moogle_spark.textstats import curate_corpus

    good = "the code and the data are in the repository with all of the tests " * 3
    rows = [
        (1, good),
        (2, good),                      # exact dup of 1 -> dropped
        (3, "x"),                       # too short -> dropped
        (4, ";;;; ???? !!!! &&&&"),     # symbols only -> dropped
        (5, good + " extra words here to differ and this is still quite good"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = curate_corpus(d, min_quality=0.4, min_tokens=5).toPandas()
    assert list(got["doc_id"]) == [1, 5]
    assert (got["quality_score"] >= 0.4).all()


def test_curation_then_near_dup(spark):
    """The full LLM-pipeline order: quality gate + exact dedup
    (curate_corpus) -> near-dup cluster keep-one (dedup_keep_one) over
    the survivors, reusing the curation pass's quality scores.  The
    planted near-dup pair collapses to its higher-quality member; the
    exact duplicate never reaches the near-dup stage."""
    from moogle_spark.dedup import dedup_keep_one
    from moogle_spark.textstats import curate_corpus

    base = (
        "the quick brown fox jumps over the lazy dog near the old river "
        "bank today with many more words to pass the minimum token gate"
    )
    near = base + " the and of to in is for with that this"  # higher quality
    rows = [
        (1, base),
        (2, base),          # exact dup of 1 -> dropped by curate_corpus
        (3, near),          # near-dup of 1 -> clustered, wins on quality
        (4, "short"),       # fails the token gate
        (5, "completely different content about spark shuffle partitions "
            "and parquet row groups repeated enough times to pass the gate "
            "for this unrelated singleton document in the corpus today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated = curate_corpus(docs, min_quality=0.0, min_tokens=10)
    assert set(r["doc_id"] for r in curated.collect()) == {1, 3, 5}

    survivors_in = docs.join(curated.select("doc_id"), "doc_id", "semi")
    pairs = spark.createDataFrame([(1, 3)], "doc_a long, doc_b long")
    surv = dedup_keep_one(
        survivors_in,
        pairs=pairs,
        quality=curated.select("doc_id", "quality_score"),
    ).toPandas()
    assert set(surv["doc_id"]) == {3, 5}
    assert int(surv.set_index("doc_id").loc[3, "cluster_size"]) == 2
