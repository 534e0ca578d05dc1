"""Fuzzy spell rewrite — FuzzySearch.php:58-141 semantics on Spark."""

from moogle_spark.fuzzy import dictionary_from_docs, rewrite_query, suggest_terms


def _dict(spark, terms):
    return spark.createDataFrame([(t,) for t in terms], "term string")


def test_exact_hit_ranks_first(spark):
    d = _dict(spark, ["spark", "spars", "sparse"])
    got = suggest_terms(d, ["spark"]).toPandas()
    assert got.iloc[0]["suggestion"] == "spark"
    assert got.iloc[0]["distance"] == 0


def test_distance_cap_rule(spark):
    # len<=4 -> cap 1; len 5..7 -> cap 1; len 8+ -> cap 2 (FuzzySearch.php:122)
    d = _dict(spark, ["table", "tablets"])
    got = suggest_terms(d, ["tible"]).toPandas()  # len 5, cap 1
    assert list(got["suggestion"]) == ["table"]  # d=1 in; 'tablets' d=4 out
    got_far = suggest_terms(d, ["tabel"]).toPandas()  # d('tabel','table')=2 > cap 1
    assert len(got_far) == 0
    d2 = _dict(spark, ["absolute"])
    got2 = suggest_terms(d2, ["absolutly"]).toPandas()  # len 9 -> cap 2
    assert list(got2["suggestion"]) == ["absolute"]


def test_candidates_need_shared_first_letter_and_length_window(spark):
    d = _dict(spark, ["spark", "hark"])
    got = suggest_terms(d, ["sark"]).toPandas()
    # 'hark' shares no first letter; 'spark' within len ±1 and d=1
    assert list(got["suggestion"]) == ["spark"]


def test_rewrite_query_keeps_unfixable_words(spark):
    d = _dict(spark, ["spark", "query"])
    out = rewrite_query(d, ["sparc", "zzzzzz", "QUERY"])
    assert out == ["spark", "zzzzzz", "query"]


def test_dictionary_from_docs(spark):
    import pyspark.sql.functions as F

    from moogle_spark.textops import doc_terms

    docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    d = dictionary_from_docs(doc_terms(docs))
    assert set(r["term"] for r in d.collect()) == {"alpha", "beta", "gamma"}


def test_engine_fuzzy_search_rewrites(spark, built_warehouse):
    """routes/api.php:12 — FuzzySearch runs on every /api/search: a
    misspelled query must return the corrected query's results."""
    from moogle_spark.query import SearchEngine

    eng = SearchEngine(spark, built_warehouse, cache=False)
    good = eng.search("hotterm0", k=10).toPandas()
    fixed = eng.search("hotterm0x", k=10, fuzzy=True).toPandas()  # edit dist 1
    assert list(fixed["doc_id"]) == list(good["doc_id"])
    assert list(fixed["score"]) == list(good["score"])
    # without fuzzy the misspelling matches nothing
    assert eng.search("hotterm0x", k=10).count() == 0
    # correctly-spelled words pass through the rewrite untouched
    same = eng.search("hotterm0", k=10, fuzzy=True).toPandas()
    assert list(same["doc_id"]) == list(good["doc_id"])
