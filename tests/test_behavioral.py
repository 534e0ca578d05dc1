"""Behavioral ranking mode (SURVEY T2/T3 + the J3 dead-pagerank bug):
global (matchCount, cumWeight) ordering decides page membership; the
0.6-blend re-sorts only WITHIN the fetched page
(QuerySearchController.php:279-341)."""

import pytest

from moogle_spark.textops import search_behavioral


@pytest.fixture(scope="module")
def docs(spark):
    # df(aa)=6, df(bb)=4 over N=10 docs; weights = tf * log10(N/(1+df)).
    # Global order: m2 docs d1(4.56) d2(3.65) d3(0.91) d4(0.46) then
    # m1 docs d5(4.65) d6(3.10).  Page 2 (per_page=3) = ranks 4-6 =
    # [d4, d5, d6]; page-local 0.6*weight re-sort -> [d5, d6, d4].
    rows = [
        (1, ("aa " * 10 + "bb " * 10).strip()),
        (2, ("aa " * 8 + "bb " * 8).strip()),
        (3, ("aa " * 2 + "bb " * 2).strip()),
        (4, "aa bb"),
        (5, ("aa " * 30).strip()),
        (6, ("aa " * 20).strip()),
        (7, "zz yy xx"),
        (8, "zz yy xx"),
        (9, "zz yy xx"),
        (10, "zz yy xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_page_membership_is_global_order(spark, docs):
    got = search_behavioral(docs, ["aa", "bb"], page=2, per_page=3).toPandas()
    assert set(got["doc_id"]) == {4, 5, 6}
    assert sorted(got["rank_global"]) == [4, 5, 6]


def test_page_local_blend_resort_quirk(spark, docs):
    """Within the page the 0.6*cumWeight blend reorders: the match-2 doc
    that earned page membership by match count sinks below the match-1
    heavyweights — exactly the reference's usort-within-page quirk."""
    got = search_behavioral(docs, ["aa", "bb"], page=2, per_page=3).toPandas()
    assert list(got["doc_id"]) == [5, 6, 4]
    assert list(got["rank_global"]) == [5, 6, 4]
    assert got.iloc[2]["match_count"] == 2  # the sunk doc matched MORE terms


def test_page_one_unaffected_by_later_pages(spark, docs):
    got = search_behavioral(docs, ["aa", "bb"], page=1, per_page=3).toPandas()
    assert set(got["doc_id"]) == {1, 2, 3}  # top-3 by global order
    assert list(got["doc_id"]) == [1, 2, 3]  # blend keeps weight order here


def test_fixed_rank_blend(spark, docs):
    """With a real ranks table the blend uses it (the fixed behavior the
    reference intended before the :325 bug)."""
    ranks = spark.createDataFrame([(4, 10.0)], "doc_id long, rank double")
    got = search_behavioral(
        docs, ["aa", "bb"], page=2, per_page=3, ranks=ranks
    ).toPandas()
    # d4: 0.6*0.456 + 0.4*10 = 4.27 beats d5 (2.79) and d6 (1.86)
    assert list(got["doc_id"]) == [4, 5, 6]
