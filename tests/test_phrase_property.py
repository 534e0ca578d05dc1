"""Property-style phrase parity: random token windows sampled from real
documents must return rank-, score- (repr-exact), and count-identical
results between the vectorized engine scorer and the single-node oracle.
This is the regression net for the composite-key phrase walk."""

import numpy as np
import pytest

from moogle_spark.analyzer import tokenize_doc
from moogle_spark.corpus import generate_docs_local
from moogle_spark.oracle import oracle_phrase_search
from moogle_spark.query import SearchEngine


@pytest.fixture(scope="module")
def engine(spark, built_warehouse):
    return SearchEngine(spark, built_warehouse)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_windows_match_oracle(engine, oracle_index, seed):
    rng = np.random.default_rng(seed)
    docs = generate_docs_local(200)
    phrases = []
    while len(phrases) < 6:
        di = int(rng.integers(0, len(docs)))
        toks = tokenize_doc(docs["content"].iloc[di])
        if len(toks) < 5:
            continue
        start = int(rng.integers(0, len(toks) - 3))
        ln = int(rng.integers(2, 4))
        phrases.append(" ".join(toks[start : start + ln]))
    for ph in phrases:
        got = engine.search_phrase(ph, k=20).toPandas()
        exp = oracle_phrase_search(oracle_index, ph, k=20)
        assert list(got["doc_id"]) == list(exp["doc_id"]), ph
        assert [repr(s) for s in got["score"]] == [repr(s) for s in exp["score"]], ph
        assert list(got["match_count"]) == list(exp["match_count"]), ph
        # the sampled window genuinely occurs in its source doc
        assert len(exp) >= 1, ph


def test_phrase_k_larger_than_hits(engine, oracle_index):
    ph = "hotterm0 hotterm0"
    got = engine.search_phrase(ph, k=10_000).toPandas()
    exp = oracle_phrase_search(oracle_index, ph, k=10_000)
    assert list(got["doc_id"]) == list(exp["doc_id"])


def test_page_beyond_results_is_empty(engine):
    # a query with few hits: page far past the end returns zero rows
    assert engine.search("hotterm0", k=1000, page=5).count() == 0
