"""Analyzer goldens — table-driven, mirroring the reference's test style
(services/spider/internal/utils/normalize_url_test.go:9-55)."""

import pytest

from moogle_spark.analyzer import term_freqs_positions, tokenize_doc, tokenize_query

DOC_CASES = [
    # camelCase / snake_case / dotted-path splitting (SURVEY.md §7.3)
    ("parseHttpResponse", ["parse", "http", "response"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("pkg.module.Thing", ["pkg", "module", "thing"]),
    ("HTTPServer2 rocks", ["http", "server2", "rocks"]),
    # stopword removal with the vendored list (utils.py:131 semantics)
    ("the quick brown fox is here", ["quick", "brown", "fox"]),
    # isalnum filtering of operators/punctuation (utils.py:132)
    ("x += z; // !!", ["x", "z"]),  # note: 'y' alone would be a stopword
    ("func(a, b) -> *ptr", ["func", "b", "ptr"]),  # 'a' is a stopword
    # lowercase folding
    ("FOO Bar BAZ", ["foo", "bar", "baz"]),
    # numerals kept
    ("v2 utf8 3000", ["v2", "utf8", "3000"]),
    # empty / whitespace
    ("", []),
    ("   \n\t ", []),
    # underscores alone vanish
    ("___", []),
    # mixed identifier with digits at camel boundary
    ("getHTTP2Frame", ["get", "http2", "frame"]),
]


@pytest.mark.parametrize("content,expected", DOC_CASES)
def test_tokenize_doc(content, expected):
    assert tokenize_doc(content) == expected


QUERY_CASES = [
    # '+' treated as space, lowercase, NO stopword/alnum filtering
    # (QuerySearchController.php:248-249)
    ("foo+bar", ["foo", "bar"]),
    ("The AND of", ["the", "and", "of"]),
    ("Hello   World", ["hello", "world"]),
    ("a+b+c", ["a", "b", "c"]),
    ("don't", ["don't"]),  # query analyzer does not strip punctuation
    ("", []),
]


@pytest.mark.parametrize("q,expected", QUERY_CASES)
def test_tokenize_query(q, expected):
    assert tokenize_query(q) == expected


def test_positions_are_postfilter_indices():
    tfp = term_freqs_positions("alpha the alpha beta alpha")
    # post-filter stream: [alpha, alpha, beta, alpha]
    assert tfp["alpha"] == (3, [0, 1, 3])
    assert tfp["beta"] == (1, [2])


def test_doc_len_is_postfilter_count():
    tfp = term_freqs_positions("the a an alpha beta")
    assert sum(v[0] for v in tfp.values()) == 2
