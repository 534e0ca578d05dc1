"""Spark iterative PageRank vs the single-node oracle port of the
reference loop (services/page-rank/cmd/page-rank/main.go:96-128)."""

import numpy as np
import pandas as pd
import pytest

from moogle_spark.oracle import oracle_pagerank
from moogle_spark.pagerank import blend_scores, pagerank, top_ranked


def _random_edges(n_nodes=60, n_edges=400, seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(1, n_nodes + 1, n_edges)
    dst = rng.integers(1, n_nodes + 1, n_edges)
    keep = src != dst
    return pd.DataFrame({"src": src[keep], "dst": dst[keep]}).drop_duplicates()


def test_pagerank_matches_reference_semantics(spark):
    epd = _random_edges()
    want = oracle_pagerank(epd, iterations=10, damping=0.85)
    got = (
        pagerank(spark.createDataFrame(epd), iterations=10, damping=0.85)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(got["rank"], want["rank"], rtol=0, atol=1e-12)


def test_pagerank_dedupes_and_drops_self_loops(spark):
    # duplicates and self loops must not change the result (U1/U2)
    base = pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 3, 1]})
    noisy = pd.concat([base, base, pd.DataFrame({"src": [2], "dst": [2]})])
    a = pagerank(spark.createDataFrame(base)).toPandas().sort_values("doc_id")
    b = pagerank(spark.createDataFrame(noisy)).toPandas().sort_values("doc_id")
    np.testing.assert_array_equal(a["doc_id"].values, b["doc_id"].values)
    np.testing.assert_allclose(a["rank"], b["rank"], atol=0)


def test_sink_only_nodes_hold_no_rank(spark):
    # node 9 has only inbound edges -> absent, per main.go:110 semantics
    e = spark.createDataFrame(pd.DataFrame({"src": [1, 2], "dst": [9, 9]}))
    got = pagerank(e).toPandas()
    assert set(got["doc_id"]) == {1, 2}


def test_rank_sums_bounded(spark):
    e = spark.createDataFrame(_random_edges(seed=13))
    got = pagerank(e).toPandas()
    assert 0 < got["rank"].sum() <= 1.0 + 1e-9
    assert (got["rank"] > 0).all()


def test_top_ranked_and_blend(spark):
    e = spark.createDataFrame(_random_edges(seed=3))
    pr = pagerank(e)
    top = top_ranked(pr, k=3).toPandas()
    assert len(top) == 3
    assert top["rank"].is_monotonic_decreasing
    scores = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 999], "score": [1.0, 0.5, 2.0]})
    )
    blended = blend_scores(scores, pr).toPandas()
    unranked = blended[blended["doc_id"] == 999].iloc[0]
    assert unranked["rank"] == 0.0
    assert unranked["combined"] == pytest.approx(0.6 * 2.0)
