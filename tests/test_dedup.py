"""Dedup operators: exact hash groups, n-gram Jaccard, MinHash-LSH,
SimHash — crafted corpora with planted duplicates."""

import pandas as pd
import pytest

from moogle_spark.dedup import (
    doc_shingles,
    exact_duplicate_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = BASE.replace("today", "tonight")  # one token differs
OTHER = "completely different words about spark shuffle partitions and codecs"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicate_groups(spark, docs):
    got = exact_duplicate_groups(docs).toPandas()
    dup = got[got["dup_count"] > 1]
    assert len(dup) == 1
    assert dup.iloc[0]["canonical_doc_id"] == 1
    assert dup.iloc[0]["dup_count"] == 2
    assert len(got) == 3  # three distinct contents


def test_shingles_short_doc_empty(spark):
    d = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    assert doc_shingles(d, n=3).count() == 0


def test_jaccard_pairs_find_planted_near_dup(spark, docs):
    got = ngram_jaccard_pairs(docs, n=3, threshold=0.5).toPandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (1, 2) in pairs  # identical
    assert (1, 3) in pairs and (2, 3) in pairs  # near-dup
    assert not any(4 in p for p in pairs)
    exact = got[(got["doc_a"] == 1) & (got["doc_b"] == 2)].iloc[0]
    assert exact["jaccard"] == 1.0


def test_minhash_identical_signatures(spark, docs):
    sig = minhash_signatures(docs, n=3, num_hashes=8).toPandas().set_index("doc_id")
    assert list(sig.loc[1, "sig"]) == list(sig.loc[2, "sig"])
    # near-dup shares most minhashes, disjoint doc shares none
    s1, s3, s4 = (list(sig.loc[i, "sig"]) for i in (1, 3, 4))
    agree_13 = sum(a == b for a, b in zip(s1, s3))
    agree_14 = sum(a == b for a, b in zip(s1, s4))
    assert agree_13 >= 4
    assert agree_14 == 0


def test_lsh_pairs_candidates(spark, docs):
    got = minhash_lsh_pairs(docs, n=3, num_hashes=8, bands=4).toPandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (1, 2) in pairs
    assert (1, 3) in pairs  # high-overlap near-dup shares >=1 band w.h.p.
    assert not any(4 in p for p in pairs)


def test_simhash_and_near_pairs(spark, docs):
    s = simhash(docs).toPandas().set_index("doc_id")["simhash"]
    assert s.loc[1] == s.loc[2]
    assert 0 <= s.loc[1] < 2**16
    got = simhash_near_pairs(docs, max_hamming=3).toPandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (1, 2) in pairs
    h12 = got[(got["doc_a"] == 1) & (got["doc_b"] == 2)].iloc[0]["hamming"]
    assert h12 == 0


def test_simhash_bucketed_equals_all_pairs(spark):
    """The pigeonhole chunk-join plan must reproduce the quadratic
    all-pairs output exactly (it is an exact rewrite, not an
    approximation)."""
    from moogle_spark.dedup import simhash_near_pairs_bucketed

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i % 5} token{i % 7} end")
        for i in range(40)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    exact = simhash_near_pairs(d, max_hamming=3).toPandas()
    bucketed = simhash_near_pairs_bucketed(d, max_hamming=3).toPandas()
    assert len(exact) > 0  # non-trivial corpus
    pd.testing.assert_frame_equal(exact, bucketed)


def test_lsh_composed_verification(spark, docs):
    """near_dup_pairs_lsh == exact Jaccard restricted to LSH candidates:
    on this corpus the planted near-dup pair must survive both stages."""
    from moogle_spark.dedup import near_dup_pairs_lsh

    got = near_dup_pairs_lsh(docs, n=3, num_hashes=8, bands=4, threshold=0.5).toPandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (1, 2) in pairs  # exact duplicates -> jaccard 1.0
    ex = ngram_jaccard_pairs(docs, n=3, threshold=0.5).toPandas()
    # every composed pair appears in the exact all-pairs output with the
    # same jaccard (candidates only restrict, never alter, the measure)
    ex_pairs = {(a, b): j for a, b, j in zip(ex["doc_a"], ex["doc_b"], ex["jaccard"])}
    for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"]):
        assert ex_pairs[(a, b)] == j


def test_simhash_bucketed_at_production_width(spark):
    """bits=60 — the width BENCH.md claims for 100 TB: the pigeonhole
    chunk equi-join must still be an EXACT rewrite of all-pairs (the
    16-bit case is kept separately as the DuckDB-oracle contract row).
    Exercises the conditional-sum agg and chunk extraction at full long
    range, Spark-only (DuckDB's conv() differs at 60 bits)."""
    from moogle_spark.dedup import simhash_near_pairs_bucketed

    rows = []
    for i in range(30):
        # 15 planted identical pairs (hamming 0) + per-doc variation so
        # non-trivial near pairs exist at full width
        text = f"alpha beta gamma delta epsilon zeta tok{i // 2} end"
        rows.append((2 * i, text))
        rows.append((2 * i + 1, text))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    exact = simhash_near_pairs(d, max_hamming=3, bits=60).toPandas()
    bucketed = simhash_near_pairs_bucketed(d, max_hamming=3, bits=60).toPandas()
    assert len(exact) >= 15  # the planted identical pairs at minimum
    pd.testing.assert_frame_equal(exact, bucketed)
    # prints use the full width: some hash must exceed 32-bit range
    s = simhash(d, bits=60).toPandas()
    assert s["simhash"].abs().max() > 2**32


# -------------------- pair -> cluster canonicalization ----------------------


def test_cc_transitive_closure_chain(spark):
    """A~B and B~C without A~C must still land in ONE cluster — clusters
    are the transitive closure of the pair graph, not the pair list."""
    from moogle_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10), (13, 10)}


def test_cc_converges_in_log_rounds_on_path_graph(spark):
    """Scale shape: a path graph is the worst case for one-hop min-label
    propagation (O(diameter) rounds); large-star/small-star must close it
    in O(log n) rounds.  128-node path -> bound 2*ceil(log2 128)+8 = 22,
    observed ~7."""
    import math

    from moogle_spark.dedup import connected_components

    n = 128
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats = {}
    got = connected_components(pairs, _stats=stats).collect()
    assert len(got) == n
    assert all(r["cluster_id"] == 0 for r in got)
    assert stats["rounds"] <= 2 * math.ceil(math.log2(n)) + 8
    assert stats["rounds"] <= 10  # empirically ~7; fail loudly on regression


def test_cc_rounds_are_equi_join_only(spark):
    """One large-star/small-star round must stay equi-join + groupBy —
    no cartesian product, no broadcast nested loop (the pair graph at
    100 TB scale cannot survive either)."""
    from moogle_spark.dedup import _large_star, _small_star

    e = spark.createDataFrame(
        [(5, 1), (7, 2), (9, 5)], "u long, v long"
    )
    plan = (
        _small_star(_large_star(e))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cc_empty_and_self_pairs(spark):
    from moogle_spark.dedup import connected_components

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0
    selfp = spark.createDataFrame([(4, 4)], "doc_a long, doc_b long")
    assert connected_components(selfp).count() == 0  # self-pairs dropped


def test_dedup_keep_one_survivor_rule(spark):
    """Survivor = highest quality_score, tie-broken by min doc_id;
    singletons survive as their own cluster; every dropped doc shares a
    cluster with exactly one survivor."""
    from moogle_spark.dedup import dedup_keep_one

    # doc 3 = BASE + stopword tail: higher stopword_ratio AND length
    # score -> strictly higher composite quality than its near-dups
    long_doc = BASE + " the and of to in is for with that this"
    rows = [
        (1, BASE),          # cluster {1,2,3}: near-dups
        (2, BASE),
        (3, long_doc),      # highest quality in its cluster
        (4, OTHER),         # singleton
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # explicit pair graph (the LSH path is oracle-checked by the
    # dup_clusters/dedup_survivors contract rows; banding at 8 hashes is
    # probabilistic for J~0.55 pairs, so the survivor-RULE test pins its
    # own candidates): 1~2 and 2~3 chain 3 into the cluster transitively
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    surv = dedup_keep_one(docs, pairs=pairs).toPandas()
    by_cluster = {int(r.cluster_id): r for r in surv.itertuples()}
    assert set(surv["doc_id"]) == {3, 4}
    assert by_cluster[1].doc_id == 3  # quality beats min-id
    assert by_cluster[1].cluster_size == 3
    assert by_cluster[4].cluster_size == 1
    # tie-break: two identical docs -> equal quality -> min doc_id wins
    twins = spark.createDataFrame(
        [(7, BASE), (5, BASE)], "doc_id long, text string"
    )
    tsurv = dedup_keep_one(twins, threshold=0.3).toPandas()
    assert list(tsurv["doc_id"]) == [5]
    assert list(tsurv["cluster_size"]) == [2]


def test_dedup_keep_one_accepts_external_pairs_and_quality(spark):
    """The composed stage also consumes caller-provided pair/quality
    tables (e.g. SimHash pairs + a model-based quality column)."""
    from moogle_spark.dedup import dedup_keep_one

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 3)], "doc_a long, doc_b long")
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.8)], "doc_id long, quality_score double"
    )
    surv = dedup_keep_one(docs, pairs=pairs, quality=quality).toPandas()
    assert set(surv["doc_id"]) == {2, 3}  # 3 beats 1 on quality


def test_cc_matches_union_find_on_random_graphs(spark):
    """Property check: connected_components == a driver-side union-find
    oracle on pseudo-random graphs (deterministic LCG edges, so the test
    is reproducible) spanning sparse forests to dense multi-component
    shapes."""
    from moogle_spark.dedup import connected_components

    def lcg(seed):
        x = seed
        while True:
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            yield x

    for seed, n_nodes, n_edges in ((7, 60, 25), (11, 80, 120), (13, 40, 70)):
        g = lcg(seed)
        edges = [
            (next(g) % n_nodes, next(g) % n_nodes) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # union-find oracle
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {a for e in edges for a in e}
        # canonical root = component MIN (matches cluster_id semantics)
        comp_min: dict[int, int] = {}
        for v in touched:
            r = find(v)
            comp_min[r] = min(comp_min.get(r, v), v)
        expected = {(v, comp_min[find(v)]) for v in touched}

        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            (int(r["doc_id"]), int(r["cluster_id"]))
            for r in connected_components(pairs).collect()
        }
        assert got == expected, f"seed={seed}"


def test_dedup_keep_one_plan_has_no_window(spark):
    """Survivor selection must stay a partial-aggregable groupBy — a
    window partitioned by cluster_id would make one mega-cluster a
    single hot sort partition at scale."""
    from moogle_spark.dedup import dedup_keep_one

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.6)], "doc_id long, quality_score double"
    )
    df = dedup_keep_one(docs, pairs=pairs, quality=quality)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan
