"""Plan-audit regression tests: the physical plans behind the engine's
scale claims must KEEP the shape they were designed for.  Each test
pins a property that `.explain()` verified by hand this round — if a
refactor reintroduces a per-query shuffle, drops a broadcast, widens a
scan, or turns an equi-join into a cartesian product, these fail before
any benchmark notices."""

import pytest

from moogle_spark.query import SearchEngine


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def engine(spark, built_warehouse):
    eng = SearchEngine(spark, built_warehouse)
    eng.search("hotterm0", k=3).collect()  # materialize the caches
    return eng


def test_search_plan_zero_exchange_broadcast_pruned(engine):
    plan = _plan(engine.search("hotterm0 hotterm1", k=5))
    # term df rides a broadcast hash join — never a corpus-wide sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # global merge is a k-row TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in plan
    # the query-side plan (everything ABOVE the cached relation) has no
    # shuffle: the only Exchange tokens may live inside the
    # InMemoryRelation's one-time build plan or be broadcasts
    query_side = plan.split("InMemoryRelation", 1)[0]
    assert "Exchange hashpartitioning" not in query_side
    # the term predicate reaches the cached-batch scan (min/max pruning
    # over the term-sorted cache)
    scan_line = next(
        ln for ln in plan.splitlines() if "InMemoryTableScan" in ln
    )
    assert "term" in scan_line and "IN" in scan_line


def test_enrich_plan_broadcasts_topk_side(engine):
    plan = _plan(engine.search("hotterm0", k=5, enrich=True))
    # the k-row result is the broadcast build side of the metadata join;
    # a corpus-sized shuffle join here would dominate query latency
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_docs_scan_prunes_columns(spark, tmp_path):
    """Column pruning must reach the parquet scan: an operator that uses
    (doc_id, text) may not drag the full document schema through IO."""
    from pyspark.sql import functions as F

    from moogle_spark.corpus import generate_docs
    from moogle_spark.dedup import exact_duplicate_groups

    p = str(tmp_path / "docs.parquet")
    generate_docs(spark, 50).write.parquet(p)
    docs = spark.read.parquet(p).select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("text")
    )
    plan = _plan(exact_duplicate_groups(docs))
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "ReadSchema: struct<path:string,content:string>" in scan, scan


def test_lsh_pairs_is_equi_join(spark):
    """The banded LSH candidate join must be an equi-join (shuffle on
    band keys, linear) — never a cartesian/nested-loop explosion."""
    from pyspark.sql import functions as F

    from moogle_spark.corpus import generate_docs
    from moogle_spark.dedup import minhash_lsh_pairs

    d = generate_docs(spark, 60).select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("text")
    )
    plan = _plan(minhash_lsh_pairs(d, num_hashes=8, bands=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_scan_partition_pruned(spark, tmp_path):
    from pyspark.sql import functions as F

    from moogle_spark.simsearch import ivf_index_write, ivf_search_indexed

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)], i % 3) for i in range(60)],
        "vec_id long, embedding array<float>, label int",
    )
    path = str(tmp_path / "ivf")
    ivf_index_write(emb, path, n_cells=4, iters=1)
    df = ivf_search_indexed(spark, path, [1.0, 2.0], k=5, nprobe=1)
    plan = _plan(df)
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "PartitionFilters" in scan and "cell" in scan


def test_search_many_plan_single_pass(engine):
    """The batched scorer must keep the single-query plan's shape: one
    broadcast term-stats join, no sort-merge join, no exchange on the
    postings side above the cache; the only added shuffle is the k-rows-
    per-query partitioned rank window."""
    plan = _plan(engine.search_many(["hotterm0 hotterm1", "def return"], k=5))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    query_side = plan.split("InMemoryRelation", 1)[0]
    # exactly the window's hashpartitioning(query_id) exchange — nothing
    # shuffles the postings themselves
    exchanges = [
        ln for ln in query_side.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1 and "query_id" in exchanges[0], exchanges
    # the union term filter reaches the cached-batch scan
    scan_line = next(ln for ln in plan.splitlines() if "InMemoryTableScan" in ln)
    assert "term" in scan_line and "IN" in scan_line
