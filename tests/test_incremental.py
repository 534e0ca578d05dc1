"""Staleness-gated incremental re-index: unchanged docs must skip the
tokenizer (proven by incremental_tokenize lineage doc_counts), and the
incrementally-built warehouse must be content-identical to a from-scratch
build over the same corpus (the reference's last_crawled gate,
services/indexer/main.py:140-143, re-expressed over content sha)."""

import hashlib

from pyspark.sql import functions as F


def _fingerprint(spark, wh_path: str) -> str:
    """Content fingerprint of the postings + corpus scalars (same scheme
    as the SIGKILL-resume test)."""
    from moogle_spark.tables import Warehouse

    wh = Warehouse(wh_path)
    rows = (
        wh.read(spark, "postings")
        .select("shard", "term", "first_doc", F.sha2(F.col("doc_ids"), 256).alias("h"))
        .orderBy("shard", "term", "first_doc")
        .collect()
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(
            f"{r['shard']}:{r['term']}:{r['first_doc']}:{r['h']};".encode()
        )
    cs = wh.read(spark, "corpus_stats").collect()[0]
    return f"{h.hexdigest()} {cs['n_docs']} {cs['sum_dl']} {cs['n_terms']}"


def _tokenized_since(spark, wh_path: str, n_before: int) -> int:
    from moogle_spark.tables import Warehouse

    lin = Warehouse(wh_path).lineage(spark)
    rows = (
        lin.filter(F.col("stage") == "incremental_tokenize")
        .orderBy("committed_at")
        .collect()
    )
    return sum(int(r["doc_count"]) for r in rows[n_before:])


def test_incremental_full_gates_tokenizer_and_matches_scratch(spark, tmp_path):
    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.corpus import generate_docs

    docs_v1 = generate_docs(spark, 300)
    # v2: ~10% of docs get changed content, everything else identical
    changed_mask = F.pmod(F.xxhash64("path"), F.lit(10)) == 0
    docs_v2 = docs_v1.withColumn(
        "content",
        F.when(changed_mask, F.concat(F.col("content"), F.lit(" freshchangedtoken"))).otherwise(
            F.col("content")
        ),
    )
    n_changed = docs_v2.filter(changed_mask).count()
    assert 10 <= n_changed <= 60  # sanity: the churn is a real minority

    wh_inc = str(tmp_path / "wh_inc")
    build_index(spark, docs_v1, wh_inc)

    info = incremental_build(spark, docs_v2, wh_inc)
    assert "analyzed" in info.stages_run and "postings" in info.stages_run
    # THE GATE: only the changed docs went through the analyzer
    assert _tokenized_since(spark, wh_inc, 0) == n_changed

    wh_scratch = str(tmp_path / "wh_scratch")
    build_index(spark, docs_v2, wh_scratch)
    assert _fingerprint(spark, wh_inc) == _fingerprint(spark, wh_scratch)


def test_incremental_noop_when_nothing_changed(spark, tmp_path):
    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.corpus import generate_docs

    docs = generate_docs(spark, 120)
    wh = str(tmp_path / "wh")
    build_index(spark, docs, wh)
    fp1 = _fingerprint(spark, wh)
    info = incremental_build(spark, docs, wh)
    assert info.stages_run == []  # true no-op: nothing rebuilt at all
    assert len(info.stages_skipped) == 6
    assert _tokenized_since(spark, wh, 0) == 0  # zero docs re-tokenized
    assert _fingerprint(spark, wh) == fp1


def test_incremental_upsert_keeps_absent_docs(spark, tmp_path):
    """upsert mode (the foreachBatch queue-drain semantic): a micro-batch
    holding only new docs extends the corpus without dropping the rest,
    and tokenizes only the batch."""
    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.corpus import generate_docs
    from moogle_spark.query import SearchEngine

    all_docs = generate_docs(spark, 150).persist()
    half = F.pmod(F.xxhash64("path"), F.lit(2))
    first, second = all_docs.filter(half == 0), all_docs.filter(half == 1)
    n_second = second.count()
    wh = str(tmp_path / "wh")
    build_index(spark, first, wh)
    incremental_build(spark, second, wh, mode="upsert")
    assert _tokenized_since(spark, wh, 0) == n_second
    eng = SearchEngine(spark, wh, cache=False)
    assert eng.n_docs == 150
    # and the merged index equals a from-scratch build over everything
    wh_scratch = str(tmp_path / "wh_scratch")
    build_index(spark, all_docs, wh_scratch)
    assert _fingerprint(spark, wh) == _fingerprint(spark, wh_scratch)
    all_docs.unpersist()
