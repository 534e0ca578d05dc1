"""foreachBatch incremental indexing: streamed doc drops land in the
batch index builder exactly once; the final index answers queries over
everything ingested (the indexer queue-drain loop, SURVEY.md §2.9)."""

import os

from pyspark.sql import functions as F


def test_incremental_index_foreachbatch(spark, tmp_path):
    from moogle_spark.build import build_index
    from moogle_spark.corpus import generate_docs
    from moogle_spark.query import SearchEngine
    from moogle_spark.streaming import incremental_index_foreachBatch

    docs = generate_docs(spark, 120).persist()
    src = str(tmp_path / "doc_drops")
    os.makedirs(src, exist_ok=True)
    half = F.pmod(F.xxhash64("path"), F.lit(2))
    docs.filter(half == 0).write.parquet(src + "/drop1.parquet")
    docs.filter(half == 1).write.parquet(src + "/drop2.parquet")

    seen = []

    def index_batch(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    stream = spark.readStream.schema(
        "repo string, path string, commit string, lang string, content string"
    ).parquet(src + "/*.parquet")
    incremental_index_foreachBatch(
        stream, index_batch, checkpoint=str(tmp_path / "ckpt"), timeout_s=120
    )
    assert sum(n for _, n in seen) == 120  # every doc exactly once

    # end-to-end: rebuild over the full accumulated corpus and query it
    wh = str(tmp_path / "wh")
    build_index(spark, spark.read.parquet(src + "/*.parquet"), wh)
    eng = SearchEngine(spark, wh, cache=False)
    assert eng.n_docs == 120
    assert eng.search("hotterm0", k=5).count() == 5
    docs.unpersist()


def test_staleness_gated_foreachbatch(spark, tmp_path):
    """The gated bridge: micro-batch 2 re-delivers half of batch 1's docs
    unchanged — only the genuinely new docs are tokenized (lineage
    proves it), and the final index covers everything exactly once."""
    from moogle_spark.corpus import generate_docs
    from moogle_spark.query import SearchEngine
    from moogle_spark.streaming import (
        incremental_index_foreachBatch,
        staleness_gated_batch_fn,
    )
    from moogle_spark.tables import Warehouse

    docs = generate_docs(spark, 100).persist()
    src = str(tmp_path / "drops")
    os.makedirs(src, exist_ok=True)
    third = F.pmod(F.xxhash64("path"), F.lit(3))
    drop1 = docs.filter(third < 2)          # ~2/3 of the corpus
    drop2 = docs.filter(third > 0)          # overlaps drop1 on third==1
    n1, n_new2 = drop1.count(), docs.filter(third == 2).count()
    drop1.write.parquet(src + "/drop1.parquet")

    wh = str(tmp_path / "wh")
    stream = spark.readStream.schema(
        "repo string, path string, commit string, lang string, content string"
    ).parquet(src + "/*.parquet")
    incremental_index_foreachBatch(
        stream, staleness_gated_batch_fn(wh), checkpoint=str(tmp_path / "ck1"),
        timeout_s=300,
    )
    lin = Warehouse(wh).lineage(spark)
    tok1 = lin.filter(F.col("stage") == "incremental_tokenize").count()
    assert tok1 == 0  # first batch hit the cold path (plain build)

    drop2.write.mode("overwrite").parquet(src + "/drop2.parquet")
    stream2 = spark.readStream.schema(
        "repo string, path string, commit string, lang string, content string"
    ).parquet(src + "/*.parquet")
    incremental_index_foreachBatch(
        stream2, staleness_gated_batch_fn(wh), checkpoint=str(tmp_path / "ck1"),
        timeout_s=300,
    )
    tok2 = (
        Warehouse(wh).lineage(spark)
        .filter(F.col("stage") == "incremental_tokenize")
        .agg(F.sum("doc_count")).collect()[0][0]
    )
    assert tok2 == n_new2, f"tokenized {tok2}, expected only the {n_new2} new docs"
    eng = SearchEngine(spark, wh, cache=False)
    assert eng.n_docs == 100
    docs.unpersist()


def test_streaming_segment_ingestion_stable(spark, tmp_path):
    """Continuous-ingestion shape: micro-batches land on a STABLE-id
    warehouse via strategy='segment' — batch 1 builds cold with stable
    ids, batch 2 (changed + re-delivered docs) lands as a generation
    with no base partition rewritten, and the final index answers over
    the merged live corpus."""
    from moogle_spark.corpus import generate_docs
    from moogle_spark.query import SearchEngine
    from moogle_spark.streaming import (
        incremental_index_foreachBatch,
        staleness_gated_batch_fn,
    )
    from moogle_spark.tables import Warehouse
    from test_stable_incremental import _snapshot_files

    docs = generate_docs(spark, 100).persist()
    src = str(tmp_path / "drops")
    os.makedirs(src, exist_ok=True)
    docs.write.parquet(src + "/drop1.parquet")

    wh = str(tmp_path / "wh")
    fn = staleness_gated_batch_fn(
        wh, n_shards=16, doc_id_mode="stable", strategy="segment",
    )
    schema = "repo string, path string, commit string, lang string, content string"
    incremental_index_foreachBatch(
        spark.readStream.schema(schema).parquet(src + "/*.parquet"),
        fn, checkpoint=str(tmp_path / "ck"), timeout_s=300,
    )
    man = Warehouse(wh).manifest("analyzed")
    assert man["doc_id_mode"] == "stable" and int(man["n_shards"]) == 16

    before = _snapshot_files(os.path.join(wh, "postings"))
    changed = docs.filter(F.pmod(F.xxhash64("path"), F.lit(5)) == 0).withColumn(
        "content", F.concat(F.col("content"), F.lit(" streamsegtok"))
    )
    # re-deliver some unchanged docs too (at-least-once delivery)
    drop2 = changed.unionByName(
        docs.filter(F.pmod(F.xxhash64("path"), F.lit(5)) == 1)
    )
    drop2.write.parquet(src + "/drop2.parquet")
    incremental_index_foreachBatch(
        spark.readStream.schema(schema).parquet(src + "/*.parquet"),
        fn, checkpoint=str(tmp_path / "ck"), timeout_s=300,
    )

    wh_o = Warehouse(wh)
    assert int(wh_o.manifest("analyzed")["max_gen"]) == 1
    assert int(wh_o.manifest("tombstones")["n_tombs"]) == changed.count()
    # no BASE postings partition was rewritten by the micro-batch
    after = _snapshot_files(os.path.join(wh, "postings"))
    for rel, sig in before.items():
        if rel.startswith("shard="):
            assert after.get(rel) == sig, f"postings/{rel} rewritten"
    # upsert semantics: re-delivered unchanged docs weren't tokenized
    tok = (
        wh_o.lineage(spark)
        .filter(F.col("stage") == "incremental_tokenize")
        .agg(F.sum("doc_count")).collect()[0][0]
    )
    assert int(tok) == changed.count()

    eng = SearchEngine(spark, wh, cache=False)
    assert eng.n_docs == 100
    assert eng.search("streamsegtok", k=100).count() == changed.count()
    docs.unpersist()
