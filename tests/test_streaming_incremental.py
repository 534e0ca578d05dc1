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
