"""Delta-feed ingestion evidence: the upsert-mode gate is shard-PRUNED
(stable.py — the committed side of the sha gate reads only the batch
keys' shard partitions), so a queue-drain batch costs O(batch), not
O(corpus) + O(churn).

Shard = hash(repo, path, commit), so a batch's keys spread uniformly
over shards: pruning pays when |batch| << n_shards (a small upsert or
takedown against a many-shard index — 500 keys over the 100k shards a
10^12-file index would use reads 0.5% of partitions).  A batch larger
than n_shards touches every shard and prunes nothing — the bench uses a
SMALL batch to measure the pruned shape honestly.

Measures, on an n_docs stable warehouse with n_shards partitions:
  * full-snapshot incremental (mode="full") with `batch` docs changed —
    the gate must scan the whole corpus to find dropped docs,
  * delta-feed incremental (mode="upsert") with the SAME changed docs
    supplied as a batch — gate pruned to the batch keys' shards,
  * delete_docs of `batch` keys — the takedown op: no tokenize at all.

All churn runs use strategy="segment" so the downstream cost is
O(churn) in each and the delta is isolated to the gate.

Usage: python tools/upsert_bench.py [n_docs] [n_shards] [batch]
       (default 200000, 1024, 20)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    n_batch_target = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from pyspark.sql import functions as F

    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.corpus import generate_docs
    from moogle_spark.session import get_spark
    from moogle_spark.stable import delete_docs

    spark = get_spark(app="upsert_bench", cores=8, shuffle_partitions=8)
    base = f"/tmp/moogle_upsbench_{n_docs}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    out: dict = {"n_docs": n_docs, "n_shards": n_shards, "cores": 8}

    docs_v1 = generate_docs(spark, n_docs)
    churn_mask = (
        F.pmod(F.xxhash64("path", F.lit("ups")), F.lit(n_docs // n_batch_target))
        == 0
    )
    batch = docs_v1.filter(churn_mask).withColumn(
        "content", F.concat(F.col("content"), F.lit(" upsbenchtoken"))
    )
    n_batch = batch.count()
    out["batch_docs"] = n_batch

    def clone(name: str) -> str:
        dst = os.path.join(base, name)
        shutil.copytree(os.path.join(base, "v1"), dst)
        return dst

    t0 = time.time()
    build_index(spark, docs_v1, os.path.join(base, "v1"),
                n_shards=n_shards, doc_id_mode="stable")
    out["full_build_sec"] = round(time.time() - t0, 1)

    # full-snapshot incremental: corpus-with-churn supplied whole
    snapshot = docs_v1.withColumn(
        "content",
        F.when(churn_mask,
               F.concat(F.col("content"), F.lit(" upsbenchtoken"))
               ).otherwise(F.col("content")),
    )
    wh = clone("snap")
    t0 = time.time()
    info = incremental_build(spark, snapshot, wh, mode="full",
                             strategy="segment")
    out["snapshot_incremental"] = {
        "wall_sec": round(time.time() - t0, 1), "stage_secs": info.stage_secs,
    }

    # delta-feed upsert: ONLY the batch supplied; gate shard-pruned
    wh = clone("delta")
    t0 = time.time()
    info = incremental_build(spark, batch, wh, mode="upsert",
                             strategy="segment")
    out["delta_upsert"] = {
        "wall_sec": round(time.time() - t0, 1), "stage_secs": info.stage_secs,
    }

    # takedown: delete a small key set, no content supplied
    del_keys = docs_v1.filter(
        F.pmod(F.xxhash64("path", F.lit("del")), F.lit(n_docs // n_batch_target))
        == 0
    ).select("repo", "path", "commit")
    out["delete_keys"] = del_keys.count()
    wh = clone("del")
    t0 = time.time()
    info = delete_docs(spark, del_keys, wh, strategy="segment")
    out["delete_docs"] = {
        "wall_sec": round(time.time() - t0, 1), "stage_secs": info.stage_secs,
    }

    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
