"""sf1-scale headroom run (round-4 verdict item 7): one 2M-doc
stable-id build + query latency (cached AND cold engine) + a 10%-churn
segment incremental + tiered compaction cycle, at 32 cores — 10x the
driver-bench corpus, proving the maintenance path and the uncached
fallback at the largest scale this VM holds.

Usage: python tools/sf1_headroom.py [n_docs] (default 2_000_000)
Prints one JSON line; record it in BENCH.md.
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from pyspark.sql import functions as F

    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.corpus import generate_docs, reference_queries
    from moogle_spark.query import SearchEngine
    from moogle_spark.segments import compact_segments
    from moogle_spark.session import get_spark

    spark = get_spark(app="sf1_headroom", cores=32, shuffle_partitions=32)
    out: dict = {"n_docs": n_docs}

    corpus_path = f"/tmp/sf1_corpus_{n_docs}.parquet"
    if not os.path.exists(corpus_path):
        generate_docs(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)

    wh = f"/tmp/sf1_wh_{n_docs}"
    shutil.rmtree(wh, ignore_errors=True)
    t0 = time.time()
    build_index(spark, docs, wh, doc_id_mode="stable")
    out["build_sec"] = round(time.time() - t0, 1)
    out["build_docs_per_sec"] = round(n_docs / out["build_sec"], 0)

    queries = [q["query"] for q in reference_queries(200_000)][:12]

    # cached engine (production read path)
    eng = SearchEngine(spark, wh)
    eng.search("warmup", k=10).collect()
    lat = []
    for q in queries:
        t0 = time.time()
        eng.search(q, k=20).collect()
        lat.append(time.time() - t0)
    lat.sort()
    out["cached_p50_sec"] = round(lat[len(lat) // 2], 3)
    out["cached_max_sec"] = round(lat[-1], 3)
    eng.unpersist()

    # cold engine (cache=False): per-query groupBy("shard") shuffle path
    cold = SearchEngine(spark, wh, cache=False)
    cold.search("warmup", k=10).collect()
    clat = []
    for q in queries[:6]:
        t0 = time.time()
        cold.search(q, k=20).collect()
        clat.append(time.time() - t0)
    clat.sort()
    out["cold_p50_sec"] = round(clat[len(clat) // 2], 3)
    out["cold_max_sec"] = round(clat[-1], 3)

    # 10% churn as a segment incremental + tiered maintenance
    # deterministic ~10% of keys (hash-chosen, so the churn clusters the
    # way real churn does NOT — the segment path must handle it)
    churn = docs.filter(F.abs(F.hash("repo", "path", "commit")) % 10 == 3).withColumn(
        "content", F.concat(F.col("content"), F.lit(" sf1churntok"))
    )
    n_churn = churn.count()
    t0 = time.time()
    incremental_build(
        spark, churn, wh, mode="upsert", strategy="segment",
        auto_compact_ratio=0.2, maintenance="tiered",
    )
    out["churn_sec"] = round(time.time() - t0, 1)
    out["churn_docs"] = n_churn
    out["churn_docs_per_sec"] = round(n_churn / out["churn_sec"], 0)

    # full compaction back to one generation
    t0 = time.time()
    compact_segments(spark, wh)
    out["compact_sec"] = round(time.time() - t0, 1)

    # post-maintenance query health (fresh cached engine)
    eng2 = SearchEngine(spark, wh)
    eng2.search("warmup", k=10).collect()
    lat2 = []
    for q in queries:
        t0 = time.time()
        eng2.search(q, k=20).collect()
        lat2.append(time.time() - t0)
    lat2.sort()
    out["post_churn_p50_sec"] = round(lat2[len(lat2) // 2], 3)
    hits = eng2.search("sf1churntok", k=5).count()
    out["churn_token_hits"] = int(hits)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
