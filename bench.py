"""Benchmark harness (driver contract): index-build throughput + BM25
query latency on the engine, plus the headline contract queries at
$SPARK_GRAFT_SF_DIR.  Prints ONE JSON line:

  {"metric": "bench_total_sec", "value": <total>, "unit": "sec",
   "queries": {...per-step seconds...}, "sf": <sf>,
   "build_docs_per_sec": ..., "query_p50_s": ..., "query_p99_s": ...}

The index build runs over the deterministic synthetic corpus in the
BASELINE.json input_hint shape (repo,path,commit,lang,content), sized
~200k docs/sf; queries are the frozen reference query set
(corpus.reference_queries).  Scaling-efficiency evidence (same job at two
parallelism levels) lives in tools/scaling_bench.py / BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(tag.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_docs = max(2000, int(200_000 * sf))

    from moogle_spark.build import build_index
    from moogle_spark.corpus import generate_docs, reference_queries
    from moogle_spark.query import SearchEngine
    from moogle_spark.session import get_spark

    spark = get_spark(app="moogle_bench", cores=cpus, shuffle_partitions=cpus)
    steps: dict[str, float] = {}
    t_all = time.time()

    # -- corpus materialization (untimed; docs arrive as a table in real
    # use) + engine warmup (JVM codegen + Python UDF worker spawn) -------
    # Cache path is keyed on the generator code's hash so a generator
    # change can never silently reuse a stale corpus (timings would be
    # incomparable across code versions).
    import hashlib
    import inspect

    import moogle_spark.corpus as corpusmod

    gen_tag = hashlib.sha256(inspect.getsource(corpusmod).encode()).hexdigest()[:12]
    corpus_path = f"/tmp/moogle_bench_corpus_{n_docs}_{gen_tag}.parquet"
    if not os.path.exists(corpus_path):
        # evict prior-generation corpora (any other tag) before writing a
        # fresh one: repeated code iterations must not accumulate multi-GB
        # stale caches in /tmp
        import glob

        for stale in glob.glob(f"/tmp/moogle_bench_corpus_{n_docs}_*.parquet"):
            shutil.rmtree(stale, ignore_errors=True)
        generate_docs(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    warm_wh = "/tmp/moogle_bench_warmup_wh"
    shutil.rmtree(warm_wh, ignore_errors=True)
    t0 = time.time()
    build_index(spark, generate_docs(spark, 500), warm_wh)
    steps["warmup_build"] = round(time.time() - t0, 3)

    # -- index build throughput (fresh build, no resume credit) ----------
    wh = f"/tmp/moogle_bench_wh_{tag}"
    shutil.rmtree(wh, ignore_errors=True)
    t0 = time.time()
    build_index(spark, docs, wh)
    t_build = time.time() - t0
    steps["index_build"] = round(t_build, 3)

    # -- engine query latency over the reference query set ---------------
    # NOTE on cross-query comparisons: queries run back-to-back on the
    # same cached postings, so later queries whose terms share cached
    # batches (and JVM-warm codegen paths) with earlier ones can read
    # faster than the first-touch queries — e.g. q7-q9 historically sit
    # ~3x under the scheduling floor of q1-q6.  Compare a query against
    # ITSELF across rounds, not against its neighbors within a round.
    eng = SearchEngine(spark, wh)
    eng.search("warmup", k=10).collect()  # trigger caching/plan warmup
    lat = []
    for q in reference_queries(n_docs):
        t0 = time.time()
        eng.search(q["query"], k=q["k"]).collect()
        dt = time.time() - t0
        lat.append(dt)
        steps[f"q{q['query_id']}"] = round(dt, 3)
    lat_a = np.asarray(lat)

    # -- headline contract queries on the driver tables ------------------
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ["search_bm25", "lsh_pairs", "knn_brute", "pagerank"]:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        steps[name] = round(time.time() - t0, 3)

    total = time.time() - t_all
    out = {
        "metric": "bench_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": steps,
        "sf": sf,
        "n_docs_indexed": n_docs,
        "build_docs_per_sec": round(n_docs / t_build, 1),
        "query_p50_s": round(float(np.percentile(lat_a, 50)), 4),
        "query_p99_s": round(float(np.percentile(lat_a, 99)), 4),
        "cores": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
