"""Batched vs one-at-a-time query throughput (VERDICT round-3 item 4).

A single engine search is already ONE Spark job, so replaying an N-query
log one query at a time pays N x the local-mode per-job scheduling floor
(measured 85-120 ms on this VM — BENCH.md) even when every scan is
cache-warm.  SearchEngine.search_many folds the whole batch into one job;
this tool measures the gap on the frozen 40-query reference set.

Methodology: build (or reuse) an index over the deterministic corpus,
warm both paths once, then time (a) 40 sequential `search(q).collect()`
calls and (b) one `search_many(all 40).collect()`; repeat `trials` times
and keep the best (least-disturbed) trial per path — this VM has +-40%
run-to-run CPU noise.  Parity of results is asserted in
tests/test_engine_parity.py, not here.

Usage: python tools/multiquery_bench.py [n_docs] [trials]  (default 20000, 3)
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from moogle_spark.build import build_index
    from moogle_spark.corpus import generate_docs, reference_queries
    from moogle_spark.query import SearchEngine
    from moogle_spark.session import get_spark

    spark = get_spark(app="multiquery_bench", cores=8, shuffle_partitions=8)
    wh = f"/tmp/moogle_mq_wh_{n_docs}"
    if not os.path.exists(os.path.join(wh, "postings")):
        shutil.rmtree(wh, ignore_errors=True)
        build_index(spark, generate_docs(spark, n_docs), wh)
    try:
        eng = SearchEngine(spark, wh)
    except ValueError:  # stale format from an older code version
        shutil.rmtree(wh, ignore_errors=True)
        build_index(spark, generate_docs(spark, n_docs), wh)
        eng = SearchEngine(spark, wh)
    queries = [q["query"] for q in reference_queries(n_docs)]
    k = 20

    # warm both paths (codegen, python workers, postings cache)
    eng.search(queries[0], k=k).collect()
    eng.search_many(queries, k=k).collect()

    seq_best, batch_best = float("inf"), float("inf")
    for _ in range(trials):
        t0 = time.time()
        for q in queries:
            eng.search(q, k=k).collect()
        seq_best = min(seq_best, time.time() - t0)
        t0 = time.time()
        eng.search_many(queries, k=k).collect()
        batch_best = min(batch_best, time.time() - t0)

    out = {
        "n_docs": n_docs,
        "n_queries": len(queries),
        "trials": trials,
        "sequential_sec": round(seq_best, 3),
        "batched_sec": round(batch_best, 3),
        "speedup": round(seq_best / batch_best, 2),
        "sequential_qps": round(len(queries) / seq_best, 1),
        "batched_qps": round(len(queries) / batch_best, 1),
    }

    # batch-size scaling (round-4 verdict item 5): cycle the reference
    # set into term-OVERLAPPING batches of growing size — with the
    # per-pass decode memo, decode cost is per distinct block, so
    # per-query time must FALL (amortize) as |queries| grows, not hold
    # at the 40-query level.  sec_per_query across sizes is the check.
    scaling = {}
    for size in (40, 200, 1000):
        batch = [queries[i % len(queries)] + f" q{i}" for i in range(size)]
        eng.search_many(batch, k=k).collect()  # warm this size
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            eng.search_many(batch, k=k).collect()
            best = min(best, time.time() - t0)
        scaling[size] = {
            "batched_sec": round(best, 3),
            "ms_per_query": round(1000 * best / size, 2),
        }
    out["batch_scaling"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
