"""Micro-bench for the term-clustered postings cache (query.py:85):
measures the per-query cost of the `term.isin(...)` filter over the
cached postings, with the cache built UNSORTED (round-2 layout: terms
interleaved across cached batches -> batch min/max stats can never
exclude a batch) vs SORTED (sortWithinPartitions("term","block_id") ->
stats prune to the query's term runs).

The judge-specified done-criterion is "per-query scanned batches/rows
roughly flat as index size grows 10x": with pruning, filter cost tracks
the query's posting volume (roughly constant); without it, cost tracks
the whole index (grows ~10x).

Usage: python tools/cache_prune_bench.py [small_docs] [big_docs]
Prints one JSON line; paste into BENCH.md.
"""

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from moogle_spark.build import build_index  # noqa: E402
from moogle_spark.corpus import generate_docs, reference_queries  # noqa: E402
from moogle_spark.analyzer import tokenize_query  # noqa: E402
from moogle_spark.session import get_spark  # noqa: E402
from moogle_spark.tables import Warehouse  # noqa: E402

TRIALS = 5


def _filter_cost(spark, postings_cached, queries) -> float:
    """Median over trials of the total wall time to run the term-filter +
    count for every query (count materializes the scan; no scoring, so
    the measurement isolates cached-batch pruning)."""
    times = []
    for _ in range(TRIALS):
        t0 = time.time()
        for q in queries:
            terms = sorted(set(tokenize_query(q)))
            postings_cached.filter(F.col("term").isin(terms)).count()
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]


def _measure_wh(spark, wh_path: str) -> dict:
    wh = Warehouse(wh_path)
    base = wh.read(spark, "postings")
    n_parts = max(8, spark.sparkContext.defaultParallelism)
    queries = [q["query"] for q in reference_queries()][:12]
    out = {"wh": wh_path, "postings_rows": base.count()}
    for label, df in [
        ("unsorted", base.repartition(n_parts, "shard")),
        (
            "sorted",
            base.repartition(n_parts, "shard").sortWithinPartitions("term", "block_id"),
        ),
    ]:
        cached = df.persist()
        cached.count()  # materialize
        out[f"filter_sec_{label}"] = round(_filter_cost(spark, cached, queries), 3)
        # full-scan baseline: a predicate batch stats can never exclude
        # (every term >= "") — the cost when pruning does nothing
        t0 = time.time()
        cached.filter(F.col("term") >= "").count()
        out[f"fullscan_sec_{label}"] = round(time.time() - t0, 3)
        cached.unpersist()
    return out


def _measure(spark, n_docs: int, wh_path: str) -> dict:
    shutil.rmtree(wh_path, ignore_errors=True)
    build_index(spark, generate_docs(spark, n_docs), wh_path)
    return {"n_docs": n_docs, **_measure_wh(spark, wh_path)}


def main() -> None:
    spark = get_spark(app="cache_prune_bench")
    if len(sys.argv) > 2 and sys.argv[1] == "--wh":
        print(
            json.dumps(
                {"metric": "cached_postings_term_filter", **_measure_wh(spark, sys.argv[2])}
            )
        )
        return
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    r_small = _measure(spark, small, "/tmp/cpb_wh_small")
    r_big = _measure(spark, big, "/tmp/cpb_wh_big")
    growth = {
        k: round(r_big[f"filter_sec_{k}"] / max(r_small[f"filter_sec_{k}"], 1e-9), 2)
        for k in ("unsorted", "sorted")
    }
    print(
        json.dumps(
            {
                "metric": "cached_postings_term_filter",
                "small": r_small,
                "big": r_big,
                "cost_growth_small_to_big": growth,
            }
        )
    )


if __name__ == "__main__":
    main()
