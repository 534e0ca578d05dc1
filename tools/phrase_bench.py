"""Worst-case exact-phrase latency (BENCH.md '1M-doc headroom' note):
times search_phrase on phrases built from the corpus's HOTTEST terms —
the case where round 2 decoded every candidate posting's position stream
(~370k positions, 10 s at 1M docs) and round 3's candidate-first scorer
should only decode blocks overlapping the cross-term intersection.

Usage: python tools/phrase_bench.py [n_docs]   (default 1_000_000)
Reuses the scaling-bench corpus/warehouse caches when present.
Prints one JSON line for BENCH.md.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from moogle_spark.build import build_index
    from moogle_spark.corpus import generate_docs
    from moogle_spark.query import SearchEngine
    from moogle_spark.session import get_spark
    from moogle_spark.tables import Warehouse
    from tools.scaling_bench import _corpus_path

    spark = get_spark(app="phrase_bench")
    cp = _corpus_path(n_docs)
    if not os.path.exists(cp):
        generate_docs(spark, n_docs).write.mode("overwrite").parquet(cp)
    wh = f"/tmp/moogle_phrase_wh_{n_docs}"
    if not Warehouse(wh).is_committed("postings"):
        shutil.rmtree(wh, ignore_errors=True)
        build_index(spark, spark.read.parquet(cp), wh)
    eng = SearchEngine(spark, wh)
    hot = [
        r["term"]
        for r in eng.term_stats.orderBy(F.desc("df"), "term").limit(2).collect()
    ]
    # a RARE term (df ~ 50-500): the common real-world phrase shape is
    # rare-with-common, where candidate-first should decode ~df(rare)
    # positions instead of df(common)
    rare = (
        eng.term_stats.filter(F.col("df").between(1000, 5000))
        .orderBy("term")
        .limit(1)
        .collect()[0]["term"]
    )
    eng.search(hot[0], k=10).collect()  # cache/codegen warmup
    out = {"metric": "phrase_worstcase_sec", "n_docs": n_docs, "phrases": {}}
    # a df~1 term (per-doc unique token): with block-range
    # pre-intersection the hot term decodes only the <=2 blocks whose
    # [first_doc,last_doc] range covers the singleton candidate, instead
    # of its full ~n_docs doc-id stream
    ultra = (
        eng.term_stats.filter(F.col("df") <= 2)
        .orderBy("term")
        .limit(1)
        .collect()[0]["term"]
    )
    for ph in [
        f"{hot[0]} {hot[0]}",
        f"{hot[0]} {hot[1]}",
        f"{hot[1]} {hot[0]}",
        f"{rare} {hot[0]}",
        f"{hot[0]} {rare}",
        f"{ultra} {hot[0]}",
    ]:
        times = []
        for _ in range(3):
            t0 = time.time()
            n = eng.search_phrase(ph, k=20).count()
            times.append(round(time.time() - t0, 2))
        out["phrases"][ph] = {"secs": times, "best": min(times), "hits_capped": n}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
