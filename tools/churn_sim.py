"""Multi-day churn simulation: tiered maintenance keeps incremental cost
AND query latency bounded over many segment runs.

A daily-churn operator at 10^12 files never runs one incremental — they
run one per day, forever.  The failure modes only show up over the
sequence: generation count (query-time partitions) and the tombstone
mask grow without bound unless maintenance folds them back, and a FULL
compaction after uniform churn rewrites every base shard.  This tool
simulates D days of ~3% uniform churn over the same corpus on two
tracks:

  * maintained — after every segment run: merge_generations (O(segment
    rows) — bounds generation count at 1) plus
    compact_segments(max_shards=K) (bounds the per-day maintenance
    window to K base families while realizing their tombstones),
  * unmaintained — segment runs only: generations and tombstones stack.

Per day, both tracks record incremental/maintenance wall and (on probe
days) warm query p50.  At the end, BOTH tracks and a from-scratch
stable build of the final corpus must return rank-identical top-k
(scores to 9 decimals) on the probe queries — exactness is never traded
for the maintenance schedule.

Usage: python tools/churn_sim.py [n_docs] [n_shards] [days] [K]
       (default 100000, 256, 8, 16)
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    k_fam = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from pyspark.sql import functions as F

    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.query import SearchEngine
    from moogle_spark.segments import compact_segments, merge_generations
    from moogle_spark.corpus import generate_docs
    from moogle_spark.session import get_spark
    from moogle_spark.tables import Warehouse

    spark = get_spark(app="churn_sim", cores=8, shuffle_partitions=8)
    base = f"/tmp/moogle_churnsim_{n_docs}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    docs_v0 = generate_docs(spark, n_docs)
    docs_v0.write.mode("overwrite").parquet(f"{base}/docs_v0.parquet")

    def corpus_at(day: int):
        """Deterministic cumulative churn: each day d appends a fresh
        token to ~3% of docs (uniform by path hash), so day d's corpus
        embeds every prior day's changes."""
        df = spark.read.parquet(f"{base}/docs_v0.parquet")
        for d in range(1, day + 1):
            sel = F.pmod(F.xxhash64("path"), F.lit(33)) == F.lit(d % 33)
            df = df.withColumn(
                "content",
                F.when(
                    sel, F.concat(F.col("content"), F.lit(f" day{d}tok"))
                ).otherwise(F.col("content")),
            )
        return df

    # warmup (JVM codegen + python workers)
    build_index(spark, generate_docs(spark, 500), f"{base}/warm_wh")

    out: dict = {
        "n_docs": n_docs, "n_shards": n_shards, "days": days,
        "compact_max_shards": k_fam, "daily": [],
    }

    t0 = time.time()
    build_index(
        spark, corpus_at(0), f"{base}/wh_m", n_shards=n_shards,
        doc_id_mode="stable",
    )
    out["full_build_sec"] = round(time.time() - t0, 2)
    shutil.copytree(f"{base}/wh_m", f"{base}/wh_u")

    probe_qs = ["hotterm0 hotterm1", "def return import", "day1tok",
                "hotterm2", "uniqdoc7x"]

    def p50(wh_path: str) -> float:
        eng = SearchEngine(spark, wh_path)
        for q in probe_qs:
            eng.search(q, k=20).collect()
        lats = []
        for _ in range(3):
            for q in probe_qs:
                t = time.time()
                eng.search(q, k=20).collect()
                lats.append(time.time() - t)
        eng.postings.unpersist()
        eng.term_stats.unpersist()
        lats.sort()
        return round(lats[len(lats) // 2], 4)

    probe_days = {1, days // 2, days}
    for day in range(1, days + 1):
        docs = corpus_at(day)
        docs.write.mode("overwrite").parquet(f"{base}/docs_day.parquet")
        docs = spark.read.parquet(f"{base}/docs_day.parquet")
        row: dict = {"day": day}

        t0 = time.time()
        incremental_build(spark, docs, f"{base}/wh_m", strategy="segment")
        row["inc_maintained_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        merge_generations(spark, f"{base}/wh_m")
        row["merge_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        compact_segments(spark, f"{base}/wh_m", max_shards=k_fam)
        row["partial_compact_sec"] = round(time.time() - t0, 2)
        wm = Warehouse(f"{base}/wh_m")
        row["maintained_max_gen"] = int(wm.manifest("analyzed").get("max_gen", 0))
        row["maintained_tombs"] = (
            int(wm.manifest("tombstones")["n_tombs"])
            if wm.is_committed("tombstones") else 0
        )

        t0 = time.time()
        incremental_build(spark, docs, f"{base}/wh_u", strategy="segment")
        row["inc_unmaintained_sec"] = round(time.time() - t0, 2)
        wu = Warehouse(f"{base}/wh_u")
        row["unmaintained_max_gen"] = int(wu.manifest("analyzed").get("max_gen", 0))
        row["unmaintained_tombs"] = (
            int(wu.manifest("tombstones")["n_tombs"])
            if wu.is_committed("tombstones") else 0
        )

        if day in probe_days:
            row["p50_maintained_sec"] = p50(f"{base}/wh_m")
            row["p50_unmaintained_sec"] = p50(f"{base}/wh_u")
        out["daily"].append(row)
        print(json.dumps(row), file=sys.stderr)

    # ---- exactness across the whole schedule: both tracks must match a
    # from-scratch stable build of the final corpus, rank-identically
    t0 = time.time()
    build_index(
        spark, corpus_at(days), f"{base}/wh_scratch", n_shards=n_shards,
        doc_id_mode="stable",
    )
    out["final_scratch_build_sec"] = round(time.time() - t0, 2)

    def topk_sig(wh_path: str):
        """Full-depth result sets per query, tie-insensitive: doc_id
        spaces differ between warehouses, so equal-score ties order
        differently at any fixed k — compare the (repo, path, score)
        SET at full depth instead, like tests/test_segments.py."""
        eng = SearchEngine(spark, wh_path, cache=False)
        sig = []
        for q in probe_qs + [f"day{days}tok", "churn absent zz"]:
            rows = eng.search(q, k=n_docs + 1, enrich=True).collect()
            sig.append(
                sorted((r["repo"], r["path"], round(r["score"], 9)) for r in rows)
            )
        return sig

    sig_m, sig_u, sig_s = (
        topk_sig(f"{base}/wh_m"), topk_sig(f"{base}/wh_u"),
        topk_sig(f"{base}/wh_scratch"),
    )
    out["maintained_matches_scratch"] = sig_m == sig_s
    out["unmaintained_matches_scratch"] = sig_u == sig_s
    print(json.dumps(out))


if __name__ == "__main__":
    main()
