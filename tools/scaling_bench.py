"""Scaling-efficiency evidence (BASELINE.json north_rule): run the SAME
index-build + query job on the SAME input at multiple parallelism levels
(the sandbox proxy for N vs 4N executors), report throughput at each,
pairwise scaling efficiency, and assert the top-k results are
byte-identical across parallelism (float-determinism clause, SURVEY.md
§7.3).

Methodology notes (BENCH.md has the full analysis):

* Each level runs in a FRESH JVM child, **CPU-pinned with `taskset` to
  exactly its core count** — local[8] on an otherwise-idle 32-CPU box is
  NOT an 8-core cluster (JVM GC/IO threads and pipelined Python UDF
  workers soak up the idle cores and inflate the small level's
  throughput).  Pinning makes local[N] a faithful stand-in for an
  N-core executor allotment.
* Levels alternate across trials so shared-VM noise hits all levels
  symmetrically; best (least-disturbed) trial per level is kept.
* Children also report the postings stage's pure-Python encode seconds
  (from the build manifest): the input is identical at every level, so
  any growth of that number with parallelism measures the single host's
  memory-bandwidth saturation — contention a real 4N-executor cluster
  (4x sockets, 4x memory channels) does not have.  This is the evidence
  separating job-design scaling from single-box artifacts.

Usage:  python tools/scaling_bench.py [n_docs] [trials] [levels...]
        python tools/scaling_bench.py --child <cores> <n_docs> <trials>
Default levels: 2 8 32 (pairs 2->8 and 8->32 both reported).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _corpus_path(n_docs: int) -> str:
    """Keyed on the generator source hash: a generator change can never
    silently reuse a stale cached corpus."""
    import hashlib
    import inspect

    import moogle_spark.corpus as corpusmod

    tag = hashlib.sha256(inspect.getsource(corpusmod).encode()).hexdigest()[:12]
    return f"/tmp/moogle_scaling_corpus_{n_docs}_{tag}.parquet"


def child(cores: int, n_docs: int, trials: int) -> None:
    from moogle_spark.build import build_index
    from moogle_spark.corpus import generate_docs, reference_queries
    from moogle_spark.query import SearchEngine
    from moogle_spark.session import get_spark
    from moogle_spark.tables import Warehouse

    import numpy as np

    spark = get_spark(app=f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
    docs = spark.read.parquet(_corpus_path(n_docs))
    # warmup build (codegen + python worker spawn), untimed
    shutil.rmtree("/tmp/scaling_warm_wh", ignore_errors=True)
    build_index(spark, generate_docs(spark, 500), "/tmp/scaling_warm_wh")

    best = float("inf")
    wh = f"/tmp/scaling_wh_{cores}"
    all_times = []
    for _ in range(trials):
        shutil.rmtree(wh, ignore_errors=True)
        t0 = time.time()
        build_index(spark, docs, wh)
        dt = time.time() - t0
        all_times.append(round(dt, 2))
        best = min(best, dt)
    encode_py = Warehouse(wh).manifest("postings").get("encode_python_sec")

    eng = SearchEngine(spark, wh)
    eng.search("warmup", k=10).collect()
    lat = []
    h = hashlib.sha256()
    for q in reference_queries(n_docs):
        t0 = time.time()
        rows = eng.search(q["query"], k=q["k"]).collect()
        lat.append(time.time() - t0)
        for r in rows:
            h.update(f"{q['query_id']}:{r['rank']}:{r['doc_id']}:{r['score']!r};".encode())
    out = {
        "cores": cores,
        "n_docs": n_docs,
        "build_sec": round(best, 2),
        "build_sec_trials": all_times,
        "docs_per_sec": round(n_docs / best, 1),
        "encode_python_sec": encode_py,
        "query_p50_s": round(float(np.percentile(lat, 50)), 4),
        "query_p99_s": round(float(np.percentile(lat, 99)), 4),
        "topk_sha256": h.hexdigest(),
    }
    print("CHILD_RESULT " + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    levels = [int(a) for a in sys.argv[3:]] or [2, 8, 32]

    corpus = _corpus_path(n_docs)
    if not os.path.exists(corpus):
        import glob

        from moogle_spark.corpus import generate_docs
        from moogle_spark.session import get_spark

        # evict prior-generation corpora before writing a fresh one
        for stale in glob.glob(f"/tmp/moogle_scaling_corpus_{n_docs}_*.parquet"):
            shutil.rmtree(stale, ignore_errors=True)
        spark = get_spark(app="scaling_gen", cores=8)
        generate_docs(spark, n_docs).write.mode("overwrite").parquet(corpus)
        spark.stop()

    have_taskset = shutil.which("taskset") is not None

    def run_child(cores: int) -> dict:
        cmd = [sys.executable, os.path.abspath(__file__), "--child", str(cores), str(n_docs), "1"]
        if have_taskset:
            # pin the whole child tree (JVM + python workers) to exactly
            # `cores` CPUs: local[N] as an honest N-core executor proxy
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, cwd=REPO)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("CHILD_RESULT ")]
        if not line:
            print(p.stdout[-3000:])
            print(p.stderr[-3000:])
            raise RuntimeError(f"child {cores} failed")
        r = json.loads(line[-1][len("CHILD_RESULT "):])
        print(json.dumps(r))
        return r

    # ALTERNATE parallelism levels across trials so shared-VM noise hits
    # all levels symmetrically; keep the best (least-disturbed) trial of
    # each.  Fresh JVM per trial -> identical warmup treatment.
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(trials):
        for cores in levels:
            runs[cores].append(run_child(cores))
    results = {c: min(rs, key=lambda r: r["build_sec"]) for c, rs in runs.items()}
    for c in levels:
        results[c]["build_sec_trials"] = [r["build_sec"] for r in runs[c]]
    hashes = {r["topk_sha256"] for rs in runs.values() for r in rs}

    pairs = []
    for lo, hi in zip(levels, levels[1:]):
        tp_lo = results[lo]["docs_per_sec"]
        tp_hi = results[hi]["docs_per_sec"]
        pairs.append(
            {
                "pair": f"{lo}->{hi}",
                "cores_ratio": hi / lo,
                "speedup": round(tp_hi / tp_lo, 3),
                "scaling_efficiency": round((tp_hi / tp_lo) / (hi / lo), 3),
            }
        )
    summary = {
        "n_docs": n_docs,
        "cpu_pinned": have_taskset,
        "throughputs": {str(c): results[c]["docs_per_sec"] for c in levels},
        "encode_python_sec": {
            str(c): results[c].get("encode_python_sec") for c in levels
        },
        "pairs": pairs,
        "topk_byte_identical_across_parallelism": len(hashes) == 1,
        "detail": results,
    }
    print("SCALING_SUMMARY " + json.dumps(summary))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
