"""Index build: docs -> analyzed -> doc_stats/corpus_stats/term_stats ->
compressed postings + doc_lens, with per-stage commits and lineage.

Pipeline (SURVEY.md §3.2 rebuild; north_star stage list):

  stage 1 `analyzed`   — deterministic dense doc_id assignment (two-pass
                         range-sort + partition offsets: scalable, no
                         single-partition window) + tokenize once via
                         mapInPandas (Arrow-batched; the analyzer is the
                         frozen pure function in analyzer.py). One row per
                         doc: (doc_id, meta, sha256, shard, doc_len,
                         terms[], tfs[], positions[][]).
  stage 2 `doc_stats`  — metadata projection (reference `metadata`
                         collection, services/indexer/models/metadata.py:8-15),
                         incl. per-doc top-k terms map (MAX_INDEX_WORDS
                         semantics, services/indexer/main.py:165-166).
  stage 3 `term_stats` — df(t) via explicit two-phase salted aggregation
                         (salt = hash(doc_id) % NSALT, then merge) — the
                         skew-defusal the north_star mandates; replaces the
                         reference's O(V) per-term count_documents scans
                         (services/tfidf/data/mongo_client.py:86-93).
  stage 4 `corpus_stats` — (n_docs, sum_dl, n_terms); avgdl = sum_dl/n_docs
                         derived as float64 at use sites (exact int inputs
                         -> deterministic across cluster sizes).
  stage 5 `postings`   — explode -> shuffle by (shard, term_bucket) ->
                         sort-merge -> applyInPandas block encoder:
                         delta+varint doc_ids/tfs/positions, 128-doc blocks,
                         per-block max tf-part (block-max metadata).
                         Document-sharding bounds any hot term's per-group
                         postings to the shard size — skew is structurally
                         defused in addition to AQE.
  stage 6 `doc_lens`   — per-shard dense doc_len arrays (varint); an
                         auxiliary artifact (scoring reads the inline
                         per-block dls copy instead — POSTINGS_SCHEMA).

Each stage commits via Warehouse.write (manifest = commit marker) and
appends lineage rows; build_index() skips committed stages on re-run, which
is the kill/resume semantics (tested in tests/test_build_resume.py).

Shards are contiguous doc_id ranges: shard = (doc_id - 1) // shard_size.
A query scores shards independently (every query term's postings for the
shard are local) and merges per-shard top-k — the standard
document-partitioned search architecture; this is what keeps scaling
efficiency high from N to 4N executors (no cross-shard traffic except the
k-row merge).
"""

from __future__ import annotations

import hashlib
import math
import os
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec
from .analyzer import term_freqs_positions
from .scoring import bm25_tfpart
from .tables import FORMAT_VERSION, Warehouse, partition_lineage

BLOCK_SIZE = 128
MAX_INDEX_WORDS = 1000  # reference MAX_INDEX_WORDS, services/indexer/utils/constants.py:23
NSALT = 16
TERM_BUCKETS = 64  # applyInPandas group sizing for the block encoder

ANALYZED_SCHEMA = (
    "doc_id long, repo string, path string, commit string, lang string, "
    "content_sha256 string, shard int, doc_len int, "
    "terms array<string>, tfs array<int>, positions array<array<int>>"
)

# dls = varint doc lengths inline per block (impact-index style norms):
# query-time scoring needs (tf, dl) per posting, so keeping dl beside tf
# makes a posting block self-contained — no per-query join/cogroup with a
# doc_lens table (measured: the cogroup shuffle dominated query latency).
POSTINGS_SCHEMA = (
    "shard int, term string, block_id int, n_docs int, first_doc long, "
    "last_doc long, doc_ids binary, tfs binary, positions binary, "
    "dls binary, pos_ints int, block_max_tf double"
)

DOC_LENS_SCHEMA = "shard int, first_doc long, n_docs int, doc_lens binary"


@dataclass
class BuildInfo:
    n_docs: int
    n_shards: int
    shard_size: int
    stages_run: list[str]
    stages_skipped: list[str]


def default_shards(n_docs: int) -> int:
    return int(min(4096, max(8, math.ceil(n_docs / 2048))))


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    warehouse: str | Warehouse,
    n_shards: int | None = None,
    force: bool = False,
    parallel: bool = True,
) -> BuildInfo:
    """Run all stages, skipping any already committed (resume).

    After `analyzed` commits, the remaining stages only depend on it (plus
    corpus_stats on term_stats), so they are submitted as CONCURRENT Spark
    jobs (parallel=True): the scheduler interleaves their tasks, hiding
    each job's scheduling/commit latency behind the others' compute.  Works
    identically on a cluster (FIFO scheduler backfills idle executors);
    per-stage commit/resume semantics are unchanged because each stage
    writes its own table + manifest atomically."""
    wh = warehouse if isinstance(warehouse, Warehouse) else Warehouse(warehouse)
    run: list[str] = []
    skip: list[str] = []

    def stage(name: str, fn) -> None:
        if (
            not force
            and wh.is_committed(name)
            and wh.manifest(name).get("format_version") == FORMAT_VERSION
        ):
            skip.append(name)
            return
        fn()
        run.append(name)

    state: dict = {}
    stage("analyzed", lambda: _stage_analyzed(spark, docs, wh, n_shards, state))
    analyzed = wh.read(spark, "analyzed")
    man = wh.manifest("analyzed")
    n_docs, shards, shard_size = man["n_docs"], man["n_shards"], man["shard_size"]

    def _term_then_corpus() -> None:
        stage("term_stats", lambda: _stage_term_stats(spark, analyzed, wh))
        stage("corpus_stats", lambda: _stage_corpus_stats(spark, wh, n_docs))

    # postings first (the Python-UDF-heavy branch), paired with the pure-JVM
    # branches; two-way concurrency overlaps scheduling gaps without
    # oversubscribing Python workers (4 concurrent pandas-UDF jobs x 32
    # workers each thrashes at scale).
    branches = [
        lambda: stage("postings", lambda: _stage_postings(spark, analyzed, wh)),
        lambda: stage("doc_stats", lambda: _stage_doc_stats(spark, analyzed, wh)),
        _term_then_corpus,
        lambda: stage("doc_lens", lambda: _stage_doc_lens(spark, analyzed, wh, shard_size)),
    ]
    if parallel:
        from concurrent.futures import ThreadPoolExecutor

        # Optionally cache the analyzed table (all branches scan it).
        # Default OFF: parquet re-reads are cheap (columnar, pruned) and
        # caching the widest table competes with shuffle/UDF memory at
        # scale on local[32].
        cache = os.environ.get("MOOGLE_CACHE_ANALYZED", "0") == "1"
        if cache:
            analyzed.persist()
        try:
            with ThreadPoolExecutor(max_workers=2) as ex:
                futures = [ex.submit(b) for b in branches]
                for f in futures:
                    f.result()
        finally:
            if cache:
                analyzed.unpersist()
    else:
        for b in branches:
            b()
    order = ["analyzed", "doc_stats", "term_stats", "corpus_stats", "postings", "doc_lens"]
    run.sort(key=order.index)
    skip.sort(key=order.index)
    return BuildInfo(n_docs, shards, shard_size, run, skip)


# ---------------------------------------------------------------------------


def _stage_analyzed(
    spark: SparkSession, docs: DataFrame, wh: Warehouse, n_shards: int | None, state: dict
) -> None:
    keys = ["repo", "path", "commit"]
    par = spark.sparkContext.defaultParallelism
    srt = docs.repartitionByRange(par, *keys).sortWithinPartitions(*keys).persist()
    # pass 1: per-partition counts -> deterministic global offsets.
    # (Range-boundary sampling may place rows differently run to run, but
    # doc_id = offset + local position == global sorted rank either way.)
    counts = (
        srt.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    n_docs = int(sum(by_pid.values()))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    shards = n_shards or default_shards(n_docs)
    shard_size = math.ceil(n_docs / shards) if n_docs else 1
    sc = spark.sparkContext
    b_off = sc.broadcast(offsets)

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        next_id = b_off.value.get(pid, 0) + 1  # doc_ids are 1-based
        for pdf in batches:
            out = {
                "doc_id": [], "repo": [], "path": [], "commit": [], "lang": [],
                "content_sha256": [], "shard": [], "doc_len": [],
                "terms": [], "tfs": [], "positions": [],
            }
            for repo, path, commit, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
            ):
                content = content or ""
                tfp = term_freqs_positions(content)
                terms = sorted(tfp)
                doc_id = next_id
                next_id += 1
                out["doc_id"].append(doc_id)
                out["repo"].append(repo)
                out["path"].append(path)
                out["commit"].append(commit)
                out["lang"].append(lang)
                out["content_sha256"].append(hashlib.sha256(content.encode("utf-8")).hexdigest())
                out["shard"].append((doc_id - 1) // shard_size)
                out["doc_len"].append(sum(t[0] for t in tfp.values()))
                out["terms"].append(terms)
                out["tfs"].append([tfp[t][0] for t in terms])
                out["positions"].append([tfp[t][1] for t in terms])
            yield pd.DataFrame(out)

    analyzed = srt.mapInPandas(analyze, ANALYZED_SCHEMA)
    wh.write(
        analyzed,
        "analyzed",
        stage="analyzed",
        partition_by=["shard"],
        meta={"n_docs": n_docs, "n_shards": shards, "shard_size": shard_size},
    )
    srt.unpersist()
    out = wh.read(spark, "analyzed")
    # ONE pass computes both the lineage rollup and sum_dl (columns pruned
    # to doc_len+sha by the scan): the per-partition rows carry
    # posting_bytes=sum(doc_len) here, which doubles as the corpus sum_dl.
    lin = partition_lineage(
        out, sha_col="content_sha256", bytes_expr=F.col("doc_len")
    ).persist()
    sum_dl = lin.agg(F.sum("posting_bytes")).collect()[0][0] or 0
    wh.update_meta("analyzed", {"sum_dl": int(sum_dl)})
    wh.append_lineage(spark, "analyzed", lin)
    lin.unpersist()


def _stage_doc_stats(spark: SparkSession, analyzed: DataFrame, wh: Warehouse) -> None:
    # top_terms: per-doc top MAX_INDEX_WORDS terms by tf (reference A2,
    # services/indexer/main.py:165-166) as map<string,int>.  The sort
    # comparator is expensive per-row, and truncation only matters for
    # docs with > MAX_INDEX_WORDS distinct terms — skip it otherwise
    # (map key order is semantically irrelevant).
    z = F.arrays_zip("terms", "tfs")
    topk = F.when(F.size("terms") <= MAX_INDEX_WORDS, z).otherwise(
        F.slice(
            F.array_sort(
                z,
                lambda a, b: F.when(a["tfs"] > b["tfs"], -1)
                .when(a["tfs"] < b["tfs"], 1)
                .when(a["terms"] < b["terms"], -1)
                .when(a["terms"] > b["terms"], 1)
                .otherwise(0),
            ),
            1,
            MAX_INDEX_WORDS,
        )
    )
    ds = analyzed.select(
        "doc_id", "repo", "path", "commit", "lang", "doc_len", "content_sha256", "shard",
        F.map_from_entries(
            F.transform(topk, lambda e: F.struct(e["terms"].alias("key"), e["tfs"].alias("value")))
        ).alias("top_terms"),
    )
    wh.write(ds, "doc_stats", stage="doc_stats", partition_by=["shard"], sort_by=["doc_id"])
    out = wh.read(spark, "doc_stats")
    wh.append_lineage(spark, "doc_stats", partition_lineage(out, sha_col="content_sha256"))


def _stage_term_stats(spark: SparkSession, analyzed: DataFrame, wh: Warehouse) -> None:
    # df(t): terms[] is per-doc-distinct, so df = count of rows per term.
    # Explicit two-phase salted aggregation (north_star skew mandate): a hot
    # term's rows first collapse within each of NSALT salt groups
    # (map-side + salted shuffle), then the <=NSALT partials merge.
    exploded = analyzed.select(
        F.explode("terms").alias("term"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(NSALT))).alias("salt"),
    )
    partial = exploded.groupBy("term", "salt").agg(F.count(F.lit(1)).alias("c"))
    df_t = partial.groupBy("term").agg(F.sum("c").cast("long").alias("df"))
    wh.write(df_t, "term_stats", stage="term_stats", sort_by=["term"])
    out = wh.read(spark, "term_stats")
    lin = partition_lineage(out).persist()
    n_terms = int(lin.agg(F.sum("doc_count")).collect()[0][0] or 0)
    wh.update_meta("term_stats", {"n_terms": n_terms})
    wh.append_lineage(spark, "term_stats", lin)
    lin.unpersist()


def _stage_corpus_stats(spark: SparkSession, wh: Warehouse, n_docs: int) -> None:
    # all three scalars were rolled up during earlier stages (manifest
    # metadata) — no scan jobs here.  Built via a 1-partition range, not
    # createDataFrame (which defaults to defaultParallelism partitions ->
    # a 32-task write for one row).
    sum_dl = int(wh.manifest("analyzed")["sum_dl"])
    n_terms = int(wh.manifest("term_stats")["n_terms"])
    cs = spark.range(0, 1, 1, 1).select(
        F.lit(int(n_docs)).cast("long").alias("n_docs"),
        F.lit(sum_dl).cast("long").alias("sum_dl"),
        F.lit(n_terms).cast("long").alias("n_terms"),
    )
    wh.write(cs, "corpus_stats", stage="corpus_stats")


def _stage_postings(spark: SparkSession, analyzed: DataFrame, wh: Warehouse) -> None:
    man = wh.manifest("analyzed")
    n_docs = man["n_docs"]
    avgdl = float(man["sum_dl"]) / float(n_docs) if n_docs else 1.0

    cols = ["shard", "term", "block_id", "n_docs", "first_doc", "last_doc",
            "doc_ids", "tfs", "positions", "dls", "pos_ints", "block_max_tf"]

    def encode_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        """One shard's docs -> that shard's full posting-block set.

        The flatten/sort happens HERE in numpy, not as an exploded Spark
        shuffle: the per-posting row shuffle (6M+ tiny rows with nested
        position arrays) was the old bottleneck; shuffling the ~shard_size
        doc rows (same bytes, 300x fewer rows) and doing the
        posting-ordering locally is ~3x faster end-to-end.  Sort key is
        (term_rank, doc_id) where term_rank comes from a hash factorize +
        a sort of the (small) distinct-term set — no O(n log n) Python
        string comparisons on the full posting array."""
        shard = int(pdf["shard"].iloc[0])
        n_per_doc = pdf["terms"].map(len).to_numpy(dtype=np.int64)
        if int(n_per_doc.sum()) == 0:
            return pd.DataFrame(columns=cols)
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(dtype=np.int64), n_per_doc)
        dls = np.repeat(pdf["doc_len"].to_numpy(dtype=np.int64), n_per_doc)
        terms = np.concatenate([np.asarray(t, dtype=object) for t in pdf["terms"]])
        tfs = np.concatenate([np.asarray(t, dtype=np.int64) for t in pdf["tfs"]])
        pos_flat: list = []
        for doc_pos in pdf["positions"]:
            pos_flat.extend(doc_pos)
        codes, uniques = pd.factorize(terms)
        uorder = np.argsort(uniques, kind="mergesort")
        rank = np.empty(uorder.size, dtype=np.int64)
        rank[uorder] = np.arange(uorder.size)
        order = np.lexsort((doc_ids, rank[codes]))
        terms_s = terms[order]
        doc_ids = doc_ids[order]
        tfs = tfs[order]
        dls = dls[order]
        pos_arr = np.empty(len(pos_flat), dtype=object)
        pos_arr[:] = pos_flat
        pos_arr = pos_arr[order]
        bounds = np.flatnonzero(terms_s[1:] != terms_s[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [terms_s.size]))
        rows: list[tuple] = []
        for s, e in zip(starts, ends):
            term = terms_s[s]
            for b0 in range(s, e, BLOCK_SIZE):
                b1 = min(b0 + BLOCK_SIZE, e)
                ids = doc_ids[b0:b1]
                btf = tfs[b0:b1]
                bpos = [np.asarray(p, dtype=np.int64) for p in pos_arr[b0:b1]]
                tfpart = bm25_tfpart(btf, dls[b0:b1], avgdl)
                rows.append(
                    (
                        shard,
                        term,
                        (b0 - s) // BLOCK_SIZE,
                        b1 - b0,
                        int(ids[0]),
                        int(ids[-1]),
                        codec.encode_doc_ids(ids),
                        codec.encode_tfs(btf),
                        codec.encode_positions(bpos),
                        codec.varint_encode(dls[b0:b1]),
                        int((b1 - b0) + int(btf.sum())),
                        float(tfpart.max()),
                    )
                )
        return pd.DataFrame(rows, columns=cols)

    # Parallelism: a group per shard is right at cluster scale (shards >>
    # cores), but in small corpora the shard count can undershoot the
    # cores.  Split each shard into term-hash buckets (a term lands wholly
    # in one bucket, so blocks are unaffected): each doc row is duplicated
    # per bucket with its arrays FILTERED map-side to that bucket's terms
    # — total shuffled bytes stay ~constant, group count becomes
    # shards × buckets.
    n_shards_actual = int(man["n_shards"])
    par = spark.sparkContext.defaultParallelism
    n_buckets = max(1, math.ceil(4 * par / max(1, n_shards_actual)))
    base = analyzed.select("shard", "doc_id", "doc_len", "terms", "tfs", "positions")
    if n_buckets > 1:
        z = F.arrays_zip("terms", "tfs", "positions")
        base = (
            analyzed.select(
                "shard",
                "doc_id",
                "doc_len",
                F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("tb"),
                z.alias("z"),
            )
            .select(
                "shard",
                "doc_id",
                "doc_len",
                "tb",
                F.filter(
                    "z",
                    lambda s: F.pmod(F.xxhash64(s["terms"]), F.lit(n_buckets))
                    == F.col("tb"),
                ).alias("zf"),
            )
            .filter(F.size("zf") > 0)
            .select(
                "shard",
                "doc_id",
                "doc_len",
                "tb",
                F.transform("zf", lambda s: s["terms"]).alias("terms"),
                F.transform("zf", lambda s: s["tfs"]).alias("tfs"),
                F.transform("zf", lambda s: s["positions"]).alias("positions"),
            )
        )
        postings = base.groupBy("shard", "tb").applyInPandas(
            encode_shard, POSTINGS_SCHEMA
        )
    else:
        postings = base.groupBy("shard").applyInPandas(encode_shard, POSTINGS_SCHEMA)
    wh.write(
        postings,
        "postings",
        stage="postings",
        partition_by=["shard"],
        sort_by=["term", "block_id"],
        meta={"avgdl": avgdl, "n_docs": n_docs, "block_size": BLOCK_SIZE},
    )
    out = wh.read(spark, "postings")
    wh.append_lineage(
        spark,
        "postings",
        partition_lineage(
            out, bytes_expr=F.length("doc_ids") + F.length("tfs") + F.length("positions")
        ),
    )


def _stage_doc_lens(
    spark: SparkSession, analyzed: DataFrame, wh: Warehouse, shard_size: int
) -> None:
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        first = int(ids[0])
        # shard doc_ids are contiguous by construction; assert the invariant
        assert ids[-1] - first + 1 == len(ids), "doc_ids not contiguous within shard"
        dls = pdf["doc_len"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "first_doc": [first],
                "n_docs": [len(ids)],
                "doc_lens": [codec.varint_encode(dls)],
            }
        )

    dl = analyzed.select("shard", "doc_id", "doc_len").groupBy("shard").applyInPandas(
        pack, DOC_LENS_SCHEMA
    )
    wh.write(dl, "doc_lens", stage="doc_lens", sort_by=["shard"])
