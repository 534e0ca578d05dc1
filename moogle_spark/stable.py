"""Stable-doc_id mode: shard-scoped incremental rebuilds (O(churn), not
O(corpus)).

Rank mode (the default) assigns doc_id = global (repo, path, commit)
sorted rank — deterministic and oracle-friendly, but any insert shifts
every subsequent id, so its incremental path must rebuild all downstream
tables over the whole corpus.  Stable mode pins a doc to a shard by key
hash and ranks only WITHIN the shard:

    shard  = pmod(xxhash64(repo, path, commit), n_shards)   (frozen)
    doc_id = shard * STRIDE + within-shard rank             (rank 1-based)

A churned doc perturbs only its own shard's ranks, so a daily 10%-churn
incremental re-tokenizes only the changed docs (the same sha gate as
rank mode) AND re-encodes only the touched shards' postings/doc_stats/
doc_lens partitions — the reference's per-doc staleness-gate semantics
(services/indexer/main.py:140-143) at Spark scale.  Every per-shard
invariant the scorers rely on survives: doc_ids stay contiguous within
a shard (dense accumulation spans, doc_lens packing), and the postings
block-max metadata is avgdl-independent (build.py POSTINGS_SCHEMA), so
untouched shards' WAND bounds remain exact when the corpus avgdl moves.

(A raw xxhash64 doc_id — the obvious alternative — would both collide at
10^12 docs (63-bit birthday bound) and destroy the dense per-shard id
ranges the vectorized scorers depend on; hashing only the SHARD choice
and ranking within it gives the same O(churn) incrementality with zero
collision risk.)

n_shards is chosen at the first build and FROZEN in the analyzed
manifest — at 100 TB pick it so a shard's analyzed rows fit an executor
(e.g. 100k shards for 10^12 docs); re-sharding is an explicit
force-rebuild.

Commit protocol: all delta tables are staged as committed *_delta /
*_next tables first; then ONE fsync'd _TXN.json journal (tables.py
begin_txn/recover_txn) records the partition moves + promotes + final
manifests and is replayed idempotently by every entry point, so a kill
at any moment leaves either the old index or the new one — never a mix.
"""

from __future__ import annotations

import hashlib
import os
import time
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyzer import term_freqs_positions
from .build import (
    ANALYZED_SCHEMA,
    DOWNSTREAM_STAGES,
    NSALT,
    BuildInfo,
    _downstream_current,
    _LineageAccParam,
    _stage_doc_lens,
    _stage_doc_stats,
    _stage_postings,
    default_shards,
)
from .tables import Warehouse, locked

# doc_id = shard * STRIDE + rank: 2^33 docs per shard headroom; with the
# 4096-shard default cap doc_ids stay < 2^45 (int64-safe, and far below
# the phrase scorer's composite-key overflow guard).
STRIDE = 1 << 33

KEYS = ["repo", "path", "commit"]
GATE = KEYS + ["lang", "content_sha256"]
_DELTA_TABLES = [
    ("analyzed", "analyzed_delta"),
    ("doc_stats", "doc_stats_delta"),
    ("postings", "postings_delta"),
    ("doc_lens", "doc_lens_delta"),
]
_STAGING = [d for _, d in _DELTA_TABLES] + [
    "term_stats_next", "corpus_stats_next", "tombstones_next",
]
# "auto" strategy: take the segment path once this fraction of shards is
# touched — below it, the shard-swap's downstream cost (∝ touched-shard
# bytes) beats the segment path's query-time overhead accumulation;
# above it, shard-swap degenerates toward a full rebuild (BENCH.md
# round-4 uniform-churn row) while the segment path stays O(churn).
SEG_AUTO_FRAC = 0.25


def stable_shard_col(n_shards: int):
    return F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(n_shards)).cast("int")


def _sha_col():
    return F.sha2(F.encode(F.coalesce(F.col("content"), F.lit("")), "utf-8"), 256)


def _analyze_rank_fn(acc, shard_size_guard: int = STRIDE):
    """mapInPandas body: rows arrive sorted by (shard, repo, path, commit)
    with every shard wholly inside one partition (hash repartition on the
    shard column), so within-shard rank is a running per-shard counter —
    no global offset pass, no window — and the same pass runs the
    analyzer (one Python sweep total).  The incremental delta path does
    NOT use this: its rows already carry terms, so it assigns the
    identical ranks with a pure-JVM row_number window instead
    (incremental_build_stable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        next_rank: dict[int, int] = {}
        part_shas: list[str] = []
        part_dl = 0
        cols = [
            "doc_id", "repo", "path", "commit", "lang", "content_sha256",
            "shard", "doc_len", "terms", "tfs", "positions",
        ]
        for pdf in batches:
            out = {c: [] for c in cols}
            it = zip(
                pdf["shard"], pdf["repo"], pdf["path"], pdf["commit"],
                pdf["lang"], pdf["content"],
            )
            for row in it:
                shard = int(row[0])
                rank = next_rank.get(shard, 0) + 1
                next_rank[shard] = rank
                if rank >= shard_size_guard:
                    raise OverflowError(
                        f"shard {shard} exceeds STRIDE={shard_size_guard} docs; "
                        "rebuild with more shards"
                    )
                doc_id = shard * STRIDE + rank
                _sh, repo, path, commit, lang, content = row
                content = content or ""
                tfp = term_freqs_positions(content)
                terms = sorted(tfp)
                sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
                dl = sum(t[0] for t in tfp.values())
                tfs = [tfp[t][0] for t in terms]
                positions = [p for t in terms for p in tfp[t][1]]
                part_shas.append(sha)
                part_dl += dl
                out["doc_id"].append(doc_id)
                out["repo"].append(repo)
                out["path"].append(path)
                out["commit"].append(commit)
                out["lang"].append(lang)
                out["content_sha256"].append(sha)
                out["shard"].append(shard)
                out["doc_len"].append(dl)
                out["terms"].append(terms)
                out["tfs"].append(tfs)
                out["positions"].append(positions)
            yield pd.DataFrame(out, columns=cols)
        rollup = hashlib.sha256(",".join(sorted(part_shas)).encode()).hexdigest()
        acc.add(
            {pid: {"partition_id": pid, "doc_count": len(part_shas),
                   "posting_bytes": part_dl, "sha256_rollup": rollup}}
        )

    return run


def _shard_grouped(df: DataFrame, n_shards: int) -> DataFrame:
    """Repartition so every shard's rows are wholly inside one partition,
    sorted by (shard, repo, path, commit) — the precondition for local
    within-shard rank assignment.  Hash partitioning on the shard COLUMN
    guarantees colocation at any partition count; shards are hash-
    balanced so skew is bounded by the shard-size distribution."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    nparts = max(par, min(n_shards, 4 * par))
    return df.repartition(nparts, "shard").sortWithinPartitions("shard", *KEYS)


def _delta_term_stats(
    spark: SparkSession,
    wh: Warehouse,
    changed_an: DataFrame,
    gone: DataFrame,
    new_build_id: str,
) -> int:
    """term_stats delta: df' = df + count(new docs' terms)
                                   - count(removed/replaced docs' terms)
    (unchanged docs — even in touched shards — contribute no df change.)
    Same two-phase salted shape as the full build for hot-term hygiene.
    Writes ``term_stats_next`` (committed) and returns its n_terms."""
    from pyspark.sql import Observation

    def term_counts(df: DataFrame, out: str) -> DataFrame:
        ex = df.select(
            F.explode("terms").alias("term"),
            F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(NSALT)).alias("salt"),
        )
        partial = ex.groupBy("term", "salt").agg(F.count(F.lit(1)).alias("c"))
        return partial.groupBy("term").agg(F.sum("c").cast("long").alias(out))

    ts = wh.read(spark, "term_stats")
    merged = (
        ts.join(term_counts(changed_an, "cn"), "term", "full")
        .join(term_counts(gone, "cg"), "term", "full")
        .select(
            "term",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("cn"), F.lit(0))
                - F.coalesce(F.col("cg"), F.lit(0))
            ).cast("long").alias("df"),
        )
        .filter(F.col("df") > 0)
    )
    obs = Observation("term_stats_next")
    merged = merged.observe(obs, F.count(F.lit(1)).alias("n_terms"))
    wh.write(
        merged,
        "term_stats_next",
        stage="term_stats",
        sort_by=["term"],
        meta={"analyzed_ref": new_build_id},
        meta_fn=lambda: {"n_terms": int(obs.get["n_terms"])},
    )
    return int(wh.manifest("term_stats_next")["n_terms"])


def _write_corpus_next(
    wh: Warehouse, n_docs: int, sum_dl: int, n_terms: int, new_build_id: str
) -> None:
    import pyarrow as pa

    wh.write_local(
        [{"n_docs": int(n_docs), "sum_dl": int(sum_dl), "n_terms": int(n_terms)}],
        {"n_docs": pa.int64(), "sum_dl": pa.int64(), "n_terms": pa.int64()},
        "corpus_stats_next",
        stage="corpus_stats",
        meta={"analyzed_ref": new_build_id},
    )


def _stage_analyzed_stable(
    spark: SparkSession,
    docs: DataFrame,
    wh: Warehouse,
    n_shards: int | None,
    dst: str = "analyzed",
) -> None:
    """Stable-mode analyzed stage: ONE pass tokenizes and assigns
    (shard, within-shard rank) doc_ids — no global count pass and no
    range-boundary sampling job (contrast _stage_analyzed's two-pass
    rank protocol), because ranks are local to each hash-pinned shard."""
    if n_shards is None:
        n_shards = default_shards(docs.count())
    sc = spark.sparkContext
    lin_acc = sc.accumulator({}, _LineageAccParam())
    src = docs.select(*KEYS, "lang", "content").withColumn(
        "shard", stable_shard_col(n_shards)
    )
    analyzed = _shard_grouped(src, n_shards).mapInPandas(
        _analyze_rank_fn(lin_acc), ANALYZED_SCHEMA
    )
    wh.write(
        analyzed,
        dst,
        stage="analyzed",
        partition_by=["shard"],
        meta={
            "n_shards": int(n_shards),
            "shard_size": STRIDE,
            "doc_id_mode": "stable",
            "build_id": uuid.uuid4().hex,
        },
        meta_fn=lambda: {
            "n_docs": int(sum(r["doc_count"] for r in lin_acc.value.values())),
            "sum_dl": int(sum(r["posting_bytes"] for r in lin_acc.value.values())),
        },
    )
    wh.append_lineage_rows(dst, list(lin_acc.value.values()))


def _segmented(wh: Warehouse) -> bool:
    """True if the warehouse carries Lucene-style segments/tombstones
    (segments.py) on top of the base stable index."""
    if int(wh.manifest("analyzed").get("max_gen", 0)) > 0:
        return True
    return (
        wh.is_committed("tombstones")
        and int(wh.manifest("tombstones").get("n_tombs", 0)) > 0
    )


@locked("incremental_build", "wh")
def incremental_build_stable(
    spark: SparkSession,
    docs: DataFrame,
    wh: str | Warehouse,
    mode: str = "full",
    parallel: bool = True,
    strategy: str = "shards",
    auto_compact_ratio: float | None = None,
    maintenance: str = "compact",
    deletes: DataFrame | None = None,
) -> BuildInfo:
    """Shard-scoped incremental over a stable-id warehouse: tokenizes only
    changed docs (sha+lang gate), rebuilds only the shards containing a
    changed/removed doc, delta-updates term_stats df and the corpus
    scalars, and swaps it all in via one recoverable _TXN journal.

    The result is bit-identical to a from-scratch stable build over the
    same corpus (ranks within a shard depend only on that shard's final
    membership) — asserted in tests/test_stable_incremental.py.

    ``strategy`` picks the downstream-update shape:
      "shards"  — replace every TOUCHED shard's partitions (this module).
                  Cost ∝ touched-shard bytes: ideal for clustered churn,
                  degenerates to a full downstream rebuild when churn is
                  uniform (every shard touched).
      "segment" — write the changed docs as a new GENERATION plus
                  tombstones (segments.py, the Lucene segment model):
                  cost O(churn) for ANY churn distribution; query-time
                  overhead accumulates until compact_segments().
      "auto"    — "segment" when the warehouse already has segments or
                  > SEG_AUTO_FRAC of shards are touched, else "shards".
    A warehouse that already carries segments stays on the segment path
    unless strategy="shards", which compacts first (the shard-swap
    machinery is only sound on a segment-free base).
    ``auto_compact_ratio``: after a segment run, run maintenance when
    tombstones exceed this fraction of live docs (None = never).
    ``maintenance`` picks what that trigger runs:
      "compact" — full compact_segments (bit-identical base, but after
                  uniform churn that rewrites every dirty base shard);
      "tiered"  — merge_generations (O(segment rows), caps the
                  generation count at 1) then
                  compact_segments(max_shards=K) with K chosen as the
                  fewest dirtiest families whose fold brings the mask
                  back under HALF the trigger ratio (hysteresis, so the
                  trigger doesn't re-fire every run) — the maintenance
                  window stays bounded at any churn shape.
    ``deletes`` (upsert mode only): a frame carrying (repo, path, commit)
    keys to REMOVE in the same batch — queue-drain semantics where the
    batch's final state is "upserts applied, listed keys absent".  A key
    appearing in both ``docs`` and ``deletes`` is an upsert (the doc
    wins); deleting an absent key is a no-op.  Full mode rejects it: a
    full snapshot already expresses deletions by absence."""
    if mode not in ("full", "upsert"):
        raise ValueError(f"mode={mode!r} must be 'full' or 'upsert'")
    if deletes is not None and mode != "upsert":
        raise ValueError(
            "deletes requires mode='upsert' — a full snapshot expresses "
            "deletions by absence from the snapshot"
        )
    if strategy not in ("shards", "segment", "auto"):
        raise ValueError(
            f"strategy={strategy!r} must be 'shards', 'segment' or 'auto'"
        )
    if maintenance not in ("compact", "tiered"):
        raise ValueError(
            f"maintenance={maintenance!r} must be 'compact' or 'tiered'"
        )
    wh = wh if isinstance(wh, Warehouse) else Warehouse(wh)
    from .build import FORMAT_VERSION, build_index

    # apply any pending partition-swap journal FIRST: until it is replayed
    # the on-disk tables are a committed old/new mix and every manifest
    # read below would see pre-swap state
    wh.recover_txn()
    if not (
        wh.is_committed("analyzed")
        and wh.manifest("analyzed").get("format_version") == FORMAT_VERSION
        and wh.manifest("analyzed").get("doc_id_mode", "rank") == "stable"
    ):
        # the fallback REBUILDS FROM ``docs`` — only sound when docs is
        # the whole corpus.  A deletes batch or an upsert batch against a
        # previously-committed index (old format / rank mode) must never
        # silently replace that index with the batch's contents.
        if deletes is not None:
            raise ValueError(
                "deletes requires a committed current-format stable index; "
                "this warehouse needs a full rebuild first"
            )
        if mode == "upsert" and wh.is_committed("analyzed"):
            raise ValueError(
                "committed index is not a current-format stable warehouse; "
                "an upsert batch cannot heal it — re-run with mode='full' "
                "and the complete corpus (or build_index force=True)"
            )
        return build_index(
            spark, docs, wh, parallel=parallel, doc_id_mode="stable"
        )
    segmented = _segmented(wh)
    # delta swaps graft new shard partitions onto the COMMITTED downstream
    # tables — that is only sound if those tables are present, current-
    # format, and built from THIS analyzed.  Heal any gap first (skips the
    # committed analyzed, rebuilds exactly the non-current stages) — but
    # NOT on a segmented warehouse: build_index's stage plans aggregate
    # the raw analyzed table, which still holds tombstoned rows, so its
    # term_stats/corpus_stats would count dead docs.  There the safe
    # direction is a full from-scratch rebuild of the incoming corpus.
    if not all(_downstream_current(wh, t) for t in DOWNSTREAM_STAGES):
        if segmented:
            if mode == "upsert":
                # the only sound heal here is a from-scratch rebuild of
                # the whole corpus, and an upsert batch is NOT the corpus
                raise RuntimeError(
                    "segmented warehouse has stale downstream tables; "
                    "re-run with mode='full' and the full corpus to heal"
                )
            for t in ["analyzed", "tombstones", *DOWNSTREAM_STAGES]:
                wh.drop(t)
            return build_index(spark, docs, wh, parallel=parallel, doc_id_mode="stable")
        build_index(spark, docs, wh, parallel=parallel, doc_id_mode="stable")
    if segmented and strategy == "shards":
        # shard-swap assumes a segment-free base (its per-shard re-rank
        # would collide with live segment rows of the same base shard)
        from .segments import compact_segments

        compact_segments(spark, wh)
        segmented = False
    man = wh.manifest("analyzed")
    n_shards = int(man["n_shards"])
    t0 = time.time()
    stage_secs: dict[str, float] = {}

    # abandoned staging from a run killed BEFORE its journal was written
    # is meaningless (no journal -> old warehouse is authoritative)
    for t in _STAGING:
        wh.drop(t)

    old = wh.read(spark, "analyzed")
    if segmented:
        # the gate must see the LIVE corpus: physical analyzed rows minus
        # tombstoned doc_ids (a dead row's key/sha must not mask a re-add)
        from .segments import live_analyzed

        old = live_analyzed(spark, wh)
    incoming = docs.withColumn("content_sha256", _sha_col())
    del_keys = None
    if deletes is not None:
        # a key appearing in BOTH docs and deletes is an upsert (the doc
        # wins), so subtract incoming keys from the delete set first
        del_keys = (
            deletes.select(*KEYS).distinct()
            .join(incoming.select(*KEYS), KEYS, "left_anti")
        )
    if mode == "upsert":
        # shard is a pure function of the key, so every GATE/KEYS join
        # partner of this batch lives in the batch keys' shards: prune
        # the committed side to those partitions (analyzed is written
        # partitionBy("shard")) and the gate reads O(batch-shard bytes),
        # not O(corpus).  Full mode must scan everything anyway — absence
        # from the snapshot means deletion.
        sh = incoming.select(stable_shard_col(n_shards).alias("shard"))
        if deletes is not None:
            sh = sh.unionByName(
                deletes.select(stable_shard_col(n_shards).alias("shard"))
            )
        batch_shards = sorted({int(r["shard"]) for r in sh.distinct().collect()})
        # match every GENERATION of the batch families, not just the base
        # shard value: segment generations store shard = gen*n_shards +
        # base (segments.py), and a gen-resident doc must still be
        # visible to the gate — a base-only filter would miss it (silent
        # duplicate on re-upsert, silent no-op on delete).  The physical
        # ids are enumerated explicitly because a plain isin on the
        # partition column is what Spark provably turns into
        # PartitionFilters (an equivalent pmod() predicate is not pruned).
        max_gen = int(man.get("max_gen", 0))
        phys = [
            g * n_shards + s
            for s in batch_shards
            for g in range(max_gen + 1)
        ]
        old_batch = old.filter(F.col("shard").isin(phys))
    else:
        old_batch = old
    changed = incoming.join(old_batch.select(*GATE), GATE, "left_anti").withColumn(
        "shard", stable_shard_col(n_shards)
    )
    if mode == "full":
        gone = old.join(incoming.select(*GATE), GATE, "left_anti")
    else:
        gone_keys = changed.select(*KEYS)
        if del_keys is not None:
            gone_keys = gone_keys.unionByName(del_keys)
        gone = old_batch.join(gone_keys, KEYS, "left_semi")
    gone = gone.persist(StorageLevel.DISK_ONLY)

    # tokenize ONLY the changed docs (the staleness gate); lineage under
    # incremental_tokenize proves the gate (doc_count == changed docs)
    sc = spark.sparkContext
    tok_acc = sc.accumulator({}, _LineageAccParam())

    def analyze_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        n = 0
        dl_sum = 0
        shas: list[str] = []
        cols = KEYS + ["lang", "content_sha256", "shard", "doc_len",
                       "terms", "tfs", "positions"]
        for pdf in batches:
            out = {c: [] for c in cols}
            for repo, path, commit, lang, content, shard in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"],
                pdf["content"], pdf["shard"],
            ):
                content = content or ""
                tfp = term_freqs_positions(content)
                terms = sorted(tfp)
                sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
                dl = sum(t[0] for t in tfp.values())
                n += 1
                dl_sum += dl
                shas.append(sha)
                out["repo"].append(repo)
                out["path"].append(path)
                out["commit"].append(commit)
                out["lang"].append(lang)
                out["content_sha256"].append(sha)
                out["shard"].append(int(shard))
                out["doc_len"].append(dl)
                out["terms"].append(terms)
                out["tfs"].append([tfp[t][0] for t in terms])
                out["positions"].append([p for t in terms for p in tfp[t][1]])
            yield pd.DataFrame(out, columns=cols)
        rollup = hashlib.sha256(",".join(sorted(shas)).encode()).hexdigest()
        tok_acc.add(
            {pid: {"partition_id": pid, "doc_count": n,
                   "posting_bytes": dl_sum, "sha256_rollup": rollup}}
        )

    an_schema = (
        "repo string, path string, commit string, lang string, "
        "content_sha256 string, shard int, doc_len int, "
        "terms array<string>, tfs array<int>, positions array<int>"
    )
    changed_an = (
        changed.select(*KEYS, "lang", "content", "shard")
        .mapInPandas(analyze_only, an_schema)
        .persist(StorageLevel.DISK_ONLY)
    )

    ch = changed_an.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("doc_len"), F.lit(0)).alias("dl")
    ).collect()[0]
    gn = gone.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("doc_len"), F.lit(0)).alias("dl")
    ).collect()[0]
    n_changed, dl_changed = int(ch["n"]), int(ch["dl"])
    n_gone, dl_gone = int(gn["n"]), int(gn["dl"])
    stage_secs["gate"] = round(time.time() - t0, 2)

    if n_changed == 0 and n_gone == 0:
        changed_an.unpersist()
        gone.unpersist()
        if all(_downstream_current(wh, t) for t in DOWNSTREAM_STAGES):
            return BuildInfo(
                int(man["n_docs"]), n_shards, STRIDE,
                stages_run=[],
                stages_skipped=["analyzed"] + DOWNSTREAM_STAGES,
                stage_secs={},
            )
        # downstream missing/stale: heal via the full-build resume path
        # (skips the committed analyzed, rebuilds only non-current stages)
        return build_index(spark, docs, wh, parallel=parallel, doc_id_mode="stable")

    wh.append_lineage_rows("incremental_tokenize", list(tok_acc.value.values()))

    def _to_segment() -> BuildInfo:
        from .segments import segment_tail

        return segment_tail(
            spark, wh, changed_an, gone,
            n_changed, dl_changed, n_gone, dl_gone,
            stage_secs, auto_compact_ratio, maintenance,
        )

    if segmented or strategy == "segment":
        # a segmented warehouse stays segmented (shard-swap would collide
        # with live segment rows); explicit "segment" skips the touched-
        # shard census entirely
        return _to_segment()

    touched = sorted(
        {int(r["shard"]) for r in changed_an.select("shard").distinct().collect()}
        | {int(r["shard"]) for r in gone.select("shard").distinct().collect()}
    )
    if strategy == "auto" and len(touched) >= SEG_AUTO_FRAC * n_shards:
        return _to_segment()
    n_docs_new = int(man["n_docs"]) - n_gone + n_changed
    sum_dl_new = int(man["sum_dl"]) - dl_gone + dl_changed
    new_build_id = uuid.uuid4().hex

    # ---- analyzed_delta: the touched shards' FULL new membership,
    # re-ranked locally (reused rows keep their committed terms verbatim).
    # Rank assignment is PURE JVM — row_number over (shard | KEYS order)
    # produces exactly the ids the from-scratch Python counter would
    # (same partition key, same sort key, unique keys), but the kept
    # rows' term/position arrays never round-trip through Python.  That
    # matters most under uniform churn (all shards touched): measured at
    # 200k docs, the old tokenize=False mapInPandas pass alone cost
    # 25.4 s; the window form leaves tokenization as the only Python in
    # the analyzed stage (tools/incremental_bench.py).
    t1 = time.time()
    old_t = old.filter(F.col("shard").isin([int(s) for s in touched]))
    if mode == "full":
        kept = old_t.join(incoming.select(*GATE), GATE, "left_semi")
    else:
        # anti-join on gone's keys (= replaced ∪ deleted): covers the
        # deletes batch too; brand-new keys aren't in old_t either way
        kept = old_t.join(gone.select(*KEYS), KEYS, "left_anti")
    no_id = ["repo", "path", "commit", "lang", "content_sha256", "shard",
             "doc_len", "terms", "tfs", "positions"]
    delta_rows = kept.select(*no_id).unionByName(changed_an.select(*no_id))
    from pyspark.sql import Observation
    from pyspark.sql.window import Window

    wnd = Window.partitionBy("shard").orderBy(*KEYS)
    rank_obs = Observation("delta_rank_guard")
    delta_analyzed = (
        delta_rows.withColumn("rank", F.row_number().over(wnd))
        .observe(rank_obs, F.max("rank").alias("max_rank"))
        .select(
            (F.col("shard").cast("long") * F.lit(STRIDE) + F.col("rank")).alias(
                "doc_id"
            ),
            *no_id,
        )
    )
    wh.write(
        delta_analyzed,
        "analyzed_delta",
        stage="analyzed",
        partition_by=["shard"],
        meta={
            "n_docs": n_docs_new,
            "sum_dl": sum_dl_new,
            "n_shards": n_shards,
            "shard_size": STRIDE,
            "doc_id_mode": "stable",
            "build_id": new_build_id,
            "touched_shards": [int(s) for s in touched],
        },
    )
    if int(rank_obs.get["max_rank"] or 0) >= STRIDE:
        # staged delta only — nothing journaled, committed tables intact
        raise OverflowError(
            f"a shard exceeds STRIDE={STRIDE} docs; rebuild with more shards"
        )
    wh.append_lineage_rows("analyzed", wh.footer_lineage_rows("analyzed_delta"))
    stage_secs["analyzed"] = round(time.time() - t1, 2)

    t1 = time.time()
    n_terms = _delta_term_stats(spark, wh, changed_an, gone, new_build_id)
    stage_secs["term_stats"] = round(time.time() - t1, 2)
    _write_corpus_next(wh, n_docs_new, sum_dl_new, n_terms, new_build_id)

    # ---- downstream deltas over the touched shards only
    delta_df = wh.read(spark, "analyzed_delta")
    t1 = time.time()
    _stage_doc_stats(spark, delta_df, wh, dst="doc_stats_delta")
    stage_secs["doc_stats"] = round(time.time() - t1, 2)
    t1 = time.time()
    _stage_postings(spark, wh, src="analyzed_delta", dst="postings_delta")
    stage_secs["postings"] = round(time.time() - t1, 2)
    t1 = time.time()
    _stage_doc_lens(spark, delta_df, wh, STRIDE, dst="doc_lens_delta")
    stage_secs["doc_lens"] = round(time.time() - t1, 2)
    changed_an.unpersist()
    gone.unpersist()

    # ---- single-journal swap
    now = time.time()
    swaps = []
    for table, delta in _DELTA_TABLES:
        droot = wh.path(delta)
        present = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(droot)
            if d.startswith("shard=")
        )
        swaps.append(
            {
                "table": table,
                "delta": delta,
                "moves": present,
                "deletes": sorted(set(touched) - set(present)),
            }
        )
    manifests: dict[str, dict] = {}
    am = dict(man)
    am.update(
        {
            "n_docs": n_docs_new,
            "sum_dl": sum_dl_new,
            "build_id": new_build_id,
            "committed_at": now,
        }
    )
    manifests["analyzed"] = am
    for t in ["doc_stats", "postings", "doc_lens"]:
        m = dict(wh.manifest(t))
        m.update({"analyzed_ref": new_build_id, "committed_at": now})
        if t == "postings":
            m["n_docs"] = n_docs_new
        manifests[t] = m
    for src, dst in [("term_stats_next", "term_stats"),
                     ("corpus_stats_next", "corpus_stats")]:
        m = dict(wh.manifest(src))
        m["table"] = dst
        manifests[dst] = m
    wh.begin_txn(
        {
            "swaps": swaps,
            "promotes": [["term_stats_next", "term_stats"],
                         ["corpus_stats_next", "corpus_stats"]],
            "manifests": manifests,
        }
    )
    wh.recover_txn()
    stage_secs["swap"] = round(time.time() - now, 2)

    return BuildInfo(
        n_docs_new,
        n_shards,
        STRIDE,
        stages_run=["analyzed"] + DOWNSTREAM_STAGES,
        stages_skipped=[],
        stage_secs=stage_secs,
    )


@locked("delete_docs", "wh")
def delete_docs(
    spark: SparkSession,
    keys: DataFrame,
    wh: str | Warehouse,
    strategy: str = "auto",
    auto_compact_ratio: float | None = None,
    maintenance: str = "compact",
) -> BuildInfo:
    """Remove documents by (repo, path, commit) key WITHOUT re-supplying
    any corpus content — the takedown/GDPR-style operation a 100 TB
    operator cannot express as a full-snapshot rebuild.

    Cost is O(deleted): the gate reads only the deleted keys' shard
    partitions (see the upsert-mode pruning in incremental_build_stable),
    nothing is tokenized, term_stats df is delta-decremented from the
    removed rows' term sets, and the downstream update is either a
    tombstone-only segment run (segmented / "auto" at scale) or a
    touched-shard rewrite.  Deleting keys not present in the index is a
    no-op.  Stable-id warehouses only — rank-mode doc_ids shift on any
    removal, so there the supported path is a mode="full" incremental
    with the reduced snapshot."""
    wh = wh if isinstance(wh, Warehouse) else Warehouse(wh)
    from .build import FORMAT_VERSION

    if not wh.is_committed("analyzed"):
        raise ValueError("delete_docs requires a committed index")
    man = wh.manifest("analyzed")
    if man.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"warehouse format_version={man.get('format_version')!r} != "
            f"{FORMAT_VERSION}; rebuild the index before deleting from it"
        )
    if man.get("doc_id_mode", "rank") != "stable":
        raise ValueError(
            "delete_docs requires a stable-id warehouse "
            "(build with doc_id_mode='stable'); rank-mode warehouses must "
            "re-run incremental_build(mode='full') with the reduced corpus"
        )
    empty_docs = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, content string"
    )
    return incremental_build_stable(
        spark, empty_docs, wh, mode="upsert", strategy=strategy,
        auto_compact_ratio=auto_compact_ratio, maintenance=maintenance,
        deletes=keys,
    )
