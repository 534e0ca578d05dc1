"""Stable-doc_id mode (stable.py): shard-scoped O(churn) incremental.

The reference's staleness gate (services/indexer/main.py:140-143) skips
ALL work for an unchanged doc.  Rank mode can only gate the tokenizer;
stable mode pins docs to hash-chosen shards so churn perturbs only its
own shards — these tests prove:
  * full stable build == rank build at the search-result level,
  * incremental stable build == from-scratch stable build at the
    LOGICAL postings level (block runs may differ; decoded postings,
    analyzed rows, term_stats, doc_stats, doc_lens, corpus scalars are
    identical),
  * untouched shards' files are NOT rewritten (byte-identical on disk),
  * the tokenizer gate holds (incremental_tokenize lineage == churn),
  * the _TXN partition-swap journal is recoverable and idempotent.
"""

import hashlib
import os

from pyspark.sql import functions as F

N_DOCS = 400
N_SHARDS = 64


def _docs_v1(spark):
    from moogle_spark.corpus import generate_docs

    return generate_docs(spark, N_DOCS)


def _docs_v2(spark):
    """~10% content churn + 20 removals + 20 new keys, all deterministic."""
    base = _docs_v1(spark)
    changed_mask = F.pmod(F.xxhash64("path"), F.lit(10)) == 0
    removed_mask = F.pmod(F.xxhash64("path"), F.lit(10)) == 1
    v2 = (
        base.filter(~removed_mask)
        .withColumn(
            "content",
            F.when(
                changed_mask,
                F.concat(F.col("content"), F.lit(" freshchurntoken")),
            ).otherwise(F.col("content")),
        )
    )
    new = (
        base.orderBy("path").limit(20)
        .withColumn("path", F.concat(F.col("path"), F.lit(".newdoc")))
        .withColumn("content", F.concat(F.lit("brandnew zephyr "), F.col("content")))
    )
    return v2.unionByName(new)


def _decoded_postings_fp(spark, wh_path: str) -> str:
    """Logical postings fingerprint: decode every block and hash the
    sorted (shard, term, doc_id, tf, dl, positions) posting set.  Block
    RUN structure (which depends on scan splits) does not affect it."""
    from moogle_spark import codec
    from moogle_spark.tables import Warehouse

    rows = Warehouse(wh_path).read(spark, "postings").collect()
    postings = []
    for r in rows:
        n = int(r["n_docs"])
        ids = codec.decode_doc_ids(r["doc_ids"], n)
        tfs = codec.decode_tfs(r["tfs"], n)
        dls = codec.varint_decode(r["dls"], n)
        flat = codec.decode_positions_flat(r["positions"], tfs, int(r["pos_ints"]))
        off = 0
        for i in range(n):
            tf = int(tfs[i])
            postings.append(
                (
                    int(r["shard"]), r["term"], int(ids[i]), tf, int(dls[i]),
                    tuple(int(p) for p in flat[off:off + tf]),
                )
            )
            off += tf
    postings.sort()
    h = hashlib.sha256()
    for p in postings:
        h.update(repr(p).encode())
    return h.hexdigest()


def _table_rows_fp(spark, wh_path: str, name: str) -> str:
    from moogle_spark.tables import Warehouse

    df = Warehouse(wh_path).read(spark, name)
    rows = df.select(*sorted(df.columns)).collect()

    def norm(v):
        if isinstance(v, dict):
            return tuple(sorted(v.items()))
        if isinstance(v, list):
            return tuple(v)
        return v

    recs = sorted(tuple(norm(v) for v in r) for r in rows)
    h = hashlib.sha256()
    for rec in recs:
        h.update(repr(rec).encode())
    return h.hexdigest()


def _snapshot_files(root: str) -> dict[str, tuple]:
    out = {}
    for dirpath, _dn, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_mtime_ns, st.st_size)
    return out


def test_stable_build_matches_rank_build_results(spark, tmp_path):
    from moogle_spark.build import build_index
    from moogle_spark.query import SearchEngine

    docs = _docs_v1(spark)
    wh_rank = str(tmp_path / "rank")
    wh_stab = str(tmp_path / "stable")
    build_index(spark, docs, wh_rank)
    info = build_index(spark, docs, wh_stab, n_shards=N_SHARDS, doc_id_mode="stable")
    assert info.n_docs == N_DOCS

    er = SearchEngine(spark, wh_rank, cache=False)
    es = SearchEngine(spark, wh_stab, cache=False)
    # k >= corpus: the full match set must agree (doc_id spaces differ,
    # so compare on (repo, path, score, match_count) sets)
    for q in ["hotterm0 hotterm1", "def return import", "uniqdoc7x"]:
        rr = {
            (r["repo"], r["path"], round(r["score"], 9), r["match_count"])
            for r in er.search(q, k=N_DOCS, enrich=True).collect()
        }
        rs = {
            (r["repo"], r["path"], round(r["score"], 9), r["match_count"])
            for r in es.search(q, k=N_DOCS, enrich=True).collect()
        }
        assert rr == rs and rr


def test_stable_incremental_equals_scratch_and_is_shard_scoped(spark, tmp_path):
    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.tables import Warehouse

    docs_v1, docs_v2 = _docs_v1(spark), _docs_v2(spark)
    wh_inc = str(tmp_path / "inc")
    build_index(spark, docs_v1, wh_inc, n_shards=N_SHARDS, doc_id_mode="stable")

    # expected churn + touched shards, computed independently
    changed = docs_v2.join(
        docs_v1.withColumn(
            "content_sha256",
            F.sha2(F.encode(F.col("content"), "utf-8"), 256),
        ).select(
            "repo", "path", "commit", "lang", "content_sha256"
        ),
        ["repo", "path", "commit", "lang"],
        "left",
    ).filter(
        F.col("content_sha256").isNull()
        | (F.col("content_sha256") != F.sha2(F.encode(F.col("content"), "utf-8"), 256))
    )
    removed = docs_v1.join(
        docs_v2.select("repo", "path", "commit"), ["repo", "path", "commit"], "left_anti"
    )
    n_changed = changed.count()
    assert 30 <= n_changed <= 90  # ~10% content churn + 20 new docs
    shard_of = F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(N_SHARDS))
    touched = {
        int(r[0])
        for r in changed.select(shard_of).collect()
        + removed.select(shard_of).collect()
    }
    assert len(touched) < N_SHARDS  # some shards must remain untouched

    before = {
        t: _snapshot_files(os.path.join(wh_inc, t))
        for t in ["analyzed", "postings", "doc_stats", "doc_lens"]
    }

    lin0 = (
        Warehouse(wh_inc).lineage(spark)
        .filter(F.col("stage") == "incremental_tokenize").count()
    )
    info = incremental_build(spark, docs_v2, wh_inc)  # dispatches to stable path
    assert "analyzed" in info.stages_run

    # THE GATE: only changed/new docs ran the analyzer
    lin = (
        Warehouse(wh_inc).lineage(spark)
        .filter(F.col("stage") == "incremental_tokenize")
        .orderBy("committed_at")
        .collect()
    )
    assert sum(int(r["doc_count"]) for r in lin[lin0:]) == n_changed

    # SHARD SCOPE: untouched shards' files byte-untouched on disk
    after = {
        t: _snapshot_files(os.path.join(wh_inc, t))
        for t in ["analyzed", "postings", "doc_stats", "doc_lens"]
    }
    for t, snap in before.items():
        for rel, sig in snap.items():
            if rel.startswith("shard="):
                sh = int(rel.split("/", 1)[0].split("=", 1)[1])
                if sh not in touched:
                    assert after[t].get(rel) == sig, f"{t}/{rel} was rewritten"

    # EQUIVALENCE: logical content identical to a from-scratch stable build
    wh_scr = str(tmp_path / "scratch")
    build_index(spark, docs_v2, wh_scr, n_shards=N_SHARDS, doc_id_mode="stable")
    assert _decoded_postings_fp(spark, wh_inc) == _decoded_postings_fp(spark, wh_scr)
    for t in ["analyzed", "doc_stats", "doc_lens", "term_stats", "corpus_stats"]:
        assert _table_rows_fp(spark, wh_inc, t) == _table_rows_fp(spark, wh_scr, t), t


def test_stable_incremental_noop(spark, tmp_path):
    from moogle_spark.build import build_index, incremental_build

    docs = _docs_v1(spark)
    wh = str(tmp_path / "wh")
    build_index(spark, docs, wh, n_shards=N_SHARDS, doc_id_mode="stable")
    info = incremental_build(spark, docs, wh)
    assert info.stages_run == []
    assert "analyzed" in info.stages_skipped and "postings" in info.stages_skipped


def test_txn_journal_recovery_is_idempotent(spark, tmp_path, monkeypatch):
    """Kill right after begin_txn: the journal exists, nothing moved.  Any
    later Warehouse() construction must finish the swap; replaying again
    is a no-op; results equal a from-scratch build."""
    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.tables import Warehouse

    docs_v1, docs_v2 = _docs_v1(spark), _docs_v2(spark)
    wh_path = str(tmp_path / "wh")
    build_index(spark, docs_v1, wh_path, n_shards=N_SHARDS, doc_id_mode="stable")

    # simulate the crash: the swap's recover_txn call does nothing, so the
    # journal stays pending with all deltas staged (recover also guards
    # the entry points, so disable it for the whole call)
    monkeypatch.setattr(Warehouse, "recover_txn", lambda self: False)
    incremental_build(spark, docs_v2, wh_path)
    monkeypatch.undo()

    assert os.path.exists(os.path.join(wh_path, "_TXN.json"))
    # partially apply by hand (crash mid-replay), then heal via __init__
    import json

    with open(os.path.join(wh_path, "_TXN.json")) as f:
        plan = json.load(f)
    s0 = plan["swaps"][0]
    moves = s0.get("moves", [])
    if moves:
        sh = moves[0]
        src = os.path.join(wh_path, s0["delta"], f"shard={sh}")
        dst = os.path.join(wh_path, s0["table"], f"shard={sh}")
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
        os.rename(src, dst)

    Warehouse(wh_path)  # __init__ replays the journal to completion
    assert not os.path.exists(os.path.join(wh_path, "_TXN.json"))
    assert Warehouse(wh_path).recover_txn() is False  # idempotent no-op

    wh_scr = str(tmp_path / "scratch")
    build_index(spark, docs_v2, wh_scr, n_shards=N_SHARDS, doc_id_mode="stable")
    assert _decoded_postings_fp(spark, wh_path) == _decoded_postings_fp(spark, wh_scr)
    for t in ["analyzed", "term_stats", "corpus_stats"]:
        assert _table_rows_fp(spark, wh_path, t) == _table_rows_fp(spark, wh_scr, t), t
