"""Warehouse writer lock (tables.warehouse_lock): single-writer mutual
exclusion for maintenance ops.  The commit protocol makes each op
kill-safe, not concurrent-safe — two interleaved builds would mix
staging drops and _TXN journals — so every mutating entry point takes
an O_EXCL ``_LOCK.json`` and queries take nothing."""

import json
import os
import socket
import subprocess
import time

import pytest

from moogle_spark.tables import (
    LOCKFILE,
    WarehouseLockedError,
    warehouse_lock,
)


def _write_holder(root, **over):
    os.makedirs(root, exist_ok=True)
    holder = {
        "pid": os.getpid(), "host": socket.gethostname(),
        "op": "test", "ts": time.time(), **over,
    }
    with open(os.path.join(root, LOCKFILE), "w") as f:
        json.dump(holder, f)


def test_lock_excludes_live_holder(tmp_path):
    root = str(tmp_path / "wh")
    _write_holder(root)  # our own pid, but NOT via warehouse_lock: foreign
    with pytest.raises(WarehouseLockedError, match="locked by"):
        with warehouse_lock(root, "op"):
            pass
    # the foreign holder's file must survive the failed acquisition
    assert os.path.exists(os.path.join(root, LOCKFILE))


def test_lock_reclaims_dead_pid(tmp_path):
    root = str(tmp_path / "wh")
    p = subprocess.Popen(["true"])
    p.wait()
    _write_holder(root, pid=p.pid)
    with warehouse_lock(root, "op"):
        holder = json.load(open(os.path.join(root, LOCKFILE)))
        assert holder["pid"] == os.getpid()
    assert not os.path.exists(os.path.join(root, LOCKFILE))


def test_lock_reclaims_stale_cross_host(tmp_path):
    root = str(tmp_path / "wh")
    _write_holder(root, host="elsewhere", ts=time.time() - 7 * 3600)
    with warehouse_lock(root, "op", stale_after=6 * 3600):
        pass
    # a FRESH cross-host holder is honored (pid liveness unobservable)
    _write_holder(root, host="elsewhere")
    with pytest.raises(WarehouseLockedError):
        with warehouse_lock(root, "op", stale_after=6 * 3600):
            pass


def test_lock_never_breaks_alive_holder_on_age(tmp_path):
    """The stale_after fallback applies only when pid liveness is
    unobservable: a same-host holder whose pid is ALIVE keeps its lock
    no matter how old the timestamp (a >6h build is legitimate)."""
    root = str(tmp_path / "wh")
    _write_holder(root, ts=time.time() - 48 * 3600)  # our pid: alive
    with pytest.raises(WarehouseLockedError):
        with warehouse_lock(root, "op", stale_after=6 * 3600):
            pass


def test_lock_excludes_second_thread(tmp_path):
    """Re-entrancy is same-call-stack only: another thread of the same
    process contends on the file and fails fast."""
    import threading

    root = str(tmp_path / "wh")
    errs = []

    def contender():
        try:
            with warehouse_lock(root, "op"):
                errs.append("acquired")
        except WarehouseLockedError:
            errs.append("locked")

    with warehouse_lock(root, "outer"):
        t = threading.Thread(target=contender)
        t.start()
        t.join()
    assert errs == ["locked"]
    # and once released, a new thread can acquire
    t2 = threading.Thread(target=contender)
    t2.start()
    t2.join()
    assert errs == ["locked", "acquired"]


def test_lock_reentrant_and_released_on_error(tmp_path):
    root = str(tmp_path / "wh")
    lockfile = os.path.join(root, LOCKFILE)
    with warehouse_lock(root, "outer"):
        assert os.path.exists(lockfile)
        with warehouse_lock(root, "inner"):  # delete_docs -> incremental
            pass
        assert os.path.exists(lockfile)  # inner exit keeps the outer lock
    assert not os.path.exists(lockfile)
    with pytest.raises(RuntimeError, match="boom"):
        with warehouse_lock(root, "op"):
            raise RuntimeError("boom")
    assert not os.path.exists(lockfile)


def test_expire_takes_the_lock(tmp_path):
    from moogle_spark.tables import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(root)
    _write_holder(root)
    with pytest.raises(WarehouseLockedError):
        wh.expire_stale_staging()


def test_build_entry_points_take_the_lock(spark, tmp_path):
    from moogle_spark.build import build_index, incremental_build
    from moogle_spark.corpus import generate_docs

    root = str(tmp_path / "wh")
    docs = generate_docs(spark, 30)
    _write_holder(root)
    with pytest.raises(WarehouseLockedError):
        build_index(spark, docs, root, n_shards=4)
    with pytest.raises(WarehouseLockedError):
        incremental_build(spark, docs, root)
    os.unlink(os.path.join(root, LOCKFILE))
    build_index(spark, docs, root, n_shards=4, doc_id_mode="stable")
    assert not os.path.exists(os.path.join(root, LOCKFILE))
    # nested chain: upsert -> stable -> segment tail, all under one lock
    from pyspark.sql import functions as F

    churn = docs.limit(5).withColumn(
        "content", F.concat(F.col("content"), F.lit(" locktok"))
    )
    incremental_build(spark, churn, root, mode="upsert", strategy="segment")
    assert not os.path.exists(os.path.join(root, LOCKFILE))


def test_lock_release_is_ownership_checked(tmp_path):
    """Release verifies the lock file still carries OUR payload: if a
    peer legitimately reclaimed the lock mid-op (op ran past
    stale_after), exit must NOT delete the new holder's file — that
    would admit a third writer."""
    root = str(tmp_path / "wh")
    lockfile = os.path.join(root, LOCKFILE)
    with pytest.warns(RuntimeWarning, match="reclaimed by another writer"):
        with warehouse_lock(root, "slow-op"):
            # simulate a cross-host peer reclaiming + re-acquiring
            _write_holder(root, host="elsewhere", pid=12345)
    stolen = json.load(open(lockfile))
    assert stolen["host"] == "elsewhere"  # new holder's file survived
    os.unlink(lockfile)
    # normal case: own release still removes the file silently
    with warehouse_lock(root, "op"):
        pass
    assert not os.path.exists(lockfile)


def test_reader_replay_waits_out_live_writer_journal(tmp_path):
    """Readers (Warehouse.__init__, SearchEngine.refresh) replay crash
    journals only under the lock.  A journal whose writer still holds
    the lock alive is in-flight: the reader polls (the writer's own
    replay clears it in sub-seconds), and a holder that never clears is
    surfaced as a wedged-commit error rather than silently serving a
    half-swapped warehouse."""
    import threading

    from moogle_spark.tables import Warehouse

    root = str(tmp_path / "wh")
    wh = Warehouse(root)
    txn = os.path.join(root, "_TXN.json")
    with open(txn, "w") as f:
        json.dump({"swaps": [], "promotes": [], "manifests": {}}, f)
    _write_holder(root)  # live holder (our pid, foreign acquisition)
    # wedged holder: journal + live lock that never clears -> loud error
    with pytest.raises(RuntimeError, match="wedged"):
        wh.recover_orphaned_txn(wait_s=0.6)
    assert os.path.exists(txn)  # never replayed lock-free
    # healthy holder: finishes its replay (journal vanishes) mid-poll;
    # the reader then proceeds without ever taking the journal itself
    t = threading.Timer(0.4, os.unlink, args=(txn,))
    t.start()
    assert wh.recover_orphaned_txn(wait_s=5.0) is False
    t.join()
    # orphaned journal (lock gone): reader acquires and replays
    with open(txn, "w") as f:
        json.dump({"swaps": [], "promotes": [], "manifests": {}}, f)
    os.unlink(os.path.join(root, LOCKFILE))
    assert wh.recover_orphaned_txn() is True
    assert not os.path.exists(txn)
    assert not os.path.exists(os.path.join(root, LOCKFILE))  # lock released


def test_streaming_batch_fn_retries_lock(spark, tmp_path):
    """A transiently-held writer lock delays a streaming micro-batch
    instead of aborting the streaming query; a persistently-held lock
    still raises after bounded retries."""
    import threading

    from moogle_spark.corpus import generate_docs
    from moogle_spark.streaming import staleness_gated_batch_fn

    root = str(tmp_path / "wh")
    docs = generate_docs(spark, 20)
    _write_holder(root)
    fn = staleness_gated_batch_fn(root, n_shards=2, lock_retries=1, lock_backoff_s=0.05)
    with pytest.raises(WarehouseLockedError):
        fn(docs, 0)
    # transient: lock vanishes while the batch fn is backing off
    t = threading.Timer(0.3, os.unlink, args=(os.path.join(root, LOCKFILE),))
    t.start()
    fn2 = staleness_gated_batch_fn(root, n_shards=2, lock_retries=6, lock_backoff_s=0.2)
    fn2(docs, 0)  # must succeed once the lock clears
    t.join()
    from moogle_spark.tables import Warehouse

    assert Warehouse(root).is_committed("postings")
