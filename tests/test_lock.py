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
