"""Similarity search: brute-force cosine vs numpy, IVF probe behavior,
near-duplicate pairs."""

import numpy as np
import pandas as pd
import pytest

from moogle_spark.simsearch import (
    brute_force_topk,
    centroid_scores,
    ivf_topk,
    label_centroids,
    near_duplicate_pairs,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    centers = {0: rng.normal(0, 1, 8), 1: rng.normal(4, 1, 8), 2: rng.normal(-4, 1, 8)}
    rows = []
    for i in range(90):
        lab = i % 3
        v = centers[lab] + rng.normal(0, 0.3, 8)
        rows.append((i, [float(x) for x in v], lab))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    return (
        spark.createDataFrame(pdf.to_dict("records"),
                              "vec_id long, embedding array<float>, label int"),
        pdf,
    )


def _np_cosine(pdf, q):
    m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    q = np.asarray(q, dtype=np.float64)
    return (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))


def test_brute_force_matches_numpy(spark, emb):
    sdf, pdf = emb
    q = [float(np.float32(x)) for x in pdf.iloc[0]["embedding"]]
    got = brute_force_topk(sdf, q, k=10).toPandas()
    # spark stores float32; mirror that in the reference
    m32 = pdf.copy()
    m32["embedding"] = m32["embedding"].map(lambda v: np.asarray(v, np.float32))
    cos = _np_cosine(m32, q)
    want = np.argsort(-np.round(cos, 6), kind="stable")[:10]
    assert list(got["vec_id"]) == [int(pdf.iloc[i]["vec_id"]) for i in want]
    np.testing.assert_allclose(got["cosine"], np.round(cos[want], 6), atol=2e-6)


def test_centroids_shape(spark, emb):
    sdf, _ = emb
    c = label_centroids(sdf).toPandas()
    assert len(c) == 3
    assert all(len(v) == 8 for v in c["centroid"])


def test_ivf_probes_best_cluster(spark, emb):
    sdf, pdf = emb
    q = [float(np.float32(x)) for x in pdf.iloc[3]["embedding"]]  # label 0 vector
    cs = centroid_scores(sdf, q).toPandas().sort_values("centroid_cosine")
    assert cs.iloc[-1]["label"] == 0
    got = ivf_topk(sdf, q, k=5, nprobe=1).toPandas()
    assert set(got["label"]) == {0}
    # with clear cluster structure IVF top-k == brute-force top-k
    brute = brute_force_topk(sdf, q, k=5).toPandas()
    assert list(got["vec_id"]) == list(brute["vec_id"])


def test_kmeans_ivf_recall_unlabeled(spark, emb):
    """Trained-k-means IVF (NO labels used anywhere) must place cluster
    siblings in shared cells: recall@10 vs brute force >= 0.9 for
    nprobe=2 of 6 cells on 3-cluster data, and the assignment must be
    label-free by construction (kmeans_assign only reads vec_id +
    embedding)."""
    from moogle_spark.simsearch import (
        brute_force_topk,
        ivf_topk_kmeans,
        kmeans_assign,
        kmeans_centroids,
    )

    sdf, pdf = emb
    cent = kmeans_centroids(sdf, k=6, iters=3)
    c = cent.toPandas()
    assert 1 <= len(c) <= 6 and all(len(v) == 8 for v in c["centroid"])
    # every vector assigned to exactly one cell
    a = kmeans_assign(sdf, cent).toPandas()
    assert len(a) == len(pdf) and a["vec_id"].is_unique
    recalls = []
    for qi in [3, 10, 25]:
        q = [float(np.float32(x)) for x in pdf.iloc[qi]["embedding"]]
        brute = set(brute_force_topk(sdf, q, k=10).toPandas()["vec_id"])
        ivf = set(
            ivf_topk_kmeans(sdf, q, k=10, n_cells=6, iters=3, nprobe=2).toPandas()[
                "vec_id"
            ]
        )
        recalls.append(len(ivf & brute) / len(brute))
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"k-means IVF recall@10 {mean_recall:.3f} < 0.9"


def test_kmeans_deterministic(spark, emb):
    """Same input -> identical centroids across runs (seeded md5 init +
    rounded math): required for the cross-engine oracle to hash-match."""
    from moogle_spark.simsearch import kmeans_centroids

    sdf, _ = emb
    c1 = kmeans_centroids(sdf, k=4, iters=2).toPandas().sort_values("cell")
    c2 = kmeans_centroids(sdf, k=4, iters=2).toPandas().sort_values("cell")
    assert list(c1["cell"]) == list(c2["cell"])
    for v1, v2 in zip(c1["centroid"], c2["centroid"]):
        assert list(v1) == list(v2)


def test_near_duplicate_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = near_duplicate_pairs(sdf, threshold=0.99).toPandas()
    assert list(zip(got["id_a"], got["id_b"])) == [(1, 2)]


def test_hyperplane_lsh_near_dup_recall(spark):
    """The banded hyperplane plan must recover (nearly) all planted
    near-duplicates found by the exact all-pairs form, and never report a
    pair below threshold (precision 1 by construction: candidates are
    verified with the exact cosine)."""
    from moogle_spark.simsearch import near_duplicate_pairs_lsh

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        v = rng.normal(0, 1, 16)
        rows.append((i, [float(x) for x in v], 0))
        if i < 20:  # planted near-dup: tiny perturbation
            w = v + rng.normal(0, 0.02, 16)
            rows.append((1000 + i, [float(x) for x in w], 0))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    df = spark.createDataFrame(
        pdf.to_dict("records"), "vec_id long, embedding array<float>, label int"
    )
    exact = near_duplicate_pairs(df, threshold=0.98).toPandas()
    lsh = near_duplicate_pairs_lsh(df, threshold=0.98, num_bits=32, bands=4).toPandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert lsh_pairs <= exact_pairs  # exact verification -> no false positives
    assert len(exact_pairs) >= 20
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"LSH recall {recall:.3f} below 0.9"


def test_ivf_indexed_partition_pruning(spark, emb, tmp_path):
    """The materialized IVF index must (a) return the same top-k as the
    in-memory k-means IVF path, and (b) scan ONLY the probed cells —
    the cell predicate must reach PartitionFilters (scan cost O(probed
    cells) at any scale)."""
    from moogle_spark.simsearch import ivf_index_write, ivf_search_indexed, ivf_topk_kmeans

    sdf, pdf = emb
    path = str(tmp_path / "ivf")
    ivf_index_write(sdf, path, n_cells=6, iters=3)
    q = [float(np.float32(x)) for x in pdf.iloc[3]["embedding"]]
    got = ivf_search_indexed(spark, path, q, k=5, nprobe=2)
    want = ivf_topk_kmeans(sdf, q, k=5, n_cells=6, iters=3, nprobe=2).toPandas()
    got_pd = got.toPandas()
    assert list(got_pd["vec_id"]) == list(want["vec_id"])
    assert list(got_pd["cosine"]) == list(want["cosine"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # the probe scan actually touches only the 2 probed cells' files
    # (inputFiles() ignores partition filters, so count the files rows
    # were really read from)
    from pyspark.sql import functions as F

    vecs = spark.read.parquet(path + "/vectors")
    full_n = vecs.select(F.input_file_name()).distinct().count()
    pruned_n = (
        ivf_search_indexed(spark, path, q, k=10**6, nprobe=2)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert pruned_n < full_n, f"scanned {pruned_n} of {full_n} files"


def test_ivf_index_append_without_retrain(spark, emb, tmp_path):
    """Incremental ANN (VERDICT round-3 item 8): appending assigns new
    vectors to the STORED centroids and appends cell partitions only —
    `_centroids` is byte-stable, search finds the new vector, and recall
    vs brute force over the grown corpus holds."""
    import numpy as np

    from moogle_spark.simsearch import (
        brute_force_topk,
        ivf_index_append,
        ivf_index_write,
        ivf_search_indexed,
    )

    df, pdf = emb
    path = str(tmp_path / "ivf")
    ivf_index_write(df, path, n_cells=3, iters=2)
    cent_path = f"{path}/_centroids"
    before = sorted(
        (int(r["cell"]), tuple(float(x) for x in r["centroid"]))
        for r in spark.read.parquet(cent_path).collect()
    )

    # a new vector near cluster-1's center, plus one near cluster 2
    base1 = np.asarray(pdf[pdf["label"] == 1].iloc[0]["embedding"], dtype=np.float64)
    base2 = np.asarray(pdf[pdf["label"] == 2].iloc[0]["embedding"], dtype=np.float64)
    # alternating-sign perturbation changes DIRECTION (a uniform +eps
    # barely does): cosine(v, base) rounds below 1.0, so the appended
    # vector is strictly its own nearest neighbor, no 6-decimal tie
    delta = np.asarray([0.3 if i % 2 == 0 else -0.3 for i in range(len(base1))])
    v1 = [float(x) for x in base1 + delta]
    v2 = [float(x) for x in base2 - delta]
    new_df = spark.createDataFrame(
        [(1000, v1, 1), (1001, v2, 2)],
        "vec_id long, embedding array<float>, label int",
    )
    stats = ivf_index_append(spark, new_df, path)
    assert stats["n_appended"] == 2
    assert stats["max_dist"] >= stats["mean_dist"] >= 0.0

    after = sorted(
        (int(r["cell"]), tuple(float(x) for x in r["centroid"]))
        for r in spark.read.parquet(cent_path).collect()
    )
    assert after == before  # no retrain

    # the appended vector is its own nearest neighbor through the index
    res = ivf_search_indexed(spark, path, v1, k=3, nprobe=1).toPandas()
    assert int(res.iloc[0]["vec_id"]) == 1000

    # recall spot-check vs brute force over the GROWN corpus
    grown = df.unionByName(new_df)
    exact = set(
        int(r["vec_id"]) for r in brute_force_topk(grown, v2, k=5).collect()
    )
    approx = set(
        int(r["vec_id"])
        for r in ivf_search_indexed(spark, path, v2, k=5, nprobe=2).collect()
    )
    assert len(exact & approx) / 5 >= 0.8


def test_ivf_drift_triggered_retrain(spark, tmp_path):
    """Drift maintenance (round-4 verdict item 2): appends from a region
    the stored quantizer never saw degrade nprobe=1 recall; with
    maintenance="retrain" the batch-mean-vs-baseline ratio trips, the
    quantizer re-fits over the full stored corpus into a new generation
    committed by an atomic meta replace, and recall recovers."""
    import shutil as _sh

    from moogle_spark.simsearch import (
        _ivf_meta,
        brute_force_topk,
        ivf_index_append,
        ivf_index_write,
        ivf_search_indexed,
    )

    def mk(center, n, start_id, amp=0.5):
        rows = []
        for i in range(n):
            v = list(center)
            for d in range(4):
                v[d] = float(v[d] + amp * (((start_id + i) * 31 + d * 7) % 11 - 5) / 5.0)
            rows.append((start_id + i, [float(x) for x in v], 0))
        return rows

    schema = "vec_id long, embedding array<float>, label int"
    base = spark.createDataFrame(
        mk([10.0, 0, 0, 0], 20, 0) + mk([0, 10.0, 0, 0], 20, 100), schema
    )
    # drifted cluster C at (0,0,10,0), jittered on dims 0/1 so its points
    # straddle the A/B centroid bisector — the stored quantizer SPLITS C
    # across two cells, so an nprobe=1 query near C can only see half
    crows = []
    for i in range(20):
        a = 1.0 if i % 2 == 0 else -1.0
        crows.append(
            (200 + i, [float(0.8 * a * (1 + (i % 5) / 10)), float(-0.8 * a), 10.0, 0.0], 0)
        )
    cdf = spark.createDataFrame(crows, schema)

    p_plain = str(tmp_path / "ivf_plain")
    p_maint = str(tmp_path / "ivf_maint")
    ivf_index_write(base, p_plain, n_cells=3, iters=3)
    _sh.copytree(p_plain, p_maint)

    q = [0.0, 0.0, 10.0, 0.0]
    exact = {int(r["vec_id"]) for r in brute_force_topk(base.unionByName(cdf), q, k=10).collect()}

    # unmaintained: drift reported but not acted on; recall degrades
    s_plain = ivf_index_append(spark, cdf, p_plain)
    assert s_plain["retrained"] is False
    assert s_plain["mean_dist"] > 10 * s_plain["baseline_mean_dist"]
    got_plain = {
        int(r["vec_id"])
        for r in ivf_search_indexed(spark, p_plain, q, k=10, nprobe=1).collect()
    }
    assert len(exact & got_plain) / 10 < 0.9  # the tripwire-less failure mode

    # maintained: policy fires, generation bumps atomically, recall recovers
    s_maint = ivf_index_append(spark, cdf, p_maint, maintenance="retrain", drift_ratio=1.5)
    assert s_maint["retrained"] is True
    assert s_maint["version"] == 1
    meta = _ivf_meta(p_maint)
    assert meta["dir"] == "gen-1" and meta["version"] == 1
    assert meta["train_mean_dist"] < s_maint["mean_dist"] / 10  # re-fit is tight again
    got_maint = {
        int(r["vec_id"])
        for r in ivf_search_indexed(spark, p_maint, q, k=10, nprobe=1).collect()
    }
    assert len(exact & got_maint) / 10 >= 0.9
    # the just-superseded generation is KEPT one cycle as read grace for
    # lock-free in-flight probes (meta.prev_dir), swept on the NEXT retrain
    import os as _os

    assert meta["prev_dir"] == ""
    assert _os.path.exists(_os.path.join(p_maint, "vectors"))
    assert _os.path.exists(_os.path.join(p_maint, "_centroids"))
    # second drifted region -> second retrain: gen-2 current, gen-1 grace,
    # the original root generation (two commits old) finally swept
    d2 = spark.createDataFrame(
        [(300 + i, [0.0, 0.0, 0.0, float(10 + (i % 3))], 0) for i in range(12)],
        schema,
    )
    s2 = ivf_index_append(spark, d2, p_maint, maintenance="retrain", drift_ratio=1.5)
    assert s2["retrained"] is True and s2["version"] == 2
    meta2 = _ivf_meta(p_maint)
    assert meta2["dir"] == "gen-2" and meta2["prev_dir"] == "gen-1"
    assert _os.path.exists(_os.path.join(p_maint, "gen-1"))
    assert not _os.path.exists(_os.path.join(p_maint, "vectors"))
    assert not _os.path.exists(_os.path.join(p_maint, "_centroids"))


def test_ivf_maintenance_no_false_trigger_and_lock(spark, tmp_path):
    """An in-distribution append under maintenance="retrain" must NOT
    retrain (centroids byte-stable, version 0); the append takes the
    index writer lock, so a concurrently-held lock fails fast."""
    import json as _json
    import os as _os
    import socket as _socket
    import time as _time

    from moogle_spark.simsearch import _ivf_meta, ivf_index_append, ivf_index_write
    from moogle_spark.tables import LOCKFILE, WarehouseLockedError

    schema = "vec_id long, embedding array<float>, label int"
    base = spark.createDataFrame(
        [(i, [float(10 + (i % 7) / 10.0), float((i % 5) / 10.0), 0.0, 0.0], 0) for i in range(30)],
        schema,
    )
    path = str(tmp_path / "ivf")
    ivf_index_write(base, path, n_cells=2, iters=2)
    before = sorted(
        (int(r["cell"]), tuple(float(x) for x in r["centroid"]))
        for r in spark.read.parquet(f"{path}/_centroids").collect()
    )
    indist = spark.createDataFrame(
        [(1000 + i, [float(10 + (i % 7) / 10.0), float((i % 5) / 10.0), 0.0, 0.0], 0) for i in range(5)],
        schema,
    )
    s = ivf_index_append(spark, indist, path, maintenance="retrain", drift_ratio=1.5)
    assert s["retrained"] is False and s["version"] == 0
    after = sorted(
        (int(r["cell"]), tuple(float(x) for x in r["centroid"]))
        for r in spark.read.parquet(f"{path}/_centroids").collect()
    )
    assert after == before
    assert _ivf_meta(path)["version"] == 0

    # writer lock: a foreign live holder excludes the append
    with open(_os.path.join(path, LOCKFILE), "w") as f:
        _json.dump(
            {"pid": _os.getpid(), "host": _socket.gethostname(), "op": "x", "ts": _time.time()},
            f,
        )
    with pytest.raises(WarehouseLockedError):
        ivf_index_append(spark, indist, path)
