"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k (the exactness baseline) and an IVF-style
coarse-quantized variant (the scale path).

All math is double-precision inside built-in higher-order functions
(`zip_with` + `aggregate` — JVM-side, no Python), so the plans stay in
WholeStageCodegen and the DuckDB oracle can mirror them.

Scale design: brute force is O(n·d) per query — fine fanned out over
partitions for one-off queries, wrong for query batches.  IVF assigns
every vector to its nearest coarse centroid (here: the per-label mean,
standing in for k-means cells; swap in trained centroids at scale),
probes only the best cell(s), and broadcast-joins the tiny centroid table
— the probe scan prunes to one cell's partition.  An LSH alternative
(random-hyperplane signs) bucket-joins like dedup.minhash_lsh_pairs.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _carry_cols(df: DataFrame, id_col: str) -> list:
    """id column plus 'label' when the frame has one — the similarity
    operators must not require labels (unlabeled corpora are the primary
    ANN use case); label is carried through only as a convenience."""
    cols = [F.col(id_col)]
    if "label" in df.columns:
        cols.append(F.col("label"))
    return cols


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.  The query is a
    broadcast literal column; the scan is a single pass, partial top-k per
    partition then a k-row merge (TakeOrderedAndProject)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            *_carry_cols(embeddings, id_col),
            F.round(cosine_col(F.col("embedding"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Coarse cells: per-label elementwise mean vector, via posexplode ->
    groupBy(label, dim) avg -> re-assemble sorted by dim.  One shuffle of
    (label, dim) keys — n_labels·d rows, tiny."""
    dims = embeddings.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m")),
                    lambda a, b: F.when(a["dim"] < b["dim"], -1)
                    .when(a["dim"] > b["dim"], 1)
                    .otherwise(0),
                ),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def _round6(arr: Column) -> Column:
    return F.transform(arr, lambda x: F.round(x.cast("double"), 6))


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means -> (cell, centroid array<double>): the
    REAL coarse quantizer for IVF (replaces the earlier per-label-mean
    stand-in, which leaned on labels an unlabeled corpus doesn't have).

    Deterministic and SQL-mirrorable end to end:
      * init — the k vectors ranked first by md5(vec_id) (a seeded
        pseudo-random sample; TakeOrdered limit-k, no global sort), cell
        ids 0..k-1 in that rank order;
      * assign — broadcast the k-row centroid table, per-vector argmin of
        squared L2 distance; distances are rounded to 6 decimals before
        the argmin and ties break on cell id, so Spark and the SQL twin
        pick identical cells despite sum-order float jitter;
      * update — per-(cell, dim) mean via posexplode + groupBy, rounded
        to 6 decimals, reassembled sorted by dim.
    Each iteration is one broadcast join + one (cell, dim)-key shuffle —
    linear in corpus size, no all-pairs anything.  Empty cells drop out
    (standard Lloyd).  At 100 TB you would fit on a sample and hold k
    constant; the per-iteration plan is unchanged."""
    h = F.md5(F.col(id_col).cast("string")).alias("h")
    seeds = (
        embeddings.select(F.col(id_col), F.col(emb_col), h)
        .orderBy("h", id_col)
        .limit(k)
    )
    w = Window.orderBy("h", id_col)  # k rows only — tiny window
    cent = seeds.withColumn("cell", F.row_number().over(w) - 1).select(
        "cell", _round6(F.col(emb_col)).alias("centroid")
    )
    for _ in range(iters):
        assign = kmeans_assign(embeddings, cent, id_col, emb_col)
        dims = embeddings.join(assign, id_col).select(
            "cell", F.posexplode(emb_col).alias("dim", "v")
        )
        per_dim = dims.groupBy("cell", "dim").agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("m")
        )
        cent = (
            per_dim.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "m")),
                        lambda a, b: F.when(a["dim"] < b["dim"], -1)
                        .when(a["dim"] > b["dim"], 1)
                        .otherwise(0),
                    ),
                    lambda s: s["m"],
                ).alias("centroid")
            )
        )
    return cent


def kmeans_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cell): nearest centroid per vector — broadcast the k-row
    centroid table, argmin of 6-decimal-rounded squared L2, ties to the
    lower cell id (struct-min ordering)."""
    dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col(emb_col),
                F.col("centroid"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    return (
        embeddings.select(id_col, emb_col)
        .crossJoin(F.broadcast(centroids))
        .select(F.col(id_col), F.col("cell"), dist.alias("dist"))
        .groupBy(id_col)
        .agg(F.min(F.struct("dist", "cell")).alias("best"))
        .select(F.col(id_col), F.col("best.cell").alias("cell"))
    )


def kmeans_centroid_scores(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """(cell, centroid_cosine): query cosine against every trained
    centroid — the IVF probe ranking."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return kmeans_centroids(embeddings, k=k, iters=iters).select(
        "cell",
        F.round(cosine_col(F.col("centroid"), q), 6).alias("centroid_cosine"),
    )


def ivf_topk_kmeans(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search over TRAINED k-means cells: rank cells by centroid
    cosine, brute-force only the vectors assigned to the top ``nprobe``
    cells.  The probe set join is a broadcast of <= nprobe cell ids; the
    candidate scan touches only the probed cells' vectors (at scale the
    assignment is a partition column, so the scan prunes to those
    partitions).  Recall vs brute_force_topk is measured in
    tests/test_simsearch.py."""
    # materialize the trained centroids once (k rows — driver-sized by
    # construction) so the probe ranking and the assignment pass both read
    # a literal local relation instead of re-running the Lloyd chain
    rows = kmeans_centroids(embeddings, k=n_cells, iters=iters).collect()
    cent = embeddings.sparkSession.createDataFrame(
        [(int(r["cell"]), [float(x) for x in r["centroid"]]) for r in rows],
        "cell int, centroid array<double>",
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cscore = cent.select(
        "cell", F.round(cosine_col(F.col("centroid"), q), 6).alias("centroid_cosine")
    )
    probe = cscore.orderBy(F.desc("centroid_cosine"), F.asc("cell")).limit(nprobe)
    assign = kmeans_assign(embeddings, cent, id_col=id_col)
    cand = embeddings.join(assign, id_col).join(
        F.broadcast(probe.select("cell")), "cell", "inner"
    )
    return (
        cand.select(
            *_carry_cols(embeddings, id_col),
            F.round(cosine_col(F.col("embedding"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def centroid_scores(embeddings: DataFrame, query_vec: list[float]) -> DataFrame:
    """Cosine of the query against every coarse centroid (the IVF probe
    ranking): (label, centroid_cosine)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return label_centroids(embeddings).select(
        "label",
        F.round(cosine_col(F.col("centroid"), q), 6).alias("centroid_cosine"),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: rank coarse cells by centroid cosine, brute-force only
    the top ``nprobe`` cells.  Approximate (recall < 1 when the true
    neighbor lives in an unprobed cell) — the standard ANN trade; compare
    against brute_force_topk for recall measurement."""
    cs = centroid_scores(embeddings, query_vec)
    probe = cs.orderBy(F.desc("centroid_cosine"), F.asc("label")).limit(nprobe)
    cand = embeddings.join(F.broadcast(probe.select("label")), "label", "inner")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            F.col(id_col),
            "label",
            F.round(cosine_col(F.col("embedding"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


IVF_META = "_IVF_META.json"


def _ivf_meta(path: str) -> dict:
    """Index metadata: {"version", "dir", "train_mean_dist", "n_cells",
    "iters"}.  A pre-maintenance index (no meta file) reads as version 0
    rooted at ``path`` with an unknown training baseline — fully
    back-compatible with indexes written before drift maintenance
    existed."""
    p = os.path.join(path, IVF_META)
    if not os.path.exists(p):
        return {"version": 0, "dir": "", "prev_dir": None, "train_mean_dist": None}
    with open(p) as f:
        return json.load(f)


def _ivf_dirs(path: str, meta: dict | None = None) -> tuple[str, str]:
    meta = meta if meta is not None else _ivf_meta(path)
    base = os.path.join(path, meta.get("dir") or "")
    return f"{base}/vectors", f"{base}/_centroids"


def _ivf_commit_meta(path: str, meta: dict) -> None:
    """Atomic commit point for a generation switch — the shared fsync'd
    tmp + os.replace primitive from tables.py."""
    from .tables import atomic_write_json

    atomic_write_json(os.path.join(path, IVF_META), meta)


def _ivf_sweep(path: str, keep: set[str]) -> None:
    """Remove superseded generation data, KEEPING every dir named in
    ``keep`` ("" = the root-layout vectors/_centroids pair).  The
    committed meta always names {dir, prev_dir}: the immediately-
    superseded generation survives one retrain cycle as read grace —
    probes are lock-free, so an in-flight query that resolved the old
    generation must be able to finish its parquet reads; only
    generations at least two commits old are deleted."""
    if "" not in keep:
        shutil.rmtree(os.path.join(path, "vectors"), ignore_errors=True)
        shutil.rmtree(os.path.join(path, "_centroids"), ignore_errors=True)
    for d in os.listdir(path):
        if d.startswith("gen-") and d not in keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def _assign_dist_stats(assigned: DataFrame, cent: DataFrame) -> dict:
    """{n, mean_dist, max_dist}: squared-L2 of each vector to its
    assigned centroid — one broadcast join, scalar-only collect."""
    sq = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    row = (
        assigned.join(F.broadcast(cent), "cell")
        .select(sq.alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("d").alias("mean_d"),
            F.max("d").alias("max_d"),
        )
        .collect()[0]
    )
    return {
        "n": int(row["n"]),
        "mean_dist": float(row["mean_d"]) if row["mean_d"] is not None else 0.0,
        "max_dist": float(row["max_d"]) if row["max_d"] is not None else 0.0,
    }


def _ivf_write_at(
    embeddings: DataFrame,
    base: str,
    n_cells: int,
    iters: int,
    id_col: str,
) -> float:
    """Train + materialize one index generation under ``base``; returns
    the training-time mean assignment distance (the drift baseline)."""
    cent = kmeans_centroids(embeddings, k=n_cells, iters=iters)
    assign = kmeans_assign(embeddings, cent, id_col=id_col)
    assigned = embeddings.join(assign, id_col)
    (
        assigned.write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{base}/vectors")
    )
    cent.write.mode("overwrite").parquet(f"{base}/_centroids")
    spark = embeddings.sparkSession
    stored_cent = spark.read.parquet(f"{base}/_centroids")
    stats = _assign_dist_stats(
        spark.read.parquet(f"{base}/vectors"), stored_cent
    )
    return stats["mean_dist"]


def ivf_index_write(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index as parquet PARTITIONED BY cell — the
    100 TB layout: each coarse cell is a partition directory, so a probe
    of nprobe cells is a partition-PRUNED scan (the non-probed cells'
    files are never opened; `explain` shows the cell filter in
    PartitionFilters).  Centroids are stored alongside as a tiny
    `_centroids` parquet for probe ranking.  The training-time mean
    assignment distance is recorded in ``_IVF_META.json`` as the drift
    baseline that ivf_index_append's maintenance policy compares
    against.

    Runs under the index writer lock (same lock ivf_index_append takes),
    so a rebuild cannot race an append and drop its rows.  Rebuilding
    over an EXISTING index writes a fresh generation and bumps the
    version (never overwriting the generation lock-free readers are
    scanning); the superseded generation survives one cycle as read
    grace (see _ivf_sweep)."""
    from .tables import warehouse_lock

    os.makedirs(path, exist_ok=True)
    with warehouse_lock(path, "ivf-write"):
        meta = _ivf_meta(path)
        existing = os.path.exists(os.path.join(path, IVF_META))
        if existing:
            version = int(meta.get("version", 0)) + 1
            gen = f"gen-{version}"
            prev = meta.get("dir") or ""
        else:
            version, gen, prev = 0, "", None
        base = os.path.join(path, gen) if gen else path
        train_mean = _ivf_write_at(embeddings, base, n_cells, iters, id_col)
        _ivf_commit_meta(
            path,
            {
                "version": version,
                "dir": gen,
                "prev_dir": prev,
                "train_mean_dist": train_mean,
                "n_cells": n_cells,
                "iters": iters,
            },
        )
        _ivf_sweep(path, {gen, prev if prev is not None else gen})


def ivf_index_append(
    spark,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    maintenance: str | None = None,
    drift_ratio: float = 2.0,
) -> dict:
    """Append vectors to a materialized IVF index WITHOUT retraining:
    assign each new vector to its nearest STORED centroid (broadcast
    k-row join — the standard assign pattern) and append only the
    affected cell partitions; `_centroids` is untouched, so concurrent
    probes keep ranking against a stable quantizer.  This is the
    incremental-ingest path at 100 TB — retraining is O(corpus·iters),
    appending is O(batch).

    Returns drift stats over the appended batch: {"n_appended",
    "mean_dist", "max_dist", "baseline_mean_dist", "version",
    "retrained"} where dist is the squared L2 to the assigned centroid.

    ``maintenance="retrain"`` ACTS on the drift signal (an unattended
    append-forever store otherwise degrades recall with no tripwire):
    when the batch's mean assignment distance exceeds ``drift_ratio`` ×
    the stored training-time baseline, the quantizer is re-fit over the
    FULL stored corpus into a new generation directory and committed by
    an atomic ``_IVF_META.json`` replace — readers resolve the current
    generation through the meta, so a kill anywhere leaves either the
    old or the new index, never a mix; stale generation dirs are swept
    on the next retrain.  Same tiered-maintenance philosophy as the
    postings index: appends stay O(batch), the occasional retrain is the
    amortized O(corpus) repair, and the trigger is a measured ratio, not
    a schedule.  With ``maintenance=None`` the stats are returned for
    the caller to act on (previous behavior).

    The whole op runs under the index writer lock (tables.warehouse_lock
    on ``path``): an append racing a retrain would land rows in a
    generation the retrain is about to supersede — losing them."""
    from .tables import warehouse_lock

    with warehouse_lock(path, "ivf-append"):
        meta = _ivf_meta(path)
        vecdir, centdir = _ivf_dirs(path, meta)
        cent = spark.read.parquet(centdir)
        assign = kmeans_assign(new_vectors, cent, id_col=id_col)
        appended = new_vectors.join(assign, id_col)
        appended.write.mode("append").partitionBy("cell").parquet(vecdir)
        stats = _assign_dist_stats(appended, cent)
        baseline = meta.get("train_mean_dist")
        out = {
            "n_appended": stats["n"],
            "mean_dist": stats["mean_dist"],
            "max_dist": stats["max_dist"],
            "baseline_mean_dist": baseline,
            "version": int(meta.get("version", 0)),
            "retrained": False,
        }
        if (
            maintenance == "retrain"
            and baseline is not None
            and baseline > 0
            and stats["mean_dist"] > drift_ratio * baseline
        ):
            new_version = int(meta.get("version", 0)) + 1
            gen = f"gen-{new_version}"
            all_vecs = spark.read.parquet(vecdir).drop("cell")
            n_cells = int(meta.get("n_cells") or cent.count())
            iters = int(meta.get("iters") or 2)
            train_mean = _ivf_write_at(
                all_vecs, os.path.join(path, gen), n_cells, iters, id_col
            )
            old_dir = meta.get("dir") or ""
            _ivf_commit_meta(
                path,
                {
                    "version": new_version,
                    "dir": gen,
                    "prev_dir": old_dir,
                    "train_mean_dist": train_mean,
                    "n_cells": n_cells,
                    "iters": iters,
                },
            )
            # post-commit sweep: the just-superseded generation is KEPT
            # one cycle as read grace for lock-free in-flight probes;
            # older generations go (best-effort — a kill here leaves
            # orphans the next retrain's sweep removes)
            _ivf_sweep(path, {gen, old_dir})
            out.update(
                retrained=True,
                version=new_version,
                new_train_mean_dist=train_mean,
            )
        return out


def ivf_search_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the materialized IVF index: rank stored centroids (tiny
    driver-side read), then scan ONLY the probed cells' partitions —
    `cell IN (...)` is a partition filter, so scan cost is
    O(probed cells), not O(corpus), at any scale."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vecdir, centdir = _ivf_dirs(path)  # resolve the committed generation
    cent = spark.read.parquet(centdir)
    probe = [
        int(r["cell"])
        for r in cent.select(
            "cell", F.round(cosine_col(F.col("centroid"), q), 6).alias("cc")
        )
        .orderBy(F.desc("cc"), F.asc("cell"))
        .limit(nprobe)
        .collect()
    ]
    vecs = spark.read.parquet(vecdir).filter(F.col("cell").isin(probe))
    return (
        vecs.select(
            *_carry_cols(vecs, id_col),
            F.round(cosine_col(F.col("embedding"), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def near_duplicate_pairs(
    embeddings: DataFrame, threshold: float = 0.95, id_col: str = "vec_id"
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine >= threshold) — the
    QUADRATIC all-pairs form, kept as the small-scale oracle/recall
    baseline for near_duplicate_pairs_lsh below (the scale path)."""
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col("embedding").alias("emb")
    )
    a = e.select(F.col("id").alias("id_a"), F.col("emb").alias("emb_a"))
    b = e.select(F.col("id").alias("id_b"), F.col("emb").alias("emb_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH near-dup — the scale path for the pair search.


def hyperplane_weights(num_bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (b, d) is an
    md5-derived uniform in [-1, 1), so the DuckDB oracle can regenerate
    the identical planes with
    cast(concat('0x', substr(md5(b || ':' || d), 1, 8)) as bigint)
    / 2147483648.0 - 1.0.  (A trained/Gaussian bank drops in at scale;
    determinism across engines is what matters here.)"""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{b}:{d}".encode()).hexdigest()[:8], 16) / 2147483648.0
            - 1.0
            for d in range(1, dim + 1)
        ]
        for b in range(num_bits)
    ]


def hyperplane_bands(
    embeddings: DataFrame,
    num_bits: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, band_id, band_val): sign-of-dot-product bit signature split
    into ``bands`` integer band values.  Dots are rounded to 6 decimals
    before the sign test so Spark and the SQL oracle agree bit-for-bit.
    All JVM-side (zip_with/aggregate against broadcast literal planes)."""
    if num_bits % bands != 0:
        raise ValueError(
            f"num_bits={num_bits} must divide evenly into bands={bands}; "
            "a remainder would be computed but never folded into any band, "
            "silently weakening recall"
        )
    r = num_bits // bands
    first = embeddings.select(emb_col).first()
    if first is None:  # empty input -> empty signature table
        return embeddings.sparkSession.createDataFrame(
            [], "id long, band_id int, band_val long"
        )
    dim = len(first[emb_col])
    planes = hyperplane_weights(num_bits, dim)
    bits = [
        (
            F.round(_dot(F.col(emb_col), F.array(*[F.lit(w) for w in planes[b]])), 6)
            > 0
        ).cast("long")
        for b in range(num_bits)
    ]
    band_vals = [
        sum(bits[bi * r + i] * F.lit(1 << i) for i in range(r)) for bi in range(bands)
    ]
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_id"), band_vals[bi].alias("band_val")
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band_id", "b.band_val")


def near_duplicate_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.99,
    num_bits: int = 32,
    bands: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Bucketed embedding near-dup — candidate pairs from the hyperplane
    band join (shuffles only (band_id, band_val) keys: linear in corpus),
    then EXACT cosine verification on candidates only.  Approximate: a
    pair whose signature differs in every band is missed — P(miss) =
    (1 - p^r)^bands with p = 1 - angle/pi, vanishing as cosine -> 1
    (for cosine 0.99, r=8, b=4: ~1e-3); recall vs the exact all-pairs
    form is asserted in tests/test_simsearch.py.  Candidate volume for
    random pairs is ~(1/2^r)*bands of the quadratic (~1.5% at r=8,b=4)."""
    banded = hyperplane_bands(embeddings, num_bits, bands, id_col, emb_col)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    e = embeddings.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))
    ea = e.select(F.col("id").alias("id_a"), F.col("emb").alias("emb_a"))
    eb = e.select(F.col("id").alias("id_b"), F.col("emb").alias("emb_b"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )
