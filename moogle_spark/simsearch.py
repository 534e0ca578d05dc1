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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.  The query is a
    broadcast literal column; the scan is a single pass, partial top-k per
    partition then a k-row merge (TakeOrderedAndProject)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embeddings.select(
            F.col(id_col),
            "label",
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


def near_duplicate_pairs(
    embeddings: DataFrame, threshold: float = 0.95, id_col: str = "vec_id"
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cosine >= threshold).
    Demo-scale is the full cross join; at scale, pre-bucket by IVF cell
    (near-dups share a cell with high probability) or LSH band and join
    within buckets only."""
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
