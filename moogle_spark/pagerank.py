"""PageRank — the reference's single-process Go loop re-expressed as an
iterative shuffle join (the scale fix for SURVEY.md §4.2's "loads the
entire graph into one process's RAM").

Faithful semantics (services/page-rank/cmd/page-rank/main.go:96-128, and
mirrored by the single-node oracle in oracle.py::oracle_pagerank):
  * N = number of nodes WITH outlinks (main.go:57-58 counts the outlinks
    collection); ranks initialize to 1/N over those nodes only
  * the iteration's key set never grows (main.go:110) — sink-only nodes
    never hold a rank
  * contribution to p = Σ over backlinks b of p, where b holds a rank,
    of rank(b)/outdeg(b); new = (1-d)/N + d·Σ  (main.go:115-124)
  * 10 iterations, d = 0.85 (main.go:103-104)

Spark shape (J7): per iteration one join ranks⋈edges (on src) and one
groupBy(dst) sum — the canonical distributed PageRank.  ``outdeg`` is
computed once and joined in; each iteration's result is persisted and the
previous unpersisted so the lineage stays O(1) per step.  At web scale the
edges DataFrame would be bucketed by src so the per-iteration join is
shuffle-free on the edges side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 10


def pagerank(
    edges: DataFrame,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """edges: (src:long, dst:long), duplicate edges allowed upstream —
    deduped here (U1 set semantics) and self-loops dropped (U2,
    spider/internal/crawler/crawler.go:75-77).  Returns (doc_id, rank)."""
    e = edges.filter(F.col("src") != F.col("dst")).distinct().persist()
    nodes = e.select(F.col("src").alias("doc_id")).distinct().persist()
    ew = None
    try:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        n = nodes.count()
        if n == 0:
            return edges.sparkSession.createDataFrame([], "doc_id long, rank double")
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        base = (1.0 - damping) / n
        # pre-join edge weights once: (src, dst, 1/outdeg)
        ew = e.join(outdeg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("inv_outdeg")
        ).persist()
        ew.count()
        for _ in range(iterations):
            contrib = (
                ew.join(ranks, ew.src == ranks.doc_id, "inner")
                .select("dst", (F.col("rank") * F.col("inv_outdeg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            new_ranks = nodes.join(contrib, nodes.doc_id == contrib.dst, "left").select(
                "doc_id",
                (F.lit(base) + damping * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            # eager localCheckpoint: materializes AND truncates lineage, so
            # the per-iteration plan stays O(1) instead of compounding 10
            # joins deep (on a real cluster use df.checkpoint() with a
            # reliable dir)
            ranks = new_ranks.localCheckpoint(eager=True)
        return ranks.orderBy("doc_id")
    finally:
        # ranks is localCheckpointed, so the caches are safe to drop —
        # without this every pagerank() call leaked three cached
        # DataFrames for the session lifetime
        e.unpersist()
        nodes.unpersist()
        if ew is not None:
            ew.unpersist()


def top_ranked(ranks: DataFrame, k: int = 1) -> DataFrame:
    """T4 (QuerySearchController.php:399-405): highest-rank doc(s)."""
    return ranks.orderBy(F.desc("rank"), F.asc("doc_id")).limit(k)


def blend_scores(
    text_scores: DataFrame, ranks: DataFrame, w_text: float = 0.6, w_rank: float = 0.4
) -> DataFrame:
    """J8 (QuerySearchController.php:327-335): combined = 0.6·text score +
    0.4·pagerank, with rank coalesced to 0 for unranked docs (the
    reference's :325 bug makes rank effectively always 0 — our default is
    the *fixed* behavior; pass w_rank=0 to reproduce the bug bit-for-bit).
    text_scores: (doc_id, score)."""
    return (
        text_scores.join(ranks, "doc_id", "left")
        .select(
            "doc_id",
            "score",
            F.coalesce("rank", F.lit(0.0)).alias("rank"),
            (w_text * F.col("score") + w_rank * F.coalesce("rank", F.lit(0.0))).alias(
                "combined"
            ),
        )
        .orderBy(F.desc("combined"), F.asc("doc_id"))
    )
