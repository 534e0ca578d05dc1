"""Link-graph construction + the page-connections view over the driver's
TPC-H-ish tables — the `edges` data model of SURVEY.md §1.3 exercised on
real relational inputs.

Graph: customers -> suppliers they bought from (orders ⋈ lineitem,
deduped, U1), plus the reverse supplier -> customer edge when the
lineitem was returned (l_returnflag = 'R') so the graph has cycles and
PageRank is non-degenerate.  Supplier node ids are offset by
SUPPLIER_OFFSET to keep the id spaces disjoint.  Self-loops are
structurally impossible here but pagerank.pagerank() still filters them
(U2 semantics).

page_connections mirrors the reference's /page-connections endpoint
(J4, services/query-engine/app/Http/Controllers/QuerySearchController.php:
36-103): the edge list enriched with both endpoints' display names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPLIER_OFFSET = 1_000_000


def tpch_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) long — deduped directed edges as described above."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ol = orders.join(li, orders.o_orderkey == li.l_orderkey)
    fwd = ol.select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("l_suppkey") + SUPPLIER_OFFSET).cast("long").alias("dst"),
    )
    rev = ol.filter(F.col("l_returnflag") == "R").select(
        (F.col("l_suppkey") + SUPPLIER_OFFSET).cast("long").alias("src"),
        F.col("o_custkey").cast("long").alias("dst"),
    )
    return fwd.union(rev).distinct()


def page_connections(
    spark: SparkSession, sf_dir: str, max_custkey: int = 200
) -> DataFrame:
    """J4: customer->supplier edges enriched with both names (two
    broadcast-able dimension joins; customer/supplier are the small
    sides)."""
    edges = tpch_edges(spark, sf_dir).filter(
        (F.col("src") < SUPPLIER_OFFSET) & (F.col("src") <= max_custkey)
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("src"), F.col("c_name").alias("src_name")
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        (F.col("s_suppkey") + SUPPLIER_OFFSET).cast("long").alias("dst"),
        F.col("s_name").alias("dst_name"),
    )
    return (
        edges.join(F.broadcast(cust), "src")
        .join(F.broadcast(supp), "dst")
        .select("src", "dst", "src_name", "dst_name")
        .orderBy("src", "dst")
    )


def degree_rank(edges: DataFrame) -> DataFrame:
    """Degree centrality: outdeg(node)/|edges| — the cheap stand-in rank
    used by the score-blend demo (J8) where full PageRank isn't needed."""
    total = edges.count()
    return (
        edges.groupBy(F.col("src").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .select("doc_id", (F.col("outdeg") / F.lit(float(total))).alias("rank"))
    )
