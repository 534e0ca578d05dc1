"""Iceberg-lite warehouse: parquet table dirs + atomic commit manifests +
per-stage lineage, giving the checkpoint/resume semantics BASELINE.json
north_star mandates ("checkpoints to Iceberg so a killed job resumes from
the last committed stage") without the Iceberg runtime jar (not present in
the sandbox; the table layout is identical either way — SURVEY.md §7.0).

Commit protocol: a table is COMMITTED iff `_MANIFEST.json` exists inside its
directory. Spark writes the parquet dir first; the manifest (with row count,
schema, stage name, lineage rollup) is written last, fsync'd, as the commit
marker. A job killed mid-write leaves no manifest -> the stage re-runs and
overwrites. On a real cluster the same protocol maps 1:1 onto Iceberg
snapshot commits.

Lineage (north_star: "per-partition lineage rows (partition id, doc count,
posting bytes, content sha256 rollup)") is an append-only parquet table
`lineage` with one row per (stage, partition).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"

# Bump when any stored-table layout changes: build_index treats committed
# stages whose manifest carries an older version as NOT committed (rebuild
# instead of resuming into a stale layout).
FORMAT_VERSION = 2

LINEAGE_SCHEMA = (
    "stage string, partition_id int, doc_count long, posting_bytes long, "
    "sha256_rollup string, committed_at double"
)


class Warehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def is_committed(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), MANIFEST))

    def manifest(self, name: str) -> dict:
        with open(os.path.join(self.path(name), MANIFEST)) as f:
            return json.load(f)

    def drop(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)

    def write(
        self,
        df: DataFrame,
        name: str,
        stage: str,
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
        meta: dict | None = None,
    ) -> None:
        """Write table + commit manifest. Overwrites any uncommitted or
        stale previous attempt."""
        p = self.path(name)
        shutil.rmtree(p, ignore_errors=True)
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(p)
        man = {
            "table": name,
            "stage": stage,
            "format_version": FORMAT_VERSION,
            "schema": df.schema.json(),
            "partition_by": partition_by or [],
            "committed_at": time.time(),
            **(meta or {}),
        }
        tmp = os.path.join(p, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(p, MANIFEST))

    def update_meta(self, name: str, extra: dict) -> None:
        """Merge extra keys into a committed table's manifest (atomic)."""
        p = self.path(name)
        man = self.manifest(name)
        man.update(extra)
        tmp = os.path.join(p, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(p, MANIFEST))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if not self.is_committed(name):
            raise FileNotFoundError(f"table {name} not committed in {self.root}")
        return spark.read.parquet(self.path(name))

    # ---- lineage -------------------------------------------------------
    def append_lineage(self, spark: SparkSession, stage: str, rows_df: DataFrame) -> None:
        """rows_df: (partition_id, doc_count, posting_bytes, sha256_rollup)."""
        out = rows_df.select(
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.col("doc_count").cast("long"),
            F.col("posting_bytes").cast("long"),
            F.col("sha256_rollup").cast("string"),
            F.lit(time.time()).alias("committed_at"),
        )
        out.write.mode("append").parquet(self.path("lineage"))

    def lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(LINEAGE_SCHEMA).parquet(self.path("lineage"))


def partition_lineage(df: DataFrame, count_col: str = "doc_id", sha_col: str | None = None, bytes_expr=None) -> DataFrame:
    """Per-Spark-partition lineage rollup: (partition_id, doc_count,
    posting_bytes, sha256_rollup). sha rollup = sha256 over the sorted list
    of row-level sha256s, order-independent and partition-stable."""
    g = df.withColumn("partition_id", F.spark_partition_id()).groupBy("partition_id")
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if bytes_expr is not None:
        aggs.append(F.sum(bytes_expr).cast("long").alias("posting_bytes"))
    else:
        aggs.append(F.lit(0).cast("long").alias("posting_bytes"))
    if sha_col is not None:
        aggs.append(
            F.sha2(F.concat_ws(",", F.sort_array(F.collect_list(sha_col))), 256).alias("sha256_rollup")
        )
    else:
        aggs.append(F.lit("").alias("sha256_rollup"))
    return g.agg(*aggs)
