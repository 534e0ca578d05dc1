"""Structured Streaming twin of the search-analytics aggregations.

The reference's 'streaming' is Redis queues with blocking pops (SURVEY.md
§2.9): the indexer queue (services/indexer/data/redis_client.py:39-50),
the zset analytics (StoreSearchTerm.php:31-38), and a 24h TTL counter.
Here the query log is a real stream: ``readStream`` -> event-time windowed
counts with a watermark for late data -> sink.  ``foreachBatch`` is the
bridge into the batch index-build (incremental indexing), mirroring the
indexer's queue-drain loop.

These helpers take any streaming DataFrame with (ts timestamp, query
string); tests drive them from a file source over parquet drops.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_query_stream(
    spark: SparkSession, path: str, schema: str = "ts timestamp, query string"
) -> DataFrame:
    """File-source stream: each parquet file dropped in `path` is a
    micro-batch (the Redis pages_queue analogue)."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_search_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    query_col: str = "query",
) -> DataFrame:
    """A14 as a watermarked event-time windowed aggregation: late events
    beyond the watermark are dropped, state is bounded (the zset-trim
    analogue).  Output matches analytics.windowed_counts on the same data
    once all input is ingested (asserted in tests)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(query_col).alias("query"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("searches"))
        .select(F.col("w.start").alias("window_start"), "query", "searches")
    )


def run_to_memory_sink(
    aggregated: DataFrame, name: str, timeout_s: float = 60.0
) -> None:
    """Drive the stream to completion into an in-memory table `name`
    (complete mode — the aggregation is small by construction).  Raises
    on timeout instead of letting callers read a half-populated sink."""
    q = (
        aggregated.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query '{name}' did not finish within {timeout_s}s; "
            "the memory sink would be partial"
        )


def running_search_totals(
    stream: DataFrame,
    ts_col: str = "ts",
    query_col: str = "query",
    timeout_minutes: int | None = None,
):
    """Custom stateful operator via ``applyInPandasWithState``: a running
    all-time count per query term across micro-batches — the exact
    semantics of moogle's ZINCRBY counter (StoreSearchTerm.php:31), which
    a windowed aggregation can't express (no window: state lives forever,
    or until the optional processing-time timeout).

    Emits one row per (query) per micro-batch in which it appeared, with
    the updated running total."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
        if seen:
            total += seen
            state.update((total,))
            if timeout_minutes:
                state.setTimeoutDuration(timeout_minutes * 60 * 1000)
            yield pd.DataFrame({"query": [key[0]], "searches": [total]})
        elif state.hasTimedOut:
            state.remove()

    return (
        stream.groupBy(F.col(query_col).alias("query"))
        .applyInPandasWithState(
            update,
            outputStructType="query string, searches long",
            stateStructType="total long",
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def incremental_index_foreachBatch(
    stream: DataFrame, batch_fn, checkpoint: str, timeout_s: float = 120.0
) -> None:
    """The indexer queue-drain loop (services/indexer/main.py:111-211) as
    foreachBatch: every micro-batch of new docs is handed to the batch
    index builder (callable(batch_df, batch_id)); exactly-once via the
    checkpoint dir + the warehouse's idempotent stage commits."""
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def staleness_gated_batch_fn(
    warehouse: str,
    n_shards: int | None = None,
    doc_id_mode: str = "rank",
    strategy: str = "shards",
    auto_compact_ratio: float | None = None,
    maintenance: str = "compact",
    lock_retries: int = 5,
    lock_backoff_s: float = 2.0,
):
    """batch_fn for ``incremental_index_foreachBatch`` with the
    reference's staleness gate (services/indexer/main.py:140-143 skips a
    doc whose last_crawled is unchanged): each micro-batch is merged via
    ``build.incremental_build(mode="upsert")``, so docs whose
    (repo, path, commit, content_sha256) already sit in the committed
    index are never re-tokenized — a re-delivered or unchanged doc costs
    one JVM sha + an anti-join, not an analyzer pass.

    For CONTINUOUS ingestion pass ``doc_id_mode="stable"`` +
    ``strategy="segment"`` (or "auto"): each micro-batch then lands as a
    generation at O(batch) cost with no base partition rewritten, and
    ``auto_compact_ratio``/``maintenance="tiered"`` keep the generation
    count and tombstone mask bounded between batches — the 10^12-file
    queue-drain shape.  The first batch builds the warehouse cold with
    the requested id scheme; later batches route on the committed
    manifest.

    Writer-lock contention: external maintenance (CLI compact / merge /
    delete_docs) running concurrently with the stream makes the batch's
    incremental_build fail fast with WarehouseLockedError.  Aborting the
    whole streaming query over a transient lock would turn routine
    maintenance into an outage, so the batch fn retries the build up to
    ``lock_retries`` times with exponential backoff (lock_backoff_s ·
    2^attempt); a lock still held after the final retry re-raises — at
    that point the holder is either wedged or running an op long enough
    that a human should look, and foreachBatch's checkpoint semantics
    make the re-delivered batch safe to replay."""

    def fn(batch_df, batch_id: int) -> None:
        from .build import incremental_build
        from .tables import WarehouseLockedError

        for attempt in range(lock_retries + 1):
            try:
                incremental_build(
                    batch_df.sparkSession, batch_df, warehouse, mode="upsert",
                    n_shards=n_shards, doc_id_mode=doc_id_mode, strategy=strategy,
                    auto_compact_ratio=auto_compact_ratio, maintenance=maintenance,
                )
                return
            except WarehouseLockedError:
                if attempt == lock_retries:
                    raise
                time.sleep(lock_backoff_s * (2 ** attempt))

    return fn
