"""Search analytics — moogle's Redis zset/counter analytics re-expressed
as DataFrame aggregations over an append-only query/event log.

Reference semantics:
  * A14 top searches: ZINCRBY top_searches + trim to 100
    (services/query-engine/app/Http/Middleware/StoreSearchTerm.php:31-33);
    served top-10 (app/Http/Controllers/RedisController.php:14-30, T6).
  * T7 prefix suggestions: case-insensitive prefix filter over the top
    searches, limit 10 (RedisController.php:32-55).
  * A15 rolling daily counter: INCR with 86400s TTL
    (StoreSearchTerm.php:36-38) -> event-time tumbling 1-day window.

The log is any DataFrame with (ts:timestamp, query:string) — here mapped
onto the driver's events table (event_type plays the query string).  All
aggregations are built-in (map-side partial agg + one shuffle); the
streaming twin lives in streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_searches(log: DataFrame, query_col: str = "query", k: int = 10) -> DataFrame:
    """A14/T6: term -> count, ordered desc, top-k; tie-break term asc
    (frozen so results are deterministic)."""
    return (
        log.groupBy(F.col(query_col).alias("query"))
        .agg(F.count(F.lit(1)).cast("long").alias("searches"))
        .orderBy(F.desc("searches"), F.asc("query"))
        .limit(k)
    )


def search_suggestions(
    log: DataFrame, prefix: str, query_col: str = "query", k: int = 10
) -> DataFrame:
    """T7 (RedisController.php:32-55): case-insensitive prefix match over
    the aggregated top searches."""
    return (
        top_searches(log, query_col, k=100)
        .filter(F.lower(F.col("query")).startswith(prefix.lower()))
        .orderBy(F.desc("searches"), F.asc("query"))
        .limit(k)
    )


def daily_search_counts(log: DataFrame, ts_col: str = "ts") -> DataFrame:
    """A15 (StoreSearchTerm.php:36-38): the 24h TTL counter as an
    event-time tumbling 1-day window count."""
    return (
        log.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("searches"))
        .orderBy("day")
    )


def windowed_counts(
    log: DataFrame, ts_col: str = "ts", query_col: str = "query", window: str = "1 hour"
) -> DataFrame:
    """Per-(window, query) counts — the batch twin of the streaming
    watermarked aggregation in streaming.py."""
    return (
        log.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(query_col).alias("query"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("searches"))
        .select(
            F.col("w.start").alias("window_start"),
            "query",
            "searches",
        )
        .orderBy("window_start", "query")
    )
