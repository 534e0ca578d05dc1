"""Custom stateful streaming op: running totals across micro-batches."""

import datetime as dt
import os


def test_running_totals_across_batches(spark, tmp_path):
    from moogle_spark.streaming import read_query_stream, running_search_totals

    base = dt.datetime(2024, 5, 1)
    b1 = [(base + dt.timedelta(minutes=i), q) for i, q in enumerate(["a", "a", "b"])]
    b2 = [(base + dt.timedelta(minutes=10 + i), q) for i, q in enumerate(["a", "b", "b"])]
    src = str(tmp_path / "state_src")
    os.makedirs(src, exist_ok=True)
    spark.createDataFrame(b1, "ts timestamp, query string").coalesce(1).write.parquet(
        src + "/b1.parquet"
    )
    spark.createDataFrame(b2, "ts timestamp, query string").coalesce(1).write.parquet(
        src + "/b2.parquet"
    )

    stream = read_query_stream(spark, src + "/*.parquet")
    out = running_search_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from running_totals").toPandas()
    # final running totals must reach a=3, b=3 regardless of batch split
    finals = got.groupby("query")["searches"].max()
    assert finals["a"] == 3
    assert finals["b"] == 3
