"""Stateful streaming: applyInPandasWithState sessionization across
micro-batches + watermarked windowed aggregation with late data."""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from airbyte_spark.streaming.stateful import sessionize_stream, windowed_event_counts

EV_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def T(minute, sec=0):
    return dt.datetime(2026, 3, 1, 10, minute, sec)


def _run_stream(spark, tmp_table_dir, batches, make_query):
    src = os.path.join(tmp_table_dir, "in")
    out = os.path.join(tmp_table_dir, "out")
    ckpt = os.path.join(tmp_table_dir, "ck")
    os.makedirs(src)
    results = []
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
        stream = spark.readStream.schema(EV_SCHEMA).option(
            "maxFilesPerTrigger", 1000
        ).parquet(src + "/*")
        q = (
            make_query(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            results.append(spark.read.parquet(out).collect())
        except Exception:
            results.append([])
    return results


def test_sessionize_stream_across_batches(spark, tmp_table_dir):
    """Events for one user split across two micro-batches with a gap:
    the first session closes when the second batch's late event arrives
    past the gap; open sessions persist in GroupState between batches."""
    b0 = [
        (1, T(0), "click", 1.0),
        (1, T(5), "click", 1.0),   # same session (gap 10 min)
        (2, T(0), "view", 1.0),
    ]
    b1 = [
        (1, T(30), "click", 1.0),  # 25 min after last -> closes session 1
        (2, T(2), "view", 1.0),    # continues user 2's open session
    ]
    res = _run_stream(
        spark, tmp_table_dir, [b0, b1],
        lambda s: sessionize_stream(s, gap_seconds=600),
    )
    after_b1 = {
        (r["user_id"], r["session_start"], r["session_end"], r["events"])
        for r in res[1]
    }
    assert (1, T(0), T(5), 2) in after_b1
    # user 2's session is still open (no gap crossed, no timeout forced)
    assert not any(u == 2 for (u, *_rest) in after_b1)


def test_windowed_counts_with_late_data(spark, tmp_table_dir):
    """A late row within the watermark lands in its (closed-looking)
    window; windows finalize only past the watermark."""
    b0 = [
        (1, T(1), "click", 2.0),
        (2, T(4), "click", 3.0),
        (1, T(12), "view", 1.0),
        # advance event time far enough that the 10:00 window can finalize
        (3, T(55), "view", 1.0),
    ]
    b1 = [
        (4, T(58), "view", 1.0),
    ]
    res = _run_stream(
        spark, tmp_table_dir, [b0, b1],
        lambda s: windowed_event_counts(s, window="10 minutes",
                                        watermark="10 minutes"),
    )
    final = {
        (r["window_start"], r["event_type"]): (r["events"], r["total_value"])
        for r in res[-1]
    }
    assert final[(T(0), "click")] == (2, 5.0)
    assert final[(T(10), "view")] == (1, 1.0)
