"""Streaming sessionization with Spark's native session windows.

The batch sessionize operator (plans/entry_queries.py events_sessionize)
derives sessions with a window-lag pass; on a live event stream the same
semantics come from Structured Streaming's built-in ``session_window``
(gap-based dynamic windows + watermark for late data) — Spark-first: no
custom state management, the state store handles session merge/expiry.
The reference has no streaming surface (batch-only polling loops,
cmd/serve.go:82-94); this extends the M8 pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
])


def stream_sessionize(spark: SparkSession, in_path: str, out_path: str,
                      checkpoint: str, *, gap: str = "30 minutes",
                      watermark: str = "1 hour",
                      available_now: bool = True):
    """Events dropped into ``in_path`` → one row per closed session:
    (user_id, session_start, session_end, n_events).  Watermark bounds
    state: sessions older than the watermark are emitted and dropped —
    the scale path for unbounded streams (state per ACTIVE session only,
    not per user history)."""
    raw = spark.readStream.schema(EVENT_SCHEMA).parquet(in_path)
    sess = (raw
            .withWatermark("ts", watermark)
            .groupBy(F.col("user_id"), F.session_window("ts", gap))
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events"))
    writer = (sess.writeStream
              .format("parquet")
              .option("path", out_path)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_equivalent_sessions(events: DataFrame,
                              gap_ms: int = 1_800_000) -> DataFrame:
    """Batch oracle for the streaming job: sessions via window lag (same
    construction as events_sessionize, returning per-session rows).
    session_window's end = last event + gap (half-open); timestamps keep
    full microsecond precision to match session_window's boundaries."""
    from pyspark.sql import Window as W
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = gap_ms * 1000
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    tagged = (events
              .withColumn("ts_us", tus)
              .withColumn("prev_ts", F.lag("ts_us").over(w))
              .withColumn("new_sess",
                          (F.col("prev_ts").isNull() |
                           (F.col("ts_us") - F.col("prev_ts") > gap_us))
                          .cast("int"))
              .withColumn("sess_id", F.sum("new_sess").over(
                  w.rowsBetween(W.unboundedPreceding, W.currentRow))))
    return (tagged.groupBy("user_id", "sess_id")
            .agg(F.timestamp_micros(F.min("ts_us")).alias("session_start"),
                 F.timestamp_micros(F.max("ts_us") + gap_us)
                 .alias("session_end"),
                 F.count("*").alias("n_events"))
            .drop("sess_id"))
