"""Structured Streaming operators (SURVEY.md §2.3 streaming row — absent in
the batch-only reference; first-class here).

Both operators run the parquet fixture through a REAL streaming query
(file source → watermark → stateful agg → memory sink, driven to completion
with ``processAllAvailable``) so the registry exercises the streaming
engine, not a batch re-phrasing.

Determinism: with a single source file the stream is one data micro-batch
plus a no-data finalization batch; append mode then emits exactly the
windows with ``window.end <= max(ts) - delay`` — a closed-form condition
the DuckDB oracle states directly.

At scale the same code runs on a directory of arriving files / Kafka topic;
state store + watermark semantics are unchanged.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WATERMARK = "10 minutes"
WINDOW = "5 minutes"
_query_counter = itertools.count()

_RAW_EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) as int64
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_RAW_EVENTS)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_completion(agg: DataFrame, spark: SparkSession) -> DataFrame:
    name = f"stream_out_{next(_query_counter)}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows per event_type with a 10-minute watermark;
    append mode emits only watermark-finalized windows."""
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    out = _run_to_completion(agg, spark)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n",
        "total_value",
    )


STREAM_WINDOWED_COUNTS_SQL = """
WITH b AS (
  SELECT event_type, value,
         make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS ws
  FROM events
),
mx AS (SELECT MAX(ts) AS mt FROM events)
SELECT ws                          AS window_start,
       ws + INTERVAL 5 MINUTE      AS window_end,
       event_type,
       COUNT(*)                    AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM b, mx
WHERE ws + INTERVAL 5 MINUTE <= mt - INTERVAL 10 MINUTE
GROUP BY ws, event_type
"""


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native streaming ``session_window`` (30-minute gap) per user —
    the streaming twin of operators/sessionize.py. Registered rows-only:
    the batch sessionize op is the oracle-checked formulation."""
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_completion(agg, spark)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "user_id",
        "n_events",
    )
