"""Gap-based sessionization over the events stream (batch form).

Classic lag-and-cumsum: a new session starts when the gap to the previous
event of the same user exceeds 30 minutes. One shuffle (by user_id) + one
window sort; the session aggregate reuses the same partitioning, so
Catalyst schedules it without a second exchange.

The streaming twin is ``F.session_window`` (streaming/events_stream.py);
this batch formulation is the oracle-checkable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, microsecond precision


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    sessions = e.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


SESSIONIZE_SQL = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
marked AS (
  SELECT user_id, event_id, ts, value,
         SUM(CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_US} THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM gaps
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*)  AS n_events,
       MIN(ts)   AS session_start,
       MAX(ts)   AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM marked
GROUP BY user_id, session_idx
"""


def events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build (§2.3 incremental, the
    temporal-table sibling of merge_upsert): compress each user's event
    stream into validity intervals of their ``event_type`` state — a row
    survives only when the state CHANGES, and carries
    [valid_from, valid_to) with an open (NULL) end on the current state.

    Same physical shape as sessionize: ONE shuffle (by user), two window
    passes over the same sort (lag to detect change, lead for the closing
    timestamp — Catalyst reuses the exchange+sort). This is how a 100 TB
    event log becomes a point-in-time-joinable dimension table."""
    e = Catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changed.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


EVENTS_SCD2_SQL = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changed AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM changed
"""
