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


def _scd2(e: DataFrame) -> DataFrame:
    """SCD-2 compression of an event stream: validity intervals of the
    per-user ``event_type`` state (see events_scd2)."""
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
    return _scd2(Catalog(spark, sf_dir).table("events"))


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


BUCKET_US = 3_600_000_000  # 1-hour buckets


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (§2.3 windows / reshaping): every user's
    sparse event stream becomes a DENSE hourly series — missing buckets
    synthesized with zero counts — the shape dashboards, forecasting
    features, and rate alerts consume.

    Plan: per-user hour-bucket counts (one partial-aggregated shuffle),
    per-user [min, max] bucket span (same aggregate), then a map-side
    ``sequence``+``explode`` manufactures the dense axis and a left join
    fills it. The explode fan-out is bounded by the observed span per
    user, not the global calendar — a user active for a week costs 168
    rows regardless of corpus age. All integer bucket arithmetic, exact
    in any engine."""
    e = Catalog(spark, sf_dir).table("events")
    bucket = F.floor(F.unix_micros(F.col("ts")) / BUCKET_US)
    counts = (
        e.select("user_id", bucket.alias("b"))
        .groupBy("user_id", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spans = counts.groupBy("user_id").agg(
        F.min("b").alias("b_min"), F.max("b").alias("b_max")
    )
    dense = spans.select(
        "user_id", F.explode(F.sequence("b_min", "b_max")).alias("b")
    )
    return (
        dense.join(counts, ["user_id", "b"], "left")
        .select(
            "user_id",
            F.col("b").alias("bucket_hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.col("n").isNull().alias("synthesized"),
        )
    )


EVENTS_GAP_FILL_SQL = f"""
WITH counts AS (
  SELECT user_id, epoch_us(ts) // {BUCKET_US} AS b, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, MIN(b) AS b_min, MAX(b) AS b_max FROM counts GROUP BY 1
),
dense AS (
  SELECT user_id, UNNEST(generate_series(b_min, b_max)) AS b FROM spans
)
SELECT d.user_id, d.b AS bucket_hour,
       COALESCE(c.n, 0) AS n,
       c.n IS NULL AS synthesized
FROM dense d LEFT JOIN counts c ON c.user_id = d.user_id AND c.b = d.b
"""


def join_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup (§2.3 joins — the fact→SCD2 join
    every warehouse runs): for each purchase, the user's browsing state
    (SCD-2 intervals over the NON-purchase events) valid at purchase
    time — "what was the user doing when they bought". Purchases before
    any browse state keep a NULL state (left join).

    Plan: both sides are user-keyed, so this is ONE equi-join on
    user_id with the interval-containment residual
    (valid_from ≤ ts < valid_to) — per-key fan-in bounded by that
    user's interval count, co-located for free when both tables are
    bucketed by user. The anti-pattern at 100 TB is joining on the raw
    range (a broadcast nested loop over corpus-sized sides); keying by
    the dimension's natural key keeps the shuffle hash-partitioned.
    Intervals partition each user's timeline (half-open, abutting), so
    at most one dimension row matches — row count is exactly the fact
    count, pinned by the oracle."""
    e = Catalog(spark, sf_dir).table("events")
    dim = _scd2(e.filter(F.col("event_type") != "purchase")).alias("d")
    fact = (
        e.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .alias("f")
    )
    cond = (
        (F.col("f.user_id") == F.col("d.user_id"))
        & (F.col("d.valid_from") <= F.col("f.ts"))
        & (F.col("d.valid_to").isNull() | (F.col("f.ts") < F.col("d.valid_to")))
    )
    return fact.join(dim, cond, "left").select(
        "f.event_id",
        F.col("f.user_id").alias("user_id"),
        "f.ts",
        F.col("d.event_type").alias("state_at_purchase"),
        F.col("d.valid_from").alias("state_since"),
    )


JOIN_SCD2_LOOKUP_SQL = """
WITH browse AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE event_type <> 'purchase'
),
marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM browse
),
changed AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, event_type,
         ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changed
)
SELECT f.event_id, f.user_id, f.ts,
       d.event_type AS state_at_purchase,
       d.valid_from AS state_since
FROM events f
LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from <= f.ts
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
WHERE f.event_type = 'purchase'
"""
