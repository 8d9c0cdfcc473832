"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.3 "theta/range/as-of" row; absent in the reference, standard
in time-series engines).

Semantics here: for every ``purchase`` event, attach the latest ``click``
event of the same user with ``click.ts < purchase.ts`` (strict), left
semantics (purchases with no prior click kept with NULLs).

Spark-first formulation — the union-and-carry trick:
    union both streams with a marker → one window per user ordered by
    (ts, marker, event_id) → ``last_value(..., ignoreNulls)`` carries the
    most recent click's attributes forward → keep purchase rows.

Cost model: ONE shuffle (by user_id) + one window sort — same as any
windowed aggregation; no join at all. This beats the naive
range-join/broadcast formulations at scale and never materializes pairs.
The marker orders clicks *after* purchases within an equal timestamp so
equal-ts clicks are NOT visible to the purchase (strict inequality), and
(user_id, ts) collisions across streams stay deterministic either way.

DuckDB oracle: explicit ROW_NUMBER nearest-prior formulation pinning the
same tie-break the window implements (native ASOF JOIN is nondeterministic
when several clicks share the nearest ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog


def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("marker"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("purchase_value"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("marker"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    # marker=1 sorts purchases BEFORE the frame sees an equal-ts click?
    # No: ascending (ts, marker) puts clicks (0) first at equal ts, which
    # would violate strict '<'. rowsBetween(-inf, -1) excludes the current
    # row, and we order clicks AFTER purchases at equal ts via marker desc.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("marker"), "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = purchases.unionAll(clicks).select(
        "user_id",
        "ts",
        "marker",
        "purchase_id",
        "purchase_value",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last("click_value", ignorenulls=True).over(w).alias("last_click_value"),
    )
    return (
        carried.filter(F.col("marker") == 1)
        .select(
            F.col("purchase_id").alias("event_id"),
            "user_id",
            "ts",
            "purchase_value",
            F.col("last_click_id").alias("click_id"),
            F.col("last_click_value").alias("click_value"),
        )
    )


# Explicit ROW_NUMBER formulation, NOT DuckDB's native ASOF LEFT JOIN:
# when several clicks share the nearest ts, ASOF picks an ARBITRARY one,
# while the Spark union-and-carry deterministically keeps the highest
# click_id (window order ts ASC, click_id ASC; last() wins). The oracle
# pins the identical (ts DESC, event_id DESC) tie-break so a fixture
# regen with (user_id, ts) click duplicates cannot make the gate flaky.
ASOF_PURCHASE_CLICK_SQL = """
WITH c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
         c.event_id AS click_id, c.value AS click_value,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON p.user_id = c.user_id AND c.ts < p.ts
)
SELECT event_id, user_id, ts, purchase_value, click_id, click_value
FROM m WHERE rn = 1
UNION ALL
SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
       CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS DOUBLE) AS click_value
FROM p
WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id AND c.ts < p.ts)
"""


TOLERANCE_S = 1800  # forward attribution window: 30 minutes


def asof_click_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance (the conversion-attribution
    variant): for every click, the NEXT purchase of the same user with
    ``purchase.ts > click.ts`` — kept only when it lands within 30
    minutes, else NULLs (click didn't convert).

    Same union-and-carry shape as the backward join, run in DESCENDING
    time order so ``last(..., ignoreNulls)`` carries the nearest LATER
    purchase backward onto each click: ONE user-keyed exchange, no join,
    no pair materialization. The tolerance is a row-local post-filter
    that nulls the match — it cannot change which purchase matched, so
    semantics stay exactly "nearest, then bounded".

    DuckDB oracle: explicit ROW_NUMBER nearest-later formulation with the
    same (ts ASC, purchase_id DESC) tie-break the window implements,
    wrapped in the same tolerance CASE (native ASOF JOIN would pick an
    arbitrary row among equal-ts purchases).
    """
    e = Catalog(spark, sf_dir).table("events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("marker"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("timestamp").alias("purchase_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("marker"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    # Descending ts: the frame holds strictly-later events. At EQUAL ts a
    # purchase must NOT be visible (strict >), so clicks (marker 1) sort
    # first at a tie — the purchase lands after the click row and stays
    # out of its frame. purchase_id tie-breaks purchases deterministically.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("marker"), "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionAll(purchases).select(
        "user_id",
        "ts",
        "marker",
        "click_id",
        F.last("purchase_id", ignorenulls=True).over(w).alias("next_purchase_id"),
        F.last("purchase_ts", ignorenulls=True).over(w).alias("next_purchase_ts"),
    )
    gap = F.unix_micros(F.col("next_purchase_ts")) - F.unix_micros(F.col("ts"))
    within = gap <= TOLERANCE_S * 1_000_000
    return (
        carried.filter(F.col("marker") == 1)
        .select(
            F.col("click_id").alias("event_id"),
            "user_id",
            "ts",
            F.when(within, F.col("next_purchase_id")).alias("purchase_id"),
            F.when(within, (gap / 1_000_000).cast("decimal(18,6)").cast("double")).alias(
                "gap_s"
            ),
        )
    )


# Tie-break note: among purchases sharing the nearest later ts, the Spark
# window (ts DESC, marker DESC, purchase_id ASC; last() wins) keeps the
# HIGHEST purchase_id — hence ORDER BY p.ts ASC, p.event_id DESC here.
ASOF_CLICK_NEXT_PURCHASE_SQL = f"""
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT c.event_id, c.user_id, c.ts,
         p.event_id AS purchase_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
         ROW_NUMBER() OVER (PARTITION BY c.event_id
                            ORDER BY p.ts ASC, p.event_id DESC) AS rn
  FROM c JOIN p ON c.user_id = p.user_id AND p.ts > c.ts
)
SELECT event_id, user_id, ts,
       CASE WHEN gap_us <= {TOLERANCE_S} * 1000000 THEN purchase_id
            END AS purchase_id,
       CASE WHEN gap_us <= {TOLERANCE_S} * 1000000
            THEN CAST(CAST(gap_us / 1000000.0 AS DECIMAL(18,6)) AS DOUBLE)
            END AS gap_s
FROM m WHERE rn = 1
UNION ALL
SELECT c.event_id, c.user_id, c.ts,
       CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS DOUBLE) AS gap_s
FROM c
WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id AND p.ts > c.ts)
"""
