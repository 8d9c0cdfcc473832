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


def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest as-of join: for every purchase, the click of
    the same user with the SMALLEST |Δts| in either direction — the
    "closest reading" variant (sensor alignment, nearest-quote joins)
    that the backward (asof_purchase_click) and forward
    (asof_click_next_purchase) operators cannot express alone. Ties
    break deterministically: equal |Δts| prefers the earlier (backward)
    click, then the higher click_id — a total order, so the oracle
    replays the same winner.

    Plan: the same union-and-carry shape as the directional as-ofs, with
    BOTH directions computed in one pass — two window specs over the
    SAME user-keyed exchange (one shuffle; the second window adds only a
    re-sort). The nearest-or-equal-earlier click carries forward along
    ascending time; the strictly-later click carries backward along
    descending time; a row-local comparison of the two integer-µs deltas
    picks the winner. No join, no candidate-pair materialization —
    |events| rows through two sorts, which is the floor for this
    semantics.
    """
    e = Catalog(spark, sf_dir).table("events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_click"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_click"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # backward frame (≤): at equal ts clicks sort BEFORE the purchase
    # (is_click DESC) so a Δ=0 click is visible to the backward carry;
    # click_id ASC + last() ⇒ the highest click_id wins a same-ts tie
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("is_click"), "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward frame (strict >): descending time, purchases first at equal
    # ts (is_click ASC) so same-ts clicks stay OUT of the forward frame
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), "is_click", "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionAll(purchases).select(
        "user_id",
        "ts",
        "is_click",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(wb).alias("back_id"),
        F.last(F.when(F.col("is_click") == 1, F.unix_micros("ts")), ignorenulls=True)
        .over(wb)
        .alias("back_us"),
        F.last("click_id", ignorenulls=True).over(wf).alias("fwd_id"),
        F.last(F.when(F.col("is_click") == 1, F.unix_micros("ts")), ignorenulls=True)
        .over(wf)
        .alias("fwd_us"),
    )
    p_us = F.unix_micros("ts")
    back_d = p_us - F.col("back_us")   # ≥ 0
    fwd_d = F.col("fwd_us") - p_us     # > 0
    take_back = F.col("back_us").isNotNull() & (
        F.col("fwd_us").isNull() | (back_d <= fwd_d)
    )
    return (
        carried.filter(F.col("is_click") == 0)
        .select(
            F.col("purchase_id").alias("event_id"),
            "user_id",
            "ts",
            F.when(take_back, F.col("back_id")).otherwise(F.col("fwd_id")).alias("click_id"),
            F.when(take_back, -back_d)
            .otherwise(fwd_d)
            .cast("bigint")
            .alias("delta_us"),
        )
    )


# Explicit global-ranking oracle: |Δ| ASC, backward-preferred, click_id
# DESC — the identical total order the two carries implement. (A native
# ASOF JOIN has no bidirectional form at all.)
ASOF_NEAREST_CLICK_SQL = """
WITH c AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT p.event_id, p.user_id, p.ts,
         c.event_id AS click_id,
         c.us - p.us AS delta_us,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id
           ORDER BY ABS(c.us - p.us) ASC,
                    CASE WHEN c.us <= p.us THEN 0 ELSE 1 END ASC,
                    c.event_id DESC) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
)
SELECT event_id, user_id, ts, click_id, CAST(delta_us AS BIGINT) AS delta_us
FROM m WHERE rn = 1
UNION ALL
SELECT p.event_id, p.user_id, p.ts,
       CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS BIGINT) AS delta_us
FROM p
WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id)
"""


# Sequenced gate variant (large-SF gates only; the driver keeps the
# one-shot ranking oracle above). The one-shot's `m` CTE is purchases ×
# clicks per user — quadratic on a Zipfian user key (the sf1-Zipf gate
# measured it filling the spill disk at 547 s). This is the same
# bidirectional nearest stated as the two-carry pass the Spark plan
# uses, with the committed ranking's tie-breaks mirrored exactly:
# backward carry sees same-ts clicks (is_click DESC at equal ts),
# forward carry excludes them (is_click ASC), click_id ASC + LAST_VALUE
# realizes the event_id-DESC tie-break, and equal |Δ| prefers the
# backward side (back_d <= fwd_d). Parity vs the one-shot is pinned at
# sf0.01 and on the Zipf fixture by
# tests/test_round8_ops.py::test_asof_nearest_gate_oracle_parity.
ASOF_NEAREST_CLICK_SQL_STEPS = [
    """
WITH u AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id
  FROM events WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT user_id, ts, us, is_click, purchase_id,
         LAST_VALUE(click_id IGNORE NULLS) OVER wb AS back_id,
         LAST_VALUE(CASE WHEN is_click = 1 THEN us END IGNORE NULLS)
           OVER wb AS back_us,
         LAST_VALUE(click_id IGNORE NULLS) OVER wf AS fwd_id,
         LAST_VALUE(CASE WHEN is_click = 1 THEN us END IGNORE NULLS)
           OVER wf AS fwd_us
  FROM u
  WINDOW wb AS (PARTITION BY user_id
                ORDER BY ts ASC, is_click DESC, click_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id
                ORDER BY ts DESC, is_click ASC, click_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT purchase_id AS event_id, user_id, ts,
       CASE WHEN take_back THEN back_id ELSE fwd_id END AS click_id,
       CAST(CASE WHEN take_back THEN -(us - back_us)
                 ELSE fwd_us - us END AS BIGINT) AS delta_us
FROM (
  SELECT *, back_us IS NOT NULL
            AND (fwd_us IS NULL OR (us - back_us) <= (fwd_us - us))
            AS take_back
  FROM carried WHERE is_click = 0
)
"""
]
