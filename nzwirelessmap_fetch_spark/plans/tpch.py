"""Classic TPC-H analytics queries adapted to the fixture schema.

The reference (fetch.go:222) answers its query surface through SQLite —
an analytics user of that stack runs exactly this class of multi-join
aggregate queries. ``agg_pricing_summary`` (plans/relational.py:35)
already holds the Q1 shape; this module adds the other canonical plans:
shipping priority (Q3), local-supplier volume (Q5), revenue-change
forecast (Q6), returned items (Q10), promotion effect (Q14) and
large-volume customers (Q18), each adapted to the trimmed fixture
columns (no ship-mode / commit-date / address columns exist, so the
predicates use the columns that do).

Cross-engine discipline (see plans/relational.py header): every revenue
aggregate is SUM over ``decimal(18,2)`` products — exact, order-free —
cast to double only at the end; every top-k ORDER BY carries a unique
key suffix so the LIMIT boundary is deterministic on both engines.

Scale notes per query are in the docstrings; the common theme is that
every dimension-side input is either filter-reduced before the join
(Catalyst pushes the predicate below the exchange) or broadcast-sized
(region/nation), so the only data-sized shuffles are the ones keyed by
the aggregate's own grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from .relational import _dec


def _revenue() -> F.Column:
    one = F.lit(1).cast("decimal(18,2)")
    return F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))


_REV_SQL = (
    "SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))"
)


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one market segment.

    Plan shape: customer is filter-reduced to one segment (~20% of an
    already 1:10-of-orders table) before the join, so AQE broadcasts it;
    orders is date-filtered at the scan (pushed predicate); the only
    data-sized shuffle is lineitem ⋈ orders on l_orderkey followed by
    the groupBy on the same key — Catalyst reuses the exchange, so the
    aggregate adds no second shuffle. Top-10 is a TakeOrdered, not a
    global sort.
    """
    c = Catalog(spark, sf_dir)
    cust = c.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.to_timestamp(F.lit("1997-03-15"))
    orders = c.table("orders").filter(F.col("o_orderdate") < cutoff)
    li = c.table("lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


TPCH_Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where supplier and customer share the
    nation, one region, one year of orders.

    Plan shape: region→nation is a broadcast chain (25 rows); the
    c_nationkey = s_nationkey "local" predicate rides the join ON
    clause, not a post-filter, so Catalyst evaluates it inside the
    supplier join before the aggregate. Data-sized shuffles: orders ⋈
    customer on custkey, lineitem ⋈ orders on orderkey, lineitem ⋈
    supplier on suppkey — each keyed by a natural join key; the final
    groupBy(n_name) moves 5 rows per partition (map-side combine).
    """
    c = Catalog(spark, sf_dir)
    nat = (
        c.table("nation")
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    cust = c.table("customer")
    orders = c.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = c.table("lineitem")
    sup = c.table("supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


TPCH_Q5_SQL = f"""
SELECT n_name, CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue change from eliminating a discount band.

    Plan shape: single scan-filter-aggregate — all three predicates push
    to the parquet scan, the global SUM is a two-phase partial agg (one
    row per partition crosses the wire). The archetypal 100 TB-friendly
    query: cost is the scan, nothing else.

    Double-vs-decimal literal care: DuckDB parses a bare ``0.03`` as
    DECIMAL — both sides pin the band literals to DOUBLE so the
    comparisons are the identical IEEE compares on both engines.
    """
    li = Catalog(spark, sf_dir).table("lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= F.lit(0.03))
            & (F.col("l_discount") <= F.lit(0.05))
            & (F.col("l_quantity") < F.lit(24.0))
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCH_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= CAST(0.03 AS DOUBLE)
  AND l_discount <= CAST(0.05 AS DOUBLE)
  AND l_quantity <  CAST(24 AS DOUBLE)
"""


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a quarter.

    Plan shape: orders is quarter-filtered at the scan; lineitem is
    returnflag-filtered at the scan; nation broadcasts. The grouping key
    is the customer, so the one unavoidable data shuffle is the
    re-key from l_orderkey to c_custkey; top-20 is a TakeOrdered.
    """
    c = Catalog(spark, sf_dir)
    cust = c.table("customer")
    orders = c.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    li = c.table("lineitem").filter(F.col("l_returnflag") == "R")
    nat = c.table("nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promotional parts.

    Plan shape: lineitem month-filtered at the scan, part joined on
    partkey (the one shuffle — at 100 TB part is bucketable on p_partkey
    to make it co-located), conditional aggregate in a single pass. The
    final ratio divides two doubles that are each exact decimal sums, so
    the division is the same single IEEE op on both engines.

    Fixture note: fixture ``p_type`` is the bare family token (PROMO /
    STANDARD / …), so the predicate is equality, not LIKE 'PROMO%'.
    """
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    part = c.table("part").select("p_partkey", "p_type")
    one = F.lit(1).cast("decimal(18,2)")
    disc = _dec("l_extendedprice") * (one - _dec("l_discount"))
    # the ELSE arm is 0·1 in the same decimal product type as `disc`, so
    # the CASE needs no cross-engine type coercion (both engines resolve
    # the branch type to the exact decimal product)
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,2)") * one
    )
    out = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
        )
    )
    return out.select(
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias("promo_pct"),
        "promo_revenue",
        "total_revenue",
    )


TPCH_Q14_SQL = f"""
WITH s AS (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) * CAST(1 AS DECIMAL(18,2)) END)
              AS DOUBLE) AS promo_revenue,
         CAST({_REV_SQL} AS DOUBLE) AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
)
SELECT CAST(100 AS DOUBLE) * promo_revenue / total_revenue AS promo_pct,
       promo_revenue, total_revenue
FROM s
"""


def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers who placed single orders above a quantity cap.

    Plan shape: the HAVING subquery is a lineitem groupBy(l_orderkey) —
    partial-agg map-side, then the surviving keys (a tiny set: quantity
    > 300 is the extreme tail) drive a broadcast-able semi filter into
    orders; customer joins after the orders row set has already
    collapsed. The big table is touched once.
    """
    c = Catalog(spark, sf_dir)
    big = (
        c.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > F.lit(300).cast("decimal(18,2)"))
        .select(
            F.col("l_orderkey").alias("bigkey"),
            F.col("sum_qty_dec").cast("double").alias("total_qty"),
        )
    )
    orders = c.table("orders")
    cust = c.table("customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == F.col("bigkey"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


TPCH_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey AS bigkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(300 AS DECIMAL(18,2))
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN big      ON o_orderkey = bigkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""
