"""Classic TPC-H analytics queries adapted to the fixture schema.

The reference (fetch.go:222) answers its query surface through SQLite —
an analytics user of that stack runs exactly this class of multi-join
aggregate queries. ``agg_pricing_summary`` (plans/relational.py:35)
already holds the Q1 shape; this module adds the other 21 canonical
plans (Q2–Q22), each adapted to the trimmed fixture columns: no
ship-mode / commit-date / address columns exist, so the predicates use
the columns that do, and the partsupp-dependent queries (Q2, Q9, Q11,
Q16, Q20) derive their (part, supplier) bridge from lineitem — the
join/subquery SHAPES (correlated scalar MIN, EXISTS / NOT EXISTS,
HAVING-vs-scalar-subquery, NOT IN, nested IN) are preserved exactly.

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


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year, both
    directions (supplier nation ≠ customer nation).

    Plan shape: nation broadcasts TWICE under different roles (the
    flagship's double-role dim pattern); the (n1, n2) direction pair
    rides the join output, so the groupBy is a tiny keyed agg. The OR of
    the two direction tuples is evaluated inside the join, not as a
    post-filter union — one pass over lineitem.
    """
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    n1 = c.table("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = c.table("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10")
    rpair = (F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9")
    return (
        li.join(c.table("orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(c.table("supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_revenue().cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


TPCH_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       CAST({_REV_SQL} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_9'  AND n2.n_name = 'NATION_10')
    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's revenue in one part
    segment, by order year.

    Plan shape: the share is a conditional-sum / total-sum ratio inside
    ONE aggregate pass (no self-join of the yearly table); part is
    filter-reduced before the join and nation/region broadcast. Both
    sums are exact decimals; the final division is one shared IEEE op.
    """
    c = Catalog(spark, sf_dir)
    part = c.table("part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    nat_r = (
        c.table("nation")
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("cnat_key"))
    )
    n2 = c.table("nation").select(
        F.col("n_nationkey").alias("snat_key"), F.col("n_name").alias("supp_nation")
    )
    li = c.table("lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    vol = _dec("l_extendedprice") * (one - _dec("l_discount"))
    brazil_vol = F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(
        F.lit(0).cast("decimal(18,2)") * one
    )
    return (
        li.join(part, li.l_partkey == F.col("p_partkey"))
        .join(c.table("orders"), li.l_orderkey == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
        )
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat_r), F.col("c_nationkey") == F.col("cnat_key"))
        .join(c.table("supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("snat_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(brazil_vol).cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
            "nation_volume",
            "total_volume",
        )
        .orderBy("o_year")
    )


TPCH_Q8_SQL = f"""
WITH y AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_9'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) * CAST(1 AS DECIMAL(18,2)) END)
              AS DOUBLE) AS nation_volume,
         CAST({_REV_SQL} AS DOUBLE) AS total_volume
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY YEAR(o_orderdate)
)
SELECT o_year, nation_volume / total_volume AS mkt_share,
       nation_volume, total_volume
FROM y ORDER BY o_year
"""


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count — INCLUDING
    zero-order customers, which forces the left outer join.

    Plan shape: customer LEFT JOIN orders on custkey (one keyed
    shuffle), count per customer (same key — exchange reuse), then the
    histogram agg is grouping-key-sized. The outer join is the point:
    an inner join silently drops the c_count = 0 bucket.
    """
    c = Catalog(spark, sf_dir)
    cust = c.table("customer").select("c_custkey")
    orders = c.table("orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


TPCH_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    Plan shape: the revenue "view" is one keyed agg over the quarter's
    lineitem; the max is a 1-row broadcast joined back (the argmax
    pattern without a window over the whole table); supplier attaches
    only to the surviving key(s). Exact-decimal revenue makes the
    equality-with-max comparison safe cross-engine.
    """
    c = Catalog(spark, sf_dir)
    rev = (
        c.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_revenue().alias("total_rev_dec"))
    )
    mx = rev.agg(F.max("total_rev_dec").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev_dec == F.col("mx"))
        .join(c.table("supplier"), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TPCH_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
FROM rev
JOIN supplier ON supplier_no = s_suppkey
WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
ORDER BY s_suppkey
"""


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders of less than 20% of a part's
    average quantity — the correlated-subquery classic.

    Plan shape: the correlation decorrelates into a per-part average
    (one keyed agg over lineitem) joined back on l_partkey — the big
    table is read twice but shuffled on the same key both times, and
    the second read's scan prunes to 3 columns. The 0.2·avg threshold
    stays in exact decimal arithmetic: avg = sum/count is replaced by
    the integer-safe cross-multiplied comparison
    5 · qty · n < sum  (both sides exact decimals — no division at all).
    """
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem")
    brand = c.table("part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"),
        F.count(F.lit(1)).alias("nq"),
    )
    return (
        li.join(F.broadcast(brand), li.l_partkey == F.col("p_partkey"))
        .join(per_part, li.l_partkey == F.col("pk"))
        .filter(
            _dec("l_quantity") * F.lit(5).cast("decimal(18,0)") * F.col("nq")
            < F.col("sq")
        )
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCH_Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         COUNT(*) AS nq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = pk
WHERE p_brand = 'Brand#23'
  AND CAST(l_quantity AS DECIMAL(18,2)) * CAST(5 AS DECIMAL(18,0)) * nq < sq
"""


def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three disjunctive brand/size/quantity
    boxes — the OR-of-ANDs predicate that tests disjunction pushdown.

    Plan shape: the whole disjunction references only lineitem+part
    columns, so Catalyst evaluates it inside the joined stage with the
    part-side conjuncts (brand IN, size bounds) pushed to the part scan
    as a derived common filter. One join, one scalar agg.
    """
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem")
    part = c.table("part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    box1 = (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5)) & (q >= 1) & (q <= 11)
    box2 = (F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10)) & (q >= 10) & (q <= 20)
    box3 = (F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 15)) & (q >= 20) & (q <= 30)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(box1 | box2 | box3)
        .agg(
            _revenue().cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCH_Q19_SQL = f"""
SELECT CAST({_REV_SQL} AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: positive-balance customers who never ordered, grouped
    recently — anti-join + above-average correlated filter, grouped by
    nation ("lapsed high-balance accounts": the fixture has orders for
    every customer, so the window makes the anti-join population real).

    Plan shape: the average balance is a 1-row broadcast; the anti-join
    LEFT ANTI on o_custkey collapses orders to its distinct key set
    map-side (Spark builds only keys for anti joins); nation broadcasts
    for the label. Fixture adaptation: the original groups by phone
    country code — the fixture has no phone, so the nation key plays
    that role.
    """
    c = Catalog(spark, sf_dir)
    cust = c.table("customer")
    # above-average test without a float average: dec(bal)·n > Σdec(bal)
    # — every term exact, so the boundary cannot drift cross-engine
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec("c_acctbal")).alias("sb"),
        F.count(F.lit(1)).alias("nb"),
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(_dec("c_acctbal") * F.col("nb") > F.col("sb"))
        .join(
            c.table("orders").filter(
                F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
            ),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(c.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


TPCH_Q22_SQL = """
WITH ab AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sb, COUNT(*) AS nb
  FROM customer WHERE c_acctbal > CAST(0 AS DOUBLE)
)
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
CROSS JOIN ab
JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * nb > sb
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name
ORDER BY n_name
"""

def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking — orders in one quarter where at
    least one lineitem shipped late, counted per priority.

    Fixture adaptation: no l_commitdate / l_receiptdate columns exist, so
    "late" is l_shipdate more than 30 days after o_orderdate — the same
    correlated-EXISTS shape (the inner predicate references BOTH sides).

    Plan shape: the EXISTS decorrelates to a LEFT SEMI join on
    l_orderkey with the lateness inequality riding the join condition —
    hash-semi on the equi key, the non-equi conjunct applied inside the
    join (no post-filter pass over a full inner join's fan-out, and
    lineitem never duplicates order rows). Orders is quarter-filtered at
    the scan; the final groupBy holds 5 priority rows.
    """
    c = Catalog(spark, sf_dir)
    orders = c.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    li = c.table("lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def tpch_q12_late_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: per ship-mode, how many critical vs non-critical orders
    shipped in a year — the conditional-count join.

    Fixture adaptation: no l_shipmode column; l_returnflag ∈ {A,N,R}
    plays the mode role (two values selected, as the original picks two
    modes). The aggregate is the Q12 signature: CASE on the ORDER side's
    priority inside a SUM grouped by the LINEITEM side's attribute.

    Plan shape: lineitem is date+flag filtered at the scan, one keyed
    join to orders on orderkey, two conditional counts in a single
    partial-aggregated pass; output is 2 rows.
    """
    c = Catalog(spark, sf_dir)
    li = c.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & F.col("l_returnflag").isin("A", "R")
    )
    orders = c.table("orders").select("o_orderkey", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_flag"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_flag")
    )


TPCH_Q12_SQL = """
SELECT l_returnflag AS ship_flag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag IN ('A', 'R')
GROUP BY l_returnflag
ORDER BY ship_flag
"""


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each qualifying part, the supplier(s) offering it at
    the minimum cost within one region — the correlated-scalar-MIN
    classic.

    Fixture adaptation: no partsupp table; the (part, supplier) bridge
    derives from lineitem with cost = MIN observed extendedprice per
    pair (exact decimal, so the min-equality join-back cannot drift
    cross-engine).

    Plan shape: the correlated subquery decorrelates into a per-part MIN
    over the region-filtered bridge, joined back by (partkey, exact
    decimal cost equality). Region→nation→supplier is a broadcast-sized
    reduction applied BEFORE the min (matching the original semantics:
    the min ranges over the region only). Part's size/type filters push
    to its scan. The ORDER BY carries the unique (s_name, p_partkey)
    suffix so LIMIT is deterministic.
    """
    c = Catalog(spark, sf_dir)
    ps = (
        c.table("lineitem")
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min(_dec("l_extendedprice")).alias("cost"))
    )
    eu_sup = (
        c.table("supplier")
        .join(F.broadcast(c.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eps = ps.join(eu_sup, ps.sk == F.col("s_suppkey"))
    mn = eps.groupBy("pk").agg(F.min("cost").alias("mincost"))
    parts = c.table("part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        eps.join(mn, "pk")
        .filter(F.col("cost") == F.col("mincost"))
        .join(parts, F.col("pk") == parts.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


TPCH_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
  FROM lineitem GROUP BY 1, 2
),
eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
eps AS (SELECT ps.*, s_name, s_acctbal, n_name FROM ps JOIN eu_sup ON sk = s_suppkey),
mn AS (SELECT pk, MIN(cost) AS mincost FROM eps GROUP BY pk)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(cost AS DOUBLE) AS supply_cost
FROM eps
JOIN mn USING (pk)
JOIN part ON pk = p_partkey
WHERE cost = mincost AND p_size = 15 AND p_type = 'STANDARD'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on one product family, by supplier nation and
    order year.

    Fixture adaptation: no ps_supplycost; the cost term is
    l_quantity · p_retailprice (part joins anyway for the name filter,
    so the cost column rides the same broadcast). Profit stays an exact
    decimal expression end-to-end: both products are scale-4 decimals,
    the difference and SUM are exact, one final cast to double.

    Plan shape: part is name-filtered before its join (the filter prunes
    the join's build side); nation broadcasts; the groupBy is
    (nation, year) — tiny. The only data-sized shuffles are the three
    natural-key joins on lineitem.
    """
    c = Catalog(spark, sf_dir)
    part = (
        c.table("part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = c.table("lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    amount = _dec("l_extendedprice") * (one - _dec("l_discount")) - _dec(
        "l_quantity"
    ) * _dec("p_retailprice")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(c.table("orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(c.table("supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(c.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


TPCH_Q9_SQL = """
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts representing an above-threshold share of one
    nation's inventory value — the HAVING-against-a-scalar-subquery
    shape.

    Fixture adaptation: no partsupp; "inventory value" per part is the
    SUM of extendedprice over lineitem rows supplied by the nation's
    suppliers, and the threshold is the mean part value (the original's
    0.0001·total), expressed as the integer-exact cross-multiplied
    compare  value · n_parts > total  — no float division anywhere.

    Plan shape: supplier collapses to one nation's key set (broadcast);
    one keyed agg over the filtered lineitem; the scalar total is a
    1-row broadcast joined to every group — the same single-pass
    decorrelation DuckDB plans for the subquery.
    """
    c = Catalog(spark, sf_dir)
    nat_sup = (
        c.table("supplier")
        .join(F.broadcast(c.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    li = c.table("lineitem").join(
        F.broadcast(nat_sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(_dec("l_extendedprice")).alias("value_dec")
    )
    tot = per_part.agg(
        F.sum("value_dec").alias("total_dec"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(tot))
        .filter(F.col("value_dec") * F.col("n_parts") > F.col("total_dec"))
        .select("part_key", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "part_key")
        .limit(100)
    )


TPCH_Q11_SQL = """
WITH pv AS (
  SELECT l_partkey AS part_key,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
),
tot AS (SELECT SUM(value_dec) AS total_dec, COUNT(*) AS n_parts FROM pv)
SELECT part_key, CAST(value_dec AS DOUBLE) AS part_value
FROM pv CROSS JOIN tot
WHERE value_dec * n_parts > total_dec
ORDER BY part_value DESC, part_key
LIMIT 100
"""


def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers can furnish parts of each
    (brand, type, size) — with a NOT-IN supplier exclusion list.

    Fixture adaptation: the (part, supplier) bridge derives from
    lineitem DISTINCT pairs; the "complaints" exclusion is s_name LIKE
    '%77%' (the original's LIKE '%Customer%Complaints%' against comment
    text, which the fixture lacks).

    Plan shape: the NOT IN becomes a LEFT ANTI join against the
    broadcast-sized exclusion key set (safe here because s_suppkey is
    non-null — the NOT IN null trap does not arise, which the oracle's
    literal NOT IN confirms); the bridge dedups map-side before the part
    join; COUNT(DISTINCT) runs as Spark's two-phase expand.
    """
    c = Catalog(spark, sf_dir)
    bridge = (
        c.table("lineitem").select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
    ).distinct()
    excl = c.table("supplier").filter(F.col("s_name").like("%77%")).select(
        F.col("s_suppkey").alias("bad_sk")
    )
    parts = c.table("part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 23, 45, 49)
    )
    return (
        bridge.join(F.broadcast(excl), bridge.sk == F.col("bad_sk"), "left_anti")
        .join(parts, F.col("pk") == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sk").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


TPCH_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT sk) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) bridge
JOIN part ON pk = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 23, 45, 49)
  AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one region holding significant stock of a
    part family — the nested-IN (IN of a GROUP BY of an IN) shape.

    Fixture adaptation: no ps_availqty; "significant" is a shipped-
    quantity sum above a constant over one year (the original compares
    to 0.5·availqty). Both the part-name IN and the qty-HAVING IN
    decorrelate to semi joins.

    Plan shape: part prefix-filter → broadcast semi into lineitem; one
    keyed agg per (supp, part); HAVING on the exact decimal sum; the
    surviving supplier key set semi-joins into the nation-filtered
    supplier dim. Every reduction happens before the next join.
    """
    c = Catalog(spark, sf_dir)
    red_parts = (
        c.table("part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    li = c.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    qual = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(30).cast("decimal(18,2)"))
        .select(F.col("l_suppkey").alias("qual_sk"))
        .distinct()
    )
    return (
        c.table("supplier")
        .join(F.broadcast(c.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .join(qual, F.col("s_suppkey") == F.col("qual_sk"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


TPCH_Q20_SQL = """
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(30 AS DECIMAL(18,2))
  )
ORDER BY s_name
"""


def tpch_q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers in one region who were the ONLY late supplier
    on a finished multi-supplier order — the EXISTS + NOT-EXISTS double
    correlation.

    Fixture adaptation: "late" is l_shipdate > o_orderdate + 30 days (no
    receipt/commit dates), so the order's date rides with the l1 rows
    and the NOT-EXISTS side recomputes it by joining orders once.

    Plan shape: both correlations decorrelate to one LEFT SEMI and one
    LEFT ANTI join on l_orderkey with the supplier-inequality conjunct
    inside the join condition (hash on the equi key; no fan-out
    materialized). The anti side is pre-reduced to LATE lines only —
    the smallest set that proves the order had another late supplier.
    """
    c = Catalog(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    nat_sup = (
        c.table("supplier")
        .join(F.broadcast(c.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name")
    )
    ordersF = (
        c.table("orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = c.table("lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    l1 = (
        li.join(ordersF, li.l_orderkey == F.col("o_orderkey"))
        .filter(late)
        .join(F.broadcast(nat_sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        li.join(ordersF, li.l_orderkey == F.col("o_orderkey"))
        .filter(late)
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    return (
        l1.join(
            l2, (l1.l_orderkey == F.col("k2")) & (l1.l_suppkey != F.col("s2")), "left_semi"
        )
        .join(
            l3, (l1.l_orderkey == F.col("k3")) & (l1.l_suppkey != F.col("s3")), "left_anti"
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


TPCH_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
  AND r_name = 'EUROPE'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""
