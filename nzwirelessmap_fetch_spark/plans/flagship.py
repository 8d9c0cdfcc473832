"""Flagship query: the point-to-point-links shape on the fixture schema.

The reference's one relational query (select_point_to_point_links.sql:5-79)
is a 9-relation-instance inner equi-join with a double-role dimension
(``location`` / ``geographicreference`` each joined twice as rx/tx —
sql:52-55), constant-equality / case-insensitive-LIKE-prefix / inequality
filters (sql:64-78), ``trim()`` cleanup (sql:12-47) and an 11-column aliased
projection (sql:10-41). FIXTURES.md §B maps that operator shape onto the
driver's TPC-H-ish tables:

    lineitem ⋈ orders ⋈ customer ⋈ part ⋈ supplier
             ⋈ nation AS c_nation  (rx-role dimension)
             ⋈ nation AS s_nation  (tx-role dimension)
             ⋈ region (via c_nation)

Column mapping to the reference output (sql:10-41):
    link_id←licenceid, client_name←clientname, order_priority←licencetype,
    price←frequency, quantity←power, tx_name/tx_lng←tx_name/tx_lng,
    rx_name/rx_lng←rx_name/rx_lng, region_name+part_brand←(extra dims).

Physical strategy at 100 TB: ``lineitem`` (the fact) is the only huge
relation. ``orders`` is fact-sized too — that join shuffles on the order
key (co-located for free if both are bucketed by order key, see
sinks/writers). Every other relation is a dimension that grows sublinearly,
so all five dimension joins are explicit broadcasts: one shuffle total in
the whole plan. The three filters sit directly on scan columns and push
down to parquet row-group pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.compat import sqlite_like

# 11 output columns, mirroring select_point_to_point_links.sql:10-41.
OUTPUT_COLUMNS = (
    "link_id",
    "client_name",
    "order_priority",
    "price",
    "quantity",
    "tx_name",
    "tx_lng",
    "rx_name",
    "rx_lng",
    "region_name",
    "part_brand",
)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form. Equivalent SQL form in :data:`FLAGSHIP_ORACLE_SQL`."""
    cat = Catalog(spark, sf_dir)
    lineitem = cat.table("lineitem")
    orders = cat.table("orders")
    customer = cat.table("customer")
    part = cat.table("part")
    supplier = cat.table("supplier")
    nation = cat.table("nation")
    region = cat.table("region")

    # Double-role dimension (reference: location/georef joined twice as
    # rx/tx, sql:52-55). Alias hygiene per SURVEY.md §7.4.5: qualified cols.
    c_nation = nation.alias("c_nation")
    s_nation = nation.alias("s_nation")

    joined = (
        lineitem
        # fact-fact join: shuffles on the order key (bucketable at scale)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        # dimension joins: all broadcast — no extra shuffles
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(c_nation),
            customer.c_nationkey == F.col("c_nation.n_nationkey"),
        )
        .join(
            F.broadcast(s_nation),
            supplier.s_nationkey == F.col("s_nation.n_nationkey"),
        )
        .join(F.broadcast(region), F.col("c_nation.n_regionkey") == region.r_regionkey)
    )

    filtered = joined.filter(
        (orders.o_orderstatus == "F")  # analog of georeferencetypeid = 3
        & sqlite_like(part.p_type, "S%")  # analog of licencecode LIKE 'F%'
        & (lineitem.l_discount != 0)  # analog of northing != 0
    )

    return filtered.select(
        lineitem.l_orderkey.alias("link_id"),
        F.trim(customer.c_name).alias("client_name"),
        F.trim(orders.o_orderpriority).alias("order_priority"),
        lineitem.l_extendedprice.alias("price"),
        lineitem.l_quantity.alias("quantity"),
        F.trim(F.col("s_nation.n_name")).alias("tx_name"),
        supplier.s_acctbal.alias("tx_lng"),
        F.trim(F.col("c_nation.n_name")).alias("rx_name"),
        customer.c_acctbal.alias("rx_lng"),
        F.trim(region.r_name).alias("region_name"),
        part.p_brand.alias("part_brand"),
    )


# ANSI form of the same plan; runnable by DuckDB (oracle) and Spark SQL.
FLAGSHIP_ORACLE_SQL = """
SELECT
    l.l_orderkey                AS link_id,
    trim(c.c_name)              AS client_name,
    trim(o.o_orderpriority)     AS order_priority,
    l.l_extendedprice           AS price,
    l.l_quantity                AS quantity,
    trim(s_nation.n_name)       AS tx_name,
    s.s_acctbal                 AS tx_lng,
    trim(c_nation.n_name)       AS rx_name,
    c.c_acctbal                 AS rx_lng,
    trim(r.r_name)              AS region_name,
    p.p_brand                   AS part_brand
FROM lineitem l
JOIN orders   o        ON l.l_orderkey = o.o_orderkey
JOIN customer c        ON o.o_custkey  = c.c_custkey
JOIN part     p        ON l.l_partkey  = p.p_partkey
JOIN supplier s        ON l.l_suppkey  = s.s_suppkey
JOIN nation   c_nation ON c.c_nationkey = c_nation.n_nationkey
JOIN nation   s_nation ON s.s_nationkey = s_nation.n_nationkey
JOIN region   r        ON c_nation.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
  AND p.p_type ILIKE 'S%'
  AND l.l_discount <> 0
"""


LINK_LENGTH_BUCKET = 500.0  # histogram bucket width in coordinate units


def p2p_link_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-length distribution over the flagship's point-to-point
    links — the first analytic downstream of the reference's map plot
    (README: "find the pairs of towers ... so we can plot them on a
    map"; link length IS the line being drawn). Per histogram bucket of
    Euclidean length: link count and min/max/total length.

    Coordinate mapping extends FIXTURES.md §B one step: the fixture's
    tx/rx longitudes (acctbal proxies) are the x-axis; the y-axis pairs
    ``price/100`` (tx) against ``quantity*10`` (rx) — same stand-in
    discipline as the flagship's own column map. Euclidean, not
    haversine, because the reference's easting/northing are PROJECTED
    coordinates (select_point_to_point_links.sql:30-31 — NZTM-style
    grid meters, where straight-line distance is the right measure) and
    because sqrt is the one IEEE-correctly-rounded nonlinear op both
    engines pin bit-for-bit (ln/pow are not, ROADMAP invariants).

    One aggregation over the flagship join — the bucket key is
    low-cardinality, so the partial aggregate collapses map-side and
    the shuffle is bucket-count-sized at any corpus scale.
    """
    df = flagship(spark, sf_dir)
    dx = F.col("tx_lng") - F.col("rx_lng")
    dy = F.col("price") / 100.0 - F.col("quantity") * 10.0
    length = F.sqrt(dx * dx + dy * dy)
    len_cents = F.floor(length * 100).cast("long")
    return (
        df.select(
            F.floor(length / F.lit(LINK_LENGTH_BUCKET)).cast("long").alias("bucket"),
            len_cents.alias("len_cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_links"),
            F.min("len_cents").alias("min_len_cents"),
            F.max("len_cents").alias("max_len_cents"),
            F.sum("len_cents").alias("total_len_cents"),
        )
    )


P2P_LINK_LENGTHS_SQL = f"""
WITH links AS ({FLAGSHIP_ORACLE_SQL}),
measured AS (
  SELECT CAST(FLOOR(SQRT((tx_lng - rx_lng) * (tx_lng - rx_lng)
                         + (price / CAST(100.0 AS DOUBLE) - quantity * CAST(10.0 AS DOUBLE))
                           * (price / CAST(100.0 AS DOUBLE) - quantity * CAST(10.0 AS DOUBLE)))
                    / {LINK_LENGTH_BUCKET}) AS BIGINT) AS bucket,
         CAST(FLOOR(SQRT((tx_lng - rx_lng) * (tx_lng - rx_lng)
                         + (price / CAST(100.0 AS DOUBLE) - quantity * CAST(10.0 AS DOUBLE))
                           * (price / CAST(100.0 AS DOUBLE) - quantity * CAST(10.0 AS DOUBLE)))
                    * 100) AS BIGINT) AS len_cents
  FROM links
)
SELECT bucket,
       COUNT(*) AS n_links,
       CAST(MIN(len_cents) AS BIGINT) AS min_len_cents,
       CAST(MAX(len_cents) AS BIGINT) AS max_len_cents,
       CAST(SUM(len_cents) AS BIGINT) AS total_len_cents
FROM measured
GROUP BY bucket
"""


# ─── Spatial grid neighbor join (round 5) ───────────────────────────────────

GRID_R_CENTS = 200_000  # radius: 2000 coordinate units, in cents


def geo_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join over tower coordinates via GRID-CELL BUCKETING —
    the spatial member of the bounded-candidate-generation family (the
    reference's whole point is a map of towers; "which towers sit within
    interference range of each other" is the spatial query its data
    invites). All-pairs distance is Θ(n²); quantizing points to
    R-sized grid cells and probing each point's 3×3 cell stencil bounds
    candidates to the 9 cells that can POSSIBLY hold a within-R
    neighbor — the spatial analog of LSH banding, and the exact plan
    (cell side = R ⇒ no within-R pair spans beyond adjacent cells; the
    distance verify drops false candidates).

    Tower stand-ins (FIXTURES.md discipline): suppliers, with
    x = acctbal-cents and y = a key-derived spread — both
    integer-exact, so candidate generation and the squared-distance
    verify never touch a float; only the reported distance takes one
    IEEE-exact sqrt.

    Plan: 9× map-side stencil explode on the probe side (bounded), one
    cell-keyed equi-join, row-local integer verify. At 100 TB this is
    the standard spatial-join recipe (geohash/S2 bucketing); skewed
    cells (dense cities) AQE-split like any hot key."""
    s = Catalog(spark, sf_dir).table("supplier")
    pts = s.select(
        F.col("s_suppkey").alias("id"),
        # +100000 shifts x non-negative (acctbal ≥ -999.99): floor-vs-
        # truncate integer-division semantics never diverge across engines
        ((F.col("s_acctbal").cast("decimal(18,2)") * 100).cast("long") + 100_000)
        .alias("x"),
        ((F.col("s_suppkey") * 104729) % 1_000_000).cast("long").alias("y"),
    )
    r = F.lit(GRID_R_CENTS)
    cell = lambda c: F.floor(F.col(c) / r).cast("long")  # noqa: E731
    # probe side: each point explodes to its 3×3 neighborhood stencil
    probes = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx -> "
                f"transform(sequence(-1, 1), dy -> "
                f"struct(floor(x / {GRID_R_CENTS}) + dx as cx, "
                f"floor(y / {GRID_R_CENTS}) + dy as cy))))"
            )
        ).alias("cell"),
    ).select("id_a", "xa", "ya", "cell.cx", "cell.cy")
    index = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        cell("x").alias("cx"),
        cell("y").alias("cy"),
    )
    # long-typed squared distance (** is float pow; integer multiply
    # keeps the verify exact and the python-side constant is a LongType
    # literal — an int32 lit would overflow at R²=4e10)
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    return (
        probes.join(index, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("d2", (dx * dx + dy * dy).cast("long"))
        .filter(F.col("d2") <= F.lit(GRID_R_CENTS * GRID_R_CENTS))
        .select(
            "id_a",
            "id_b",
            F.floor(F.sqrt(F.col("d2").cast("double"))).cast("long").alias(
                "dist_cents"
            ),
        )
    )


GEO_GRID_NEIGHBOR_JOIN_SQL = f"""
WITH pts AS (
  SELECT s_suppkey AS id,
         CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000 AS x,
         (s_suppkey * 104729) % 1000000 AS y
  FROM supplier
),
probes AS (
  SELECT id AS id_a, x AS xa, y AS ya,
         (x // {GRID_R_CENTS}) + dx AS cx,
         (y // {GRID_R_CENTS}) + dy AS cy
  FROM pts, generate_series(-1, 1) g1(dx), generate_series(-1, 1) g2(dy)
),
idx AS (
  SELECT id AS id_b, x AS xb, y AS yb,
         x // {GRID_R_CENTS} AS cx, y // {GRID_R_CENTS} AS cy
  FROM pts
)
SELECT id_a, id_b,
       CAST(FLOOR(SQRT(CAST((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
                            AS DOUBLE))) AS BIGINT) AS dist_cents
FROM probes JOIN idx USING (cx, cy)
WHERE id_a < id_b
  AND (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        <= {GRID_R_CENTS}::BIGINT * {GRID_R_CENTS}
"""
