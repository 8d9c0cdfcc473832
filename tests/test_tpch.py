"""TPC-H classic suite (plans/tpch.py): semantic pins beyond the oracle
gate — revenue identities, predicate containment, limit determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.catalog import Catalog
from nzwirelessmap_fetch_spark.plans.tpch import (
    tpch_q3_shipping_priority,
    tpch_q5_local_supplier,
    tpch_q6_forecast_revenue,
    tpch_q10_returned_items,
    tpch_q14_promo_effect,
    tpch_q18_large_volume,
)
from tests.conftest import SF_SMOKE


def test_q3_sorted_and_bounded(spark):
    rows = tpch_q3_shipping_priority(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_nations_in_asia_only(spark):
    c = Catalog(spark, SF_SMOKE)
    asia = {
        r.n_name
        for r in c.table("nation")
        .join(c.table("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .collect()
    }
    got = {r.n_name for r in tpch_q5_local_supplier(spark, SF_SMOKE).collect()}
    assert got and got <= asia


def test_q6_band_containment(spark):
    """The banded revenue delta is a sub-sum of all-lineitem discount
    revenue, and every counted line is inside the predicate box."""
    out = tpch_q6_forecast_revenue(spark, SF_SMOKE).collect()[0]
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    manual = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24.0)
    ).count()
    assert out.n_lines == manual
    assert out.revenue_delta > 0


def test_q10_only_returned_revenue(spark):
    rows = tpch_q10_returned_items(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    assert all(r.revenue > 0 for r in rows)
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q14_ratio_identity(spark):
    r = tpch_q14_promo_effect(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r.promo_pct <= 100.0
    assert r.promo_revenue <= r.total_revenue
    assert r.promo_pct == 100.0 * r.promo_revenue / r.total_revenue


def test_q18_threshold_is_real(spark):
    """Every reported order's recomputed lineitem quantity exceeds the
    300 cap, and no qualifying order is dropped."""
    rows = tpch_q18_large_volume(spark, SF_SMOKE).collect()
    li = Catalog(spark, SF_SMOKE).table("lineitem")
    sums = {
        r.l_orderkey: r.s
        for r in li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .collect()
    }
    assert {r.o_orderkey for r in rows} == set(sums)
    for r in rows:
        assert r.total_qty == sums[r.o_orderkey]


def test_q7_directions_and_years(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q7_volume_shipping

    rows = tpch_q7_volume_shipping(spark, SF_SMOKE).collect()
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert dirs <= {("NATION_9", "NATION_10"), ("NATION_10", "NATION_9")}
    assert all(r.l_year in (1996, 1997) for r in rows)


def test_q8_share_identity(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q8_market_share

    for r in tpch_q8_market_share(spark, SF_SMOKE).collect():
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.mkt_share == r.nation_volume / r.total_volume


def test_q13_histogram_mass_is_customer_count(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q13_customer_distribution

    rows = tpch_q13_customer_distribution(spark, SF_SMOKE).collect()
    total = sum(r.custdist for r in rows)
    n_cust = Catalog(spark, SF_SMOKE).table("customer").count()
    assert total == n_cust  # outer join kept every customer exactly once


def test_q15_is_the_argmax(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q15_top_supplier

    rows = tpch_q15_top_supplier(spark, SF_SMOKE).collect()
    assert rows
    assert len({r.total_revenue for r in rows}) == 1  # all tied at the max


def test_q17_filter_is_strictly_below_avg_fifth(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q17_small_quantity_revenue

    r = tpch_q17_small_quantity_revenue(spark, SF_SMOKE).collect()[0]
    assert r.n_lines >= 0
    if r.n_lines == 0:
        assert r.small_qty_revenue is None
    else:
        assert r.small_qty_revenue > 0


def test_q19_revenue_subset_of_unfiltered(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q19_discounted_revenue

    r = tpch_q19_discounted_revenue(spark, SF_SMOKE).collect()[0]
    li_n = Catalog(spark, SF_SMOKE).table("lineitem").count()
    assert 0 <= r.n_lines < li_n


def test_q22_lapsed_customers_have_no_recent_orders(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q22_global_sales_opportunity

    rows = tpch_q22_global_sales_opportunity(spark, SF_SMOKE).collect()
    assert sum(r.numcust for r in rows) > 0
    for r in rows:
        assert r.totacctbal > 0


def test_q2_min_cost_is_regional_minimum(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q2_min_cost_supplier

    rows = tpch_q2_min_cost_supplier(spark, SF_SMOKE).collect()
    assert rows
    bals = [r.s_acctbal for r in rows]
    assert bals == sorted(bals, reverse=True)
    # every winner for the same part quotes the identical (minimum) cost
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.supply_cost)
    assert all(len(costs) == 1 for costs in by_part.values())


def test_q4_late_semi_join_is_a_subset(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q4_order_priority

    rows = tpch_q4_order_priority(spark, SF_SMOKE).collect()
    assert rows
    allowed = {"1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"}
    assert {r.o_orderpriority for r in rows} <= allowed
    quarter = (
        Catalog(spark, SF_SMOKE)
        .table("orders")
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
        )
        .count()
    )
    assert sum(r.order_count for r in rows) <= quarter


def test_q9_profit_grouped_and_ordered(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q9_product_type_profit

    rows = tpch_q9_product_type_profit(spark, SF_SMOKE).collect()
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert (a.nation, -a.o_year) <= (b.nation, -b.o_year)


def test_q11_survivors_are_above_mean(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q11_important_stock

    rows = tpch_q11_important_stock(spark, SF_SMOKE).collect()
    assert rows
    vals = [r.part_value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_q12_partition_of_joined_lines(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q12_late_priority_by_flag

    rows = tpch_q12_late_priority_by_flag(spark, SF_SMOKE).collect()
    assert {r.ship_flag for r in rows} <= {"A", "R"}
    for r in rows:
        assert r.high_line_count >= 0 and r.low_line_count >= 0
        assert r.high_line_count + r.low_line_count > 0


def test_q16_sizes_within_filter_list(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q16_supplier_count

    rows = tpch_q16_supplier_count(spark, SF_SMOKE).collect()
    assert rows
    assert all(r.p_size in {1, 4, 7, 10, 14, 23, 45, 49} for r in rows)
    assert all(r.p_brand != "Brand#5" and r.p_type != "PROMO" for r in rows)
    cnts = [r.supplier_cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_q20_suppliers_sorted_and_in_nation(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import tpch_q20_promotion_suppliers

    rows = tpch_q20_promotion_suppliers(spark, SF_SMOKE).collect()
    names = [r.s_name for r in rows]
    assert names and names == sorted(names)


def test_q21_only_late_supplier_counts(spark):
    from nzwirelessmap_fetch_spark.plans.tpch import (
        tpch_q21_suppliers_who_kept_waiting,
    )

    rows = tpch_q21_suppliers_who_kept_waiting(spark, SF_SMOKE).collect()
    waits = [r.numwait for r in rows]
    assert waits == sorted(waits, reverse=True)
    assert all(w > 0 for w in waits)
