"""Round-11 operator tests: SimHash pair-stream memoization, the
grid-bucketed events_attribution re-plan, and checkpoint-from-consumer
certification helpers."""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE


def test_simhash_pairs_distinct(spark):
    """The memoized SimHash pair stream is DISTINCT by construction
    (the candidate build dedups before the radius filter) — the quality
    eval dropped its defensive .distinct() on the strength of this pin."""
    from nzwirelessmap_fetch_spark.operators.dedup import _verified_simhash_pairs

    pairs = _verified_simhash_pairs(spark, SF_SMOKE)
    n = pairs.count()
    nd = pairs.select("doc_a", "doc_b").distinct().count()
    assert n == nd and n > 0


def test_simhash_memo_shares_one_frame(spark):
    """All three family consumers must read the SAME checkpointed frame —
    the r10 verdict's ~943 s sf1-Zipf finding was three derivations of
    substantially the same 78.8 M-pair result."""
    from nzwirelessmap_fetch_spark.operators.dedup import (
        _SIMHASH_PAIRS_CACHE,
        _verified_simhash_pairs,
        dedup_simhash_hamming,
    )

    a = _verified_simhash_pairs(spark, SF_SMOKE)
    b = dedup_simhash_hamming(spark, SF_SMOKE)
    assert a is b
    key = (spark.sparkContext.applicationId, SF_SMOKE)
    assert _SIMHASH_PAIRS_CACHE[key] is a


def test_attribution_grid_cells_exactly_two(spark):
    """The r11 grid-bucketed touch join relies on each purchase's 3-day
    band covering EXACTLY two cells of width ATTR_CELL_US (= the
    lookback): (p_us − W) div W == p_us div W − 1 for positive epoch
    micros. Two distinct cells per purchase + one home cell per touch
    ⇒ no (purchase, touch) pair can match twice, so the join needs no
    dedup shuffle. This pins the arithmetic the no-dup claim rests on."""
    from pyspark.sql import functions as F

    from nzwirelessmap_fetch_spark.catalog import Catalog
    from nzwirelessmap_fetch_spark.operators.events_analytics import (
        ATTR_CELL_US,
        ATTR_WINDOW_US,
    )

    e = Catalog(spark, SF_SMOKE).table("events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("p_us")
    )
    n_cells = p.select(
        F.size(
            F.sequence(
                F.expr(f"(p_us - {ATTR_WINDOW_US}) div {ATTR_CELL_US}"),
                F.expr(f"p_us div {ATTR_CELL_US}"),
            )
        ).alias("n")
    )
    assert n_cells.filter(F.col("n") != 2).count() == 0
    assert n_cells.count() > 0


def test_simhash_pairs_ordered_and_bounded(spark):
    """Every memoized pair satisfies doc_a < doc_b and hamming ≤ 3 —
    the invariants the pigeonhole banding proof needs."""
    from pyspark.sql import functions as F

    from nzwirelessmap_fetch_spark.operators.dedup import (
        HAMMING_MAX,
        _verified_simhash_pairs,
    )

    bad = (
        _verified_simhash_pairs(spark, SF_SMOKE)
        .filter(
            (F.col("doc_a") >= F.col("doc_b"))
            | (F.col("hamming") > HAMMING_MAX)
        )
        .count()
    )
    assert bad == 0
