"""Flagship query: smoke + oracle differential (SURVEY.md §5.2 items 1-2)."""

from __future__ import annotations

from tests.oracle import compare
from tests.conftest import SF_CORRECT, SF_SMOKE

from nzwirelessmap_fetch_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    OUTPUT_COLUMNS,
    flagship,
)


def test_flagship_smoke_sf0001(spark):
    df = flagship(spark, SF_SMOKE)
    assert tuple(df.columns) == OUTPUT_COLUMNS
    assert df.count() > 0


def test_flagship_matches_oracle(spark, ddb):
    compare(flagship(spark, SF_CORRECT), ddb, FLAGSHIP_ORACLE_SQL)


def test_flagship_broadcasts_dimensions(spark):
    """Plan check: at 100 TB only the lineitem⋈orders join may shuffle —
    all five dimension joins must be broadcast (SURVEY.md §7.2)."""
    plan = flagship(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 5, plan
