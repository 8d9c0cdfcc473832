"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``nzwirelessmap_fetch_spark``; this module is the
thin registry the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nzwirelessmap_fetch_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nzwirelessmap_fetch_spark.plans.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each ``queries()`` entry."""
    return registry.oracle_sql()


def scale_profiles() -> dict[str, dict[str, str | None]]:
    """Optional metadata (not part of the driver gate): which registry
    name to run at 100 TB. Entries tagged 'exact_measure' compute a
    textbook unbounded-fan-out measure and name their oracle-checked
    scale-safe twin in ``scale_twin`` (README "Which name to run at
    100 TB")."""
    return registry.scale_profiles()
