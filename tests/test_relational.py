"""Oracle-differential test for every registered query (SURVEY.md §5.2.1).

This mirrors the driver's correctness gate: run each ``queries()`` entry at
sf0.01 and hash-compare with its DuckDB oracle.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle import compare

from nzwirelessmap_fetch_spark.plans import registry


def _names():
    return sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, ddb):
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    compare(fn(spark, SF_CORRECT), ddb, sql)


def test_rows_only_queries_return_rows(spark):
    """Entries without an oracle still must produce rows at sf0.01."""
    qs = registry.queries()
    oracles = registry.oracle_sql()
    for name in set(qs) - set(oracles):
        assert qs[name](spark, SF_CORRECT).count() >= 0, name
