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


def test_shingle_df_cap_drops_hot_keys(spark):
    """The dense-corpus skew valve: capping shingle document frequency
    must remove exactly the shingles above the cap and leave the rest of
    the inverted index untouched."""
    from pyspark.sql import functions as F

    from nzwirelessmap_fetch_spark.catalog import Catalog
    from nzwirelessmap_fetch_spark.operators.dedup import _shingles

    docs = Catalog(spark, "/root/testdata/sf0.01").table("documents")
    full = _shingles(docs)
    df_counts = full.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    cap = int(df_counts.agg(F.expr("percentile(df, 0.9)")).first()[0])
    expected_kept = df_counts.filter(F.col("df") <= cap).count()
    n_hot = df_counts.filter(F.col("df") > cap).count()
    assert n_hot > 0, "fixture has no hot shingles; cap test is vacuous"
    capped = _shingles(docs, max_df=cap)
    assert capped.select("shingle").distinct().count() == expected_kept
    # surviving postings are identical to the uncapped index for kept keys
    kept_full = full.join(
        df_counts.filter(F.col("df") <= cap).select("shingle"), "shingle"
    )
    assert capped.count() == kept_full.count()


def test_embedding_bucket_cap_bounds_pair_cost(spark):
    """The sign-pattern blocking valve: with ``max_bucket`` set, no bucket
    above the cap may contribute candidate pairs (bounding within-bucket
    join cost at ≤ cap² per bucket), and a cap above the largest bucket
    must reproduce the uncapped result exactly."""
    from pyspark.sql import functions as F

    from nzwirelessmap_fetch_spark.catalog import Catalog
    from nzwirelessmap_fetch_spark.operators.dedup import (
        EMB_DIM,
        _bow_vectors,
        _embedding_cosine_dups,
        dedup_embedding_cosine,
    )

    sf = "/root/testdata/sf0.01"
    vec = _bow_vectors(Catalog(spark, sf).table("documents"))
    sizes = (
        vec.withColumn(
            "bucket",
            F.expr(
                f"aggregate(sequence(0, {EMB_DIM - 1}), 0,"
                " (acc, i) -> acc + IF(v[i] > CAST(0.0 AS DOUBLE),"
                " shiftleft(1, i), 0))"
            ),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bsz"))
    )
    biggest = sizes.agg(F.max("bsz")).first()[0]
    assert biggest >= 2, "fixture has no multi-member bucket; test is vacuous"

    # cap below the biggest bucket: its members must vanish from the output
    capped = _embedding_cosine_dups(spark, sf, max_bucket=biggest - 1)
    big_buckets = {r.bucket for r in sizes.filter(F.col("bsz") > biggest - 1).collect()}
    survivors = (
        vec.withColumn(
            "bucket",
            F.expr(
                f"aggregate(sequence(0, {EMB_DIM - 1}), 0,"
                " (acc, i) -> acc + IF(v[i] > CAST(0.0 AS DOUBLE),"
                " shiftleft(1, i), 0))"
            ),
        )
        .filter(F.col("bucket").isin(big_buckets))
        .select("doc_id")
    )
    overlap = capped.join(survivors, "doc_id").count()
    # members of dropped buckets can still appear ONLY via other buckets —
    # with 1-bucket-per-doc blocking they cannot appear at all
    assert overlap == 0

    # cap ≥ biggest bucket: identical to the uncapped operator
    uncapped = dedup_embedding_cosine(spark, sf)
    loose = _embedding_cosine_dups(spark, sf, max_bucket=biggest)
    assert loose.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(loose).count() == 0


def test_queries_self_heal_non_utc_session(spark, ddb):
    """The driver harness owns the SparkSession and may not pin UTC; the
    engine must repair the timezone itself (Catalog/_event_stream do) or
    every timestamp query hash-mismatches its UTC-naive oracle."""
    from tests.oracle import compare

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name in ("date_funcs", "stream_windowed_counts"):
            fn = registry.queries()[name]
            compare(fn(spark, SF_CORRECT), ddb, registry.oracle_sql()[name])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
