"""Plan-shape and semantic pins for the corpus-level text operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

from nzwirelessmap_fetch_spark.operators.text import (
    BENCHMARK_SOURCE,
    NGRAM_TOPK,
    corpus_contamination,
    corpus_ngram_topk,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ngram_topk_uses_take_ordered(spark):
    """Global top-k must be TakeOrdered (per-partition heaps + driver
    merge of k rows), never a full sort of the n-gram distribution."""
    df = corpus_ngram_topk(spark, SF_CORRECT)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    rows = df.collect()
    assert len(rows) == NGRAM_TOPK
    # deterministic ranking: strictly monotone under the declared tiebreak
    keys = [(-r.df, -r.n, r.ngram) for r in rows]
    assert keys == sorted(keys)


def test_contamination_excludes_benchmark_side(spark):
    out = corpus_contamination(spark, SF_CORRECT).cache()
    try:
        assert out.filter(F.col("n_shared_shingles") < 1).count() == 0
        # flagged docs are training docs, never the benchmark set itself
        from nzwirelessmap_fetch_spark.catalog import Catalog

        docs = Catalog(spark, SF_CORRECT).table("documents")
        bench_ids = docs.filter(F.col("source") == BENCHMARK_SOURCE).select("doc_id")
        assert out.join(bench_ids, "doc_id").count() == 0
    finally:
        out.unpersist()


def test_contamination_benchmark_side_broadcasts(spark):
    """The eval-suite side is small by construction — it must ship as a
    broadcast, leaving the corpus-side scan shuffle-free up to the
    group-by."""
    plan = _plan(corpus_contamination(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan


def test_short_docs_produce_no_shingles(spark):
    """sequence(1, n) descends for n <= 0 in Spark — the guard must send
    sub-width docs to the empty branch instead."""
    df = spark.createDataFrame(
        [(1, "only three tokens", "srcX"), (2, "a b c d e f g h i", "srcY")],
        "doc_id long, text string, source string",
    )
    toks = F.split("text", " ")
    n_sh = F.size(toks) - 7
    shingles = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(toks, i, 8), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    got = {r.doc_id: r.n for r in df.select("doc_id", F.size(shingles).alias("n")).collect()}
    assert got == {1: 0, 2: 2}


def test_pagerank_invariants(spark):
    """Integer micro-unit PageRank: every rank carries the base term,
    degrees are positive, and total mass never exceeds the initial mass
    (floor divisions only lose)."""
    from nzwirelessmap_fetch_spark.operators.graph import (
        BASE_RANK_MICRO,
        INIT_RANK_MICRO,
        graph_pagerank,
    )

    df = graph_pagerank(spark, SF_CORRECT).cache()
    try:
        n = df.count()
        assert n > 0
        assert df.filter(
            (F.col("rank_micro") < BASE_RANK_MICRO) | (F.col("degree") < 1)
        ).count() == 0
        total = df.agg(F.sum("rank_micro")).first()[0]
        assert total <= n * INIT_RANK_MICRO
    finally:
        df.unpersist()
