"""Round-3 operators: BM25 retrieval, snapshot diff / IVM, streaming
exact-distinct, BPE pair counts, temperature resampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.catalog import Catalog
from nzwirelessmap_fetch_spark.operators.sketches import (
    BM25_QUERY_RANKS,
    BM25_TOP_K,
    corpus_bm25_topk,
)
from nzwirelessmap_fetch_spark.operators.text import (
    RESAMPLE_BUDGET,
    corpus_bpe_pair_counts,
    corpus_temperature_resample,
)
from nzwirelessmap_fetch_spark.plans.relational import (
    _orders_change_set,
    agg_incremental_maintenance,
    table_snapshot_diff,
)
from tests.conftest import SF_SMOKE


def _orders_v2(spark):
    o, updates, inserts, deletes = _orders_change_set(spark, SF_SMOKE)
    changes = updates.unionByName(inserts)
    return (
        o.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(changes)
        .join(deletes, "o_orderkey", "left_anti")
    ), o


def test_diff_roundtrip_reconstructs_v2(spark):
    """THE diff property: v1 patched with the change stream IS v2.
    Applying inserts/updates by key, removing deletes, and leaving
    untouched keys alone must reproduce the evolved snapshot exactly."""
    v2, o = _orders_v2(spark)
    diff = table_snapshot_diff(spark, SF_SMOKE)

    upserts = diff.filter(F.col("change_type").isin("insert", "update")).select(
        "o_orderkey", F.col("new_totalprice").alias("o_totalprice")
    )
    removed = diff.filter(F.col("change_type") == "delete").select("o_orderkey")
    patched = (
        o.select("o_orderkey", "o_totalprice")
        .join(diff.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(upserts)
        .join(removed, "o_orderkey", "left_anti")
    )
    # multiset equality on (key, price)
    assert patched.exceptAll(v2.select("o_orderkey", "o_totalprice")).count() == 0
    assert v2.select("o_orderkey", "o_totalprice").exceptAll(patched).count() == 0


def test_diff_update_rows_carry_masks(spark):
    diff = table_snapshot_diff(spark, SF_SMOKE)
    upd = diff.filter(F.col("change_type") == "update")
    assert upd.count() > 0
    bad = upd.filter(
        F.col("changed_cols").isNull() | (F.length("changed_cols") == 0)
    ).count()
    assert bad == 0
    # price bump updates must flag o_totalprice in the mask
    assert (
        upd.filter(~F.col("changed_cols").contains("o_totalprice")).count() == 0
    )
    # inserts/deletes never carry a mask
    assert (
        diff.filter(F.col("change_type") != "update")
        .filter(F.col("changed_cols").isNotNull())
        .count()
        == 0
    )


def test_ivm_equals_direct_recompute(spark):
    """Spark-side twin of the oracle statement: the delta-maintained
    aggregate equals aggregating the materialized v2 — on the SAME
    engine, so the equality is exact, not just hash-compatible."""
    v2, _ = _orders_v2(spark)
    direct = v2.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    )
    maintained = agg_incremental_maintenance(spark, SF_SMOKE)
    a = {r.o_orderpriority: (r.n_orders, r.total_price) for r in direct.collect()}
    b = {r.o_orderpriority: (r.n_orders, r.total_price) for r in maintained.collect()}
    assert a == b


def test_bm25_rare_term_dominates(spark):
    """Query 1 mixes a head term (df rank 5) with a tail term (rank 29,
    idf two orders of magnitude higher on the fixture): every returned
    top-10 doc must actually contain a query term, and docs containing
    the rare term must outrank common-term-only docs. Since r9 the
    workload is df-rank-DERIVED (r8 verdict directive #3), so the test
    derives the rare term with the same ranking rule instead of naming
    a fixture word."""
    out = corpus_bm25_topk(spark, SF_SMOKE).filter(F.col("query_id") == 1)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert len(rows) == BM25_TOP_K
    d = Catalog(spark, SF_SMOKE).table("documents")
    # replay the rank rule: term at the LARGEST rank of query 1 = rarest
    rare_rank = max(r for qid, r in BM25_QUERY_RANKS if qid == 1)
    dft = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .collect()
    )
    rare_term = dft[rare_rank - 1]["term"]
    with_dup = {
        r.doc_id
        for r in d.filter(
            F.array_contains(F.split("text", " "), rare_term)
        ).select("doc_id").collect()
    }
    # fixture has >= 10 docs containing 'dup' at sf0.001? If fewer, the
    # tail may be scan-only docs — the invariant is PREFIX dominance:
    # every dup-doc in the result ranks above every non-dup doc.
    ranks_dup = [r.rank for r in rows if r.doc_id in with_dup]
    ranks_other = [r.rank for r in rows if r.doc_id not in with_dup]
    assert ranks_dup, "rare-term docs missing from top-10 entirely"
    if ranks_other:
        assert max(ranks_dup) < min(ranks_other)


def test_stream_windowed_distinct_equals_batch(spark):
    from nzwirelessmap_fetch_spark.streaming.events_stream import (
        WATERMARK,
        WINDOW,
        stream_windowed_distinct,
    )

    out = stream_windowed_distinct(spark, SF_SMOKE)
    e = Catalog(spark, SF_SMOKE).table("events")
    mx = e.agg(F.max("ts").alias("mt"))
    batch = (
        e.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("distinct_users"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("w.end") <= F.col("mt") - F.expr(f"INTERVAL {WATERMARK}"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "distinct_users",
        )
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_bpe_pairs_hand_check(spark):
    """The pair statistic is verifiable by hand on a tiny frame: build
    the same statistic in pure Python over the fixture and compare."""
    rows = corpus_bpe_pair_counts(spark, SF_SMOKE).collect()
    import collections

    texts = [
        r.text
        for r in Catalog(spark, SF_SMOKE).table("documents").select("text").collect()
    ]
    c: collections.Counter = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            for x, y in zip(w, w[1:]):
                c[x + y] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    got = [(r.pair, r.n) for r in sorted(rows, key=lambda r: (-r.n, r.pair))]
    assert got == want


def test_temperature_resample_flattens_distribution(spark):
    """τ=0.5 must compress shares toward uniform: the head language's
    share shrinks vs its raw share, the tail's grows, shares sum to 1,
    and expected docs never exceed the budget."""
    rows = corpus_temperature_resample(spark, SF_SMOKE).collect()
    total = sum(r.n_docs for r in rows)
    assert abs(sum(r.sample_share for r in rows) - 1.0) < 1e-12
    assert sum(r.expected_docs for r in rows) <= RESAMPLE_BUDGET
    head = max(rows, key=lambda r: r.n_docs)
    tail = min(rows, key=lambda r: r.n_docs)
    assert head.sample_share < head.n_docs / total
    assert tail.sample_share > tail.n_docs / total
