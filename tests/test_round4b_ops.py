"""Round-4 continuation operators: Gopher dup-n-gram fractions, JL
random projection, the native recursive CTE, and the ORC round trip.

Each test replays the operator's defining property in plain Python on a
sample (independent of BOTH engines), not just against the DuckDB
oracle — the gate already covers engine-vs-engine.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.catalog import Catalog
from nzwirelessmap_fetch_spark.operators.sketches import (
    _JL_SIGNS,
    JL_IN_DIM,
    JL_OUT_DIM,
    embedding_random_projection,
)
from nzwirelessmap_fetch_spark.operators.text import text_dup_ngram_frac
from nzwirelessmap_fetch_spark.plans.relational import (
    format_orc_roundtrip,
    sql_recursive_cte,
)
from tests.conftest import SF_CORRECT


def _py_dup_ppm(tokens: list[str], n: int) -> tuple[int, int]:
    grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    if not grams:
        return 0, 0
    dup = len(grams) - len(set(grams))
    return len(grams), dup * 1_000_000 // len(grams)


def test_dup_ngram_matches_python_replay(spark):
    docs = dict(
        Catalog(spark, SF_CORRECT)
        .table("documents")
        .limit(40)
        .select("doc_id", "text")
        .collect()
    )
    got = {
        r["doc_id"]: r
        for r in text_dup_ngram_frac(spark, SF_CORRECT)
        .filter(F.col("doc_id").isin(*docs))
        .collect()
    }
    assert len(got) == len(docs)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        n2, d2 = _py_dup_ppm(toks, 2)
        n3, d3 = _py_dup_ppm(toks, 3)
        row = got[doc_id]
        assert (row["n_grams2"], row["dup2_ppm"]) == (n2, d2)
        assert (row["n_grams3"], row["dup3_ppm"]) == (n3, d3)


def test_dup_ngram_bounds_and_short_docs(spark):
    df = text_dup_ngram_frac(spark, SF_CORRECT)
    bad = df.filter(
        (F.col("dup2_ppm") < 0)
        | (F.col("dup2_ppm") > 1_000_000)
        | (F.col("dup3_ppm") < 0)
        | (F.col("dup3_ppm") > 1_000_000)
        | (F.col("n_grams3") > F.col("n_grams2"))
    )
    assert bad.count() == 0


def test_jl_projection_matches_python_replay(spark):
    rows = (
        Catalog(spark, SF_CORRECT)
        .table("embeddings")
        .limit(10)
        .select("vec_id", "embedding")
        .collect()
    )
    got = {
        r["vec_id"]: r
        for r in embedding_random_projection(spark, SF_CORRECT)
        .filter(F.col("vec_id").isin(*[r["vec_id"] for r in rows]))
        .collect()
    }
    for r in rows:
        q = [math.floor(float(x) * 1_000_000) for x in r["embedding"]]
        for j in range(JL_OUT_DIM):
            expect = sum(qi * s for qi, s in zip(q, _JL_SIGNS[j]))
            assert got[r["vec_id"]][f"p{j}"] == expect


def test_jl_sign_matrix_is_md5_derived_and_balanced():
    for j in range(JL_OUT_DIM):
        for i in range(0, JL_IN_DIM, 17):
            h = hashlib.md5(f"{i}_{j}".encode()).hexdigest()
            assert _JL_SIGNS[j][i] == (1 if int(h[:8], 16) % 2 == 0 else -1)
        # Rademacher balance: a degenerate all-one row would make the
        # projection a plain sum; md5 parity keeps rows near 50/50.
        pos = sum(1 for s in _JL_SIGNS[j] if s == 1)
        assert 20 <= pos <= 44


def test_recursive_cte_depth_and_root_replay(spark):
    keys = {
        r[0]
        for r in Catalog(spark, SF_CORRECT)
        .table("customer")
        .select("c_custkey")
        .collect()
    }
    got = {r["c_custkey"]: r for r in sql_recursive_cte(spark, SF_CORRECT).collect()}
    assert set(got) == keys
    for k in sorted(keys)[:50] + sorted(keys)[-50:]:
        anc, depth = k, 0
        while anc >= 10 and (anc // 10) in keys:
            anc //= 10
            depth += 1
        assert (got[k]["chain_depth"], got[k]["root_key"]) == (depth, anc)


def test_orc_roundtrip_equals_parquet_aggregate(spark):
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in format_orc_roundtrip(spark, SF_CORRECT).collect()
    }
    expect = (
        Catalog(spark, SF_CORRECT)
        .table("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.floor(F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("sum_qty_cents"),
            F.floor(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("sum_price_cents"),
        )
        .collect()
    )
    assert len(expect) == len(got)
    for r in expect:
        g = got[(r["l_returnflag"], r["l_linestatus"])]
        assert (g["n_rows"], g["sum_qty_cents"], g["sum_price_cents"]) == (
            r["n_rows"],
            r["sum_qty_cents"],
            r["sum_price_cents"],
        )


def test_snm_candidate_count_is_exactly_linear(spark):
    """THE SNM property: candidate volume is Σ_{g=1..W-1}(n-g) — exact,
    key-skew-independent (contrast: LSH/prefix candidates vary with the
    data; SNM's linearity is by construction)."""
    from nzwirelessmap_fetch_spark.operators.dedup import (
        SNM_WINDOW,
        _snm_candidates,
        dedup_snm_quality_eval,
    )

    n = Catalog(spark, SF_CORRECT).table("documents").count()
    expect = sum(n - g for g in range(1, SNM_WINDOW))
    assert _snm_candidates(spark, SF_CORRECT).count() == expect
    row = dedup_snm_quality_eval(spark, SF_CORRECT).collect()[0]
    assert row["n_candidates"] == expect  # canonicalized set keeps all pairs


def test_snm_rank_matches_single_window_reference(spark):
    """The bucket-offset global rank (parallel plan) must equal the
    single-window ROW_NUMBER over (snm_key, doc_id) — the reference
    formulation the oracle uses."""
    from pyspark.sql import Window as W

    from nzwirelessmap_fetch_spark.operators.dedup import _snm_candidates

    cand = _snm_candidates(spark, SF_CORRECT)
    d = Catalog(spark, SF_CORRECT).table("documents")
    toks = F.array_sort(F.array_distinct(F.split("text", " ")))
    ref = d.select(
        "doc_id", F.array_join(F.slice(toks, 1, 3), " ").alias("snm_key")
    ).select(
        "doc_id",
        F.row_number().over(W.orderBy("snm_key", "doc_id")).alias("r_ref"),
    )
    ranks = {r["doc_id"]: r["r_ref"] for r in ref.collect()}
    sample = cand.select("doc_a", "ra", "doc_b", "rb").limit(200).collect()
    for row in sample:
        assert ranks[row["doc_a"]] == row["ra"]
        assert ranks[row["doc_b"]] == row["rb"]


def test_snm_verified_pairs_are_window_bounded_and_thresholded(spark):
    from nzwirelessmap_fetch_spark.operators.dedup import (
        SNM_WINDOW,
        dedup_sorted_neighborhood,
    )

    df = dedup_sorted_neighborhood(spark, SF_CORRECT)
    bad = df.filter(
        (F.col("rank_gap") < 1)
        | (F.col("rank_gap") >= SNM_WINDOW)
        | (F.col("jac_ppm") < 500_000)
        | (F.col("jac_ppm") > 1_000_000)
    )
    assert bad.count() == 0


def test_link_lengths_partition_flagship_rows(spark):
    """Histogram completeness: bucket counts sum to the flagship row
    count, and min ≤ max within every bucket."""
    from nzwirelessmap_fetch_spark.plans.flagship import (
        flagship,
        p2p_link_lengths,
    )

    hist = p2p_link_lengths(spark, SF_CORRECT).collect()
    assert sum(r["n_links"] for r in hist) == flagship(spark, SF_CORRECT).count()
    for r in hist:
        assert r["min_len_cents"] <= r["max_len_cents"]
        assert r["total_len_cents"] >= r["max_len_cents"]


def test_link_lengths_python_replay(spark):
    import math as m

    from nzwirelessmap_fetch_spark.plans.flagship import (
        LINK_LENGTH_BUCKET,
        flagship,
        p2p_link_lengths,
    )

    rows = flagship(spark, SF_CORRECT).collect()
    buckets: dict[int, list[int]] = {}
    for r in rows:
        dx = r["tx_lng"] - r["rx_lng"]
        dy = r["price"] / 100.0 - r["quantity"] * 10.0
        length = m.sqrt(dx * dx + dy * dy)
        buckets.setdefault(int(m.floor(length / LINK_LENGTH_BUCKET)), []).append(
            int(m.floor(length * 100))
        )
    got = {r["bucket"]: r for r in p2p_link_lengths(spark, SF_CORRECT).collect()}
    assert set(got) == set(buckets)
    for b, lens in buckets.items():
        assert (
            got[b]["n_links"],
            got[b]["min_len_cents"],
            got[b]["max_len_cents"],
            got[b]["total_len_cents"],
        ) == (len(lens), min(lens), max(lens), sum(lens))


def test_zorder_mask_ladder_equals_bit_fold(spark):
    """The mask-spread ladder must reproduce the reference 16-iteration
    bit-interleave exactly (the fold is the textbook definition; the
    ladder is the codegen-friendly plan — ~4x cheaper at sf0.1)."""
    from nzwirelessmap_fetch_spark.plans.relational import layout_zorder_key

    def fold(p: int, s: int) -> int:
        acc = 0
        for j in range(16):
            acc += (((p % 65536) >> j) & 1) << (2 * j)
            acc += (((s % 65536) >> j) & 1) << (2 * j + 1)
        return acc

    li = Catalog(spark, SF_CORRECT).table("lineitem")

    def spread_col(col):
        x = F.expr(f"CAST({col} % 65536 AS BIGINT)")
        for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                            (2, 0x33333333), (1, 0x55555555)):
            x = F.shiftleft(x, shift).bitwiseOR(x).bitwiseAND(
                F.lit(mask).cast("bigint"))
        return x

    z_ladder = spread_col("l_partkey") + F.shiftleft(spread_col("l_suppkey"), 1)
    for r in li.select("l_partkey", "l_suppkey", z_ladder.alias("z")).limit(500).collect():
        assert r["z"] == fold(r["l_partkey"], r["l_suppkey"])
    # and the registered query still partitions all rows
    hist = layout_zorder_key(spark, SF_CORRECT).agg(F.sum("n_rows")).collect()[0][0]
    assert hist == li.count()
