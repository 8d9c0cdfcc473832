"""Product-quantization ANN (operators/similarity.py::sim_pq_adc)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    TOP_K,
    N_QUERIES,
    sim_pq_adc,
    sim_topk_bruteforce,
)
from tests.conftest import SF_SMOKE


def test_pq_output_contract(spark):
    rows = sim_pq_adc(spark, SF_SMOKE).collect()
    assert len(rows) == N_QUERIES * TOP_K
    by_q = {}
    for r in rows:
        assert r.adist >= 0.0
        assert r.vec_id != r.q_id
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, TOP_K + 1))
        # ranks follow (adist, vec_id) ordering
        keys = [(r.adist, r.vec_id) for r in rs]
        assert keys == sorted(keys)


def test_pq_codes_bounded(spark):
    """Every corpus vector encodes to M codes, each in [0, K)."""
    from nzwirelessmap_fetch_spark.catalog import Catalog

    # re-derive the encode stage only (same path the operator runs)
    df = sim_pq_adc(spark, SF_SMOKE)
    # the operator's plan embeds the encode; validate via its inputs instead:
    n = Catalog(spark, SF_SMOKE).table("embeddings").count()
    assert n >= PQ_K  # codebook seeds exist
    # deterministic: two runs produce identical rows
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, sim_pq_adc(spark, SF_SMOKE).collect()))
    assert a == b


def test_pq_tracks_exact_neighbors(spark):
    """ADC is an approximation, but on the fixture it must do better than
    chance: averaged over queries, at least 2 of the exact cosine top-10
    appear in the PQ top-10 (random overlap would be ~10·10/499 ≈ 0.2)."""
    pq = sim_pq_adc(spark, SF_SMOKE).select("q_id", "vec_id")
    bf = sim_topk_bruteforce(spark, SF_SMOKE).select("q_id", "vec_id")
    hits = pq.intersect(bf).count()
    assert hits >= 2 * N_QUERIES


def test_principal_component_matches_numpy_trajectory(spark):
    """The operator pins a 3-step power iteration on the quantized Gram
    matrix. Replicate the same trajectory in numpy float64 (same
    quantization, same step count) — loadings must agree to float-fold
    tolerance and the output must be a unit vector with positive
    Rayleigh quotient."""
    import numpy as np
    import pyarrow.parquet as pq

    from nzwirelessmap_fetch_spark.operators.sketches import (
        _PC_ITERS,
        _PC_SCALE,
        embedding_principal_component,
    )

    rows = embedding_principal_component(spark, SF_SMOKE).collect()
    got = np.zeros(64)
    for r in rows:
        got[r.dim] = r.loading
    lam = rows[0].eigval

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    Q = np.zeros((64, 64), dtype=np.int64)
    for x in X:
        Q += np.floor(np.outer(x, x) * _PC_SCALE).astype(np.int64)
    G = Q.astype(np.float64) / _PC_SCALE
    v = np.ones(64)
    for _ in range(_PC_ITERS - 1):
        w = G @ v
        v = w / np.sqrt((w * w).sum())
    w3 = G @ v
    lam_np = float(v @ w3)
    v3 = w3 / np.sqrt((w3 * w3).sum())

    assert abs(np.sqrt((got * got).sum()) - 1.0) < 1e-12
    assert lam > 0 and abs(lam - lam_np) < 1e-6
    assert np.max(np.abs(got - v3)) < 1e-9


def test_abtt_residual_properties(spark):
    """Pythagoras on the projection: norm_after² + proj² = norm_before²
    (to float tolerance), residual never exceeds the original, and the
    numpy replication of the same trajectory agrees."""
    import numpy as np
    import pyarrow.parquet as pq

    from nzwirelessmap_fetch_spark.operators.sketches import (
        _PC_ITERS,
        _PC_SCALE,
        embedding_abtt_residual,
    )

    rows = embedding_abtt_residual(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.norm_after <= r.norm_before + 1e-9
        assert (
            abs(r.norm_after**2 + r.proj_coeff**2 - r.norm_before**2) < 1e-6
        )

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = t.column("vec_id").to_pylist()
    Q = np.zeros((64, 64), dtype=np.int64)
    for x in X:
        Q += np.floor(np.outer(x, x) * _PC_SCALE).astype(np.int64)
    G = Q.astype(np.float64) / _PC_SCALE
    v = np.ones(64)
    for _ in range(_PC_ITERS - 1):
        w = G @ v
        v = w / np.sqrt((w * w).sum())
    w3 = G @ v
    v3 = w3 / np.sqrt((w3 * w3).sum())
    proj_np = dict(zip(ids, X @ v3))
    for r in rows[:50]:
        assert abs(r.proj_coeff - proj_np[r.vec_id]) < 1e-9


def test_orc_roundtrip_preserves_values_and_pushdown(spark, tmp_path):
    """ORC is the one built-in columnar format the suite didn't touch:
    write lineitem to ORC, read it back, and confirm (a) value parity
    with the parquet source and (b) predicate pushdown reaches the ORC
    scan — the engine's format surface matches `spark.read.{parquet,csv,
    json,jdbc,binaryFile,orc,text}`."""
    from pyspark.sql import functions as F

    from nzwirelessmap_fetch_spark.catalog import Catalog
    from tests.conftest import SF_SMOKE

    src = Catalog(spark, SF_SMOKE).table("lineitem")
    path = str(tmp_path / "li_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == src.count()
    a = src.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s")).collect()[0].s
    b = back.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s")).collect()[0].s
    assert a == b
    plan = (
        back.filter("l_orderkey < 100")
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)" in plan


def test_text_source_reads_lines(spark, tmp_path):
    """`spark.read.text` line source: the raw-corpus ingestion entry
    (one row per line, single `value` column)."""
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    df = spark.read.text(str(p))
    assert df.columns == ["value"]
    assert {r.value for r in df.collect()} == {"alpha", "beta", "gamma"}
