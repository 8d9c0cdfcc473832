"""Convergence pin for the power-iteration family (r3 verdict weak-spot:
3 pinned iterates on a near-isotropic fixture returned a far-from-
eigenvector blend; the knob was also fake — the DuckDB chain hard-coded
3 steps regardless of _PC_ITERS).

On a SEPARATED spectrum (λ₂/λ₁ ≤ ~0.35 here) the _PC_ITERS=6 trajectory
must land within a stated residual bound of the true eigenvector — and
the trajectory must still be bit-identical between engines (the oracle
replay property the registry hash rests on).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from nzwirelessmap_fetch_spark.operators.sketches import (
    _PC_DIM,
    _PC_ITERS,
    embedding_principal_component,
)

RESIDUAL_BOUND = 5e-3  # ‖G·v − λv‖₂ / λ after _PC_ITERS products


def _separable_fixture(tmp_path):
    """Deterministic embeddings with one dominant direction: every vector
    is ±dominant + small structured perturbation, so λ₂/λ₁ is small and
    (λ₂/λ₁)^(_PC_ITERS-1) sits well inside RESIDUAL_BOUND."""
    n = 200
    dom = np.array(
        [np.cos(0.1 * d) for d in range(_PC_DIM)], dtype=np.float64
    )
    dom /= np.linalg.norm(dom)
    rows = []
    for i in range(n):
        sign = 1.0 if i % 2 == 0 else -1.0
        noise = np.array(
            [np.sin(0.37 * (i * _PC_DIM + d)) for d in range(_PC_DIM)],
            dtype=np.float64,
        )
        noise -= noise.dot(dom) * dom  # orthogonal perturbation
        rows.append(sign * dom + 0.10 * noise)
    # float32 at rest to match the real embeddings table schema
    # (catalog pins array<float>); return the float32-rounded matrix so
    # the numpy reference Gram matches what the engines actually read
    X = np.array(rows).astype(np.float32)
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [r.tolist() for r in X], type=pa.list_(pa.float32())
            ),
        }
    )
    fixture = tmp_path / "sep"
    fixture.mkdir()
    pq.write_table(table, fixture / "embeddings.parquet")
    return str(fixture), X.astype(np.float64)


def test_principal_component_residual_bound(spark, tmp_path):
    sf_dir, X = _separable_fixture(tmp_path)
    G = X.T @ X
    evals = np.linalg.eigvalsh(G)
    ratio = evals[-2] / evals[-1]
    # fixture sanity: the spectrum must actually be separated, and the
    # theoretical decay must beat the bound we pin
    assert ratio < 0.4, ratio
    assert ratio ** (_PC_ITERS - 1) < RESIDUAL_BOUND

    out = embedding_principal_component(spark, sf_dir).toPandas()
    assert len(out) == _PC_DIM
    v = out.sort_values("dim")["loading"].to_numpy()
    lam = float(out["eigval"].iloc[0])
    residual = np.linalg.norm(G @ v - lam * v) / lam
    assert residual < RESIDUAL_BOUND, residual
    # and the Rayleigh quotient is within the residual of the true λ₁
    assert abs(lam - evals[-1]) / evals[-1] < RESIDUAL_BOUND


def test_trajectory_oracle_replay_on_separable_fixture(spark, tmp_path):
    """The raised iterate count must keep the bit-exact oracle replay:
    run the full Spark trajectory AND the generated DuckDB chain on the
    same separable fixture and compare with the driver's fingerprint."""
    import duckdb

    from tests.oracle import compare
    from nzwirelessmap_fetch_spark.operators.sketches import (
        EMBEDDING_PRINCIPAL_COMPONENT_SQL,
    )

    sf_dir, _ = _separable_fixture(tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    compare(
        embedding_principal_component(spark, sf_dir),
        con,
        EMBEDDING_PRINCIPAL_COMPONENT_SQL,
    )
    con.close()
