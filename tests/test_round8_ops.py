"""Round-8 tests: r7 ADVICE regressions (empty-corpus order probe, tRNS
fail-loud, atomic commit admission, pinned-base streaming merge) and the
round-8 operators (adaptive winnowing cap, unified artifact commits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_prefix_order_probe_empty_corpus(spark):
    """r7 ADVICE (dedup.py:217): order='auto' on an EMPTY shingle table
    must resolve to hash order, not raise TypeError on max(df)=None."""
    from nzwirelessmap_fetch_spark.operators.dedup import (
        _ORDER_PROBE_CACHE,
        _prefix_order_sets,
    )

    sh = spark.createDataFrame([], "doc_id long, h long")
    _ORDER_PROBE_CACHE.clear()
    order, sets, probe_tab = _prefix_order_sets(
        spark, sh, ("test-empty-corpus-probe",), "auto"
    )
    assert order == "hash"
    assert sets.count() == 0
    if probe_tab is not None:
        probe_tab.unpersist()
    sets.unpersist()
    _ORDER_PROBE_CACHE.clear()


def test_png_trns_on_truecolor_fails_loud():
    """r7 ADVICE (png.py:152): a grayscale/RGB PNG carrying tRNS (the
    spec-legal single transparent color) must raise the documented
    NotImplementedError, not silently decode opaque."""
    import struct
    import zlib

    from nzwirelessmap_fetch_spark.functions import png

    # hand-assemble a 1x1 RGB (color type 2) PNG with a tRNS chunk
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    scan = bytes([0, 10, 20, 30])  # filter 0 + one RGB pixel
    blob = (
        png.PNG_SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"tRNS", struct.pack(">HHH", 10, 20, 30))
        + png._chunk(b"IDAT", zlib.compress(scan))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="tRNS on color type 2"):
        png.decode_png(blob)
    # same image without tRNS decodes fine (the guard is tRNS-specific)
    ok = (
        png.PNG_SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(scan))
        + png._chunk(b"IEND", b"")
    )
    w, h, ch, raw = png.decode_png(ok)
    assert (w, h, ch) == (1, 1, 3) and raw == bytes([10, 20, 30])


def test_winnow_adaptive_cap_histogram_walk(spark):
    """The budget walk (r7 verdict directive #1): cap = largest df with
    cumulative sum(df^2) <= budget, floored at WINNOW_MAX_DF."""
    from nzwirelessmap_fetch_spark.operators.text import (
        WINNOW_MAX_DF,
        WINNOW_PAIR_BUDGET_PER_DOC,
        _winnow_adaptive_cap,
    )

    # 100 fps at df=10 (cum 10k), 10 at df=100 (cum 110k), 1 at df=1000
    rows = (
        [(i, 10) for i in range(100)]
        + [(1000 + i, 100) for i in range(10)]
        + [(9999, 1000)]
    )
    dfs = spark.createDataFrame(rows, "fp long, df int")
    # budget = PER_DOC * n_docs; pick n_docs so thresholds land mid-ladder
    per = WINNOW_PAIR_BUDGET_PER_DOC
    assert _winnow_adaptive_cap(dfs, -(-9_999 // per)) == WINNOW_MAX_DF  # < 10k
    assert _winnow_adaptive_cap(dfs, -(-10_000 // per) or 1) in (
        WINNOW_MAX_DF,
        10,
    )  # exactly the first rung (10 < floor 16 -> floor wins)
    assert _winnow_adaptive_cap(dfs, -(-110_000 // per)) == 100
    assert _winnow_adaptive_cap(dfs, -(-1_110_000 // per)) == 1000
    # empty df table -> floor
    empty = spark.createDataFrame([], "fp long, df int")
    assert _winnow_adaptive_cap(empty, 100) == WINNOW_MAX_DF


def test_winnow_adaptive_capped_subset_of_exact(spark):
    """The adaptive-capped pair set is a subset of the exact truth on
    the smoke corpus, and both runs hit the memoized substrates."""
    from tests.conftest import SF_SMOKE

    from nzwirelessmap_fetch_spark.operators.text import (
        _WINNOW_FP_CACHE,
        _WINNOW_PAIRS_CACHE,
        corpus_winnowing,
        corpus_winnowing_capped,
    )

    exact = {
        (r["doc_a"], r["doc_b"]) for r in corpus_winnowing(spark, SF_SMOKE).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in corpus_winnowing_capped(spark, SF_SMOKE).collect()
    }
    assert capped <= exact
    assert any(k[1] == SF_SMOKE for k in _WINNOW_FP_CACHE)
    assert sum(1 for k in _WINNOW_PAIRS_CACHE if k[1] == SF_SMOKE) == 2


def _txn_stress_worker(root: str, wid: int, n_rounds: int, q) -> None:
    """Child-process body for the commit-admission stress: each round
    writes a pyarrow data dir, then races `_commit_logged` with
    expect_parent pinned to the base it resolved — retrying on
    SnapshotConflictError like any real writer. No SparkSession: the
    commit protocol is pure filesystem, which is exactly why it is
    stress-testable across PROCESSES (r7 verdict directive #4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nzwirelessmap_fetch_spark.sinks.writers import (
        SnapshotConflictError,
        SnapshotParquetTable,
    )

    sink = SnapshotParquetTable(root)
    conflicts = 0
    for r in range(n_rounds):
        version = f"w{wid}r{r}"
        d = sink._dir("t", version)
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.table({"k": [wid], "r": [r]}), d / "part-0.parquet")
        while True:
            base = sink.resolve("t")
            try:
                sink._commit_logged(
                    "t",
                    version,
                    [["k", "bigint"], ["r", "bigint"]],
                    op="write",
                    read_set=[f"t@{base}"],
                    expect_parent=base,
                )
                break
            except SnapshotConflictError:
                conflicts += 1
    q.put((wid, conflicts))


def test_txn_commit_admission_multiprocess_linearizable(tmp_path):
    """r7 ADVICE (writers.py:307) + verdict directive #4: N real
    PROCESSES racing expect_parent-checked commits on one table.
    Exactly one writer wins each seq slot; losers get
    SnapshotConflictError and retry on the new base; the final log is
    a LINEAR history (entry N's parent == entry N-1's version,
    contiguous seqs, no duplicate versions) and the pointer equals the
    log tail."""
    import multiprocessing as mp

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    root = str(tmp_path)
    sink = SnapshotParquetTable(root)
    d = sink._dir("t", "0")
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.table({"k": [0], "r": [0]}), d / "part-0.parquet")
    sink._commit_logged(
        "t", "0", [["k", "bigint"], ["r", "bigint"]], expect_parent=None
    )

    n_workers, n_rounds = 4, 12
    ctx = mp.get_context("spawn")  # no JVM/fork hazards in children
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_txn_stress_worker, args=(root, w, n_rounds, q))
        for w in range(n_workers)
    ]
    for p in procs:
        p.start()
    stats = [q.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(timeout=300)
        assert p.exitcode == 0

    entries = sink.log_entries("t")
    # every commit landed exactly once
    assert len(entries) == 1 + n_workers * n_rounds
    versions = [e["version"] for e in entries]
    assert len(set(versions)) == len(versions)
    # contiguous seqs + linear parent chain across processes
    assert [e["seq"] for e in entries] == list(range(1, len(entries) + 1))
    for prev, cur in zip(entries, entries[1:]):
        assert cur["parent"] == prev["version"], (
            f"non-linear history at seq {cur['seq']}"
        )
    # pointer is reconciled to the log tail
    assert sink.resolve("t") == entries[-1]["version"]
    # with 4 writers genuinely racing, SOME admission conflicts occurred
    # (not asserted per-worker: scheduling is nondeterministic)
    assert sum(c for _, c in stats) >= 1


def test_vacuum_vs_time_travel_named_error(tmp_path, spark):
    """r7 verdict directive #4: read_as_of / read_version of a vacuumed
    version fails with VacuumedVersionError (naming the earliest
    readable version), never a silent empty read; latest stays
    readable; an uncommitted version still raises plain
    FileNotFoundError."""
    import pytest as _pytest
    from pyspark.sql import functions as SF

    from nzwirelessmap_fetch_spark.sinks.writers import (
        SnapshotParquetTable,
        VacuumedVersionError,
    )

    sink = SnapshotParquetTable(tmp_path)
    for i, v in enumerate(("1", "2", "3")):
        sink.write_version(
            spark.range(3).select((SF.col("id") + i).alias("k")),
            "t",
            v,
            commit_ts=f"2024-01-0{i + 1}T00:00:00.000000Z",
        )
    out = sink.vacuum("t", keep_latest=1)
    assert out["removed_expired"] == ["1", "2"]

    with _pytest.raises(VacuumedVersionError, match="earliest readable"):
        sink.read_version(spark, "t", "1")
    with _pytest.raises(VacuumedVersionError):
        sink.read_as_of(spark, "t", "2024-01-02T12:00:00.000000Z")
    # log entries survive vacuum (audit metadata) and latest is readable
    assert [e["version"] for e in sink.log_entries("t")] == ["1", "2", "3"]
    assert sink.read_version(spark, "t", "latest").count() == 3
    with _pytest.raises(FileNotFoundError, match="no snapshot"):
        sink.read_version(spark, "t", "never-committed")


def test_pipeline_artifacts_commit_through_shared_log(spark, tmp_path):
    """r7 verdict directive #5: the §3.1 pipeline's versioned artifacts
    commit through the SnapshotParquetTable log protocol — _log/
    entries exist per artifact, the idempotency gate reads the LOG
    (not file presence), and a crash that wrote data objects without a
    log entry correctly re-runs."""
    import json as _json

    from tests.conftest import SF_SMOKE

    from nzwirelessmap_fetch_spark.pipeline import (
        ARTIFACT_CSV,
        ARTIFACT_JSON,
        run_pipeline,
    )
    from nzwirelessmap_fetch_spark.sinks.writers import VersionedArtifactSink

    r1 = run_pipeline(spark, SF_SMOKE, tmp_path, version="v1")
    assert r1["skipped"] is False and r1["rows"] > 0
    sink = VersionedArtifactSink(tmp_path)
    # both artifacts carry logged commits with schema + op
    csv_log = sink.commit_log(ARTIFACT_CSV)
    json_log = sink.commit_log(ARTIFACT_JSON)
    assert [e["op"] for e in csv_log] == ["artifact-csv"]
    assert [e["op"] for e in json_log] == ["artifact-json"]
    assert json_log[0]["version"] == "v1" and json_log[0]["schema"]
    # byte layout unchanged (fetch.go parity): latest + version objects
    assert (tmp_path / ARTIFACT_JSON / "latest").exists()
    assert (tmp_path / ARTIFACT_JSON / "v1").exists()
    # idempotent re-run is a no-op gated BY THE LOG
    assert run_pipeline(spark, SF_SMOKE, tmp_path, version="v1")["skipped"]
    assert len(sink.commit_log(ARTIFACT_JSON)) == 1
    # crash simulation: data objects present but log entry missing →
    # incomplete → the re-run re-executes and re-commits
    for p in (tmp_path / ARTIFACT_JSON / "_log").iterdir():
        p.unlink()
    r3 = run_pipeline(spark, SF_SMOKE, tmp_path, version="v1")
    assert r3["skipped"] is False
    assert len(sink.commit_log(ARTIFACT_JSON)) == 1
    data = _json.loads((tmp_path / ARTIFACT_JSON / "v1").read_text())
    assert isinstance(data, list) and len(data) == r3["rows"]


def test_winnow_exact_measure_budget_guard(spark, monkeypatch):
    """r7 verdict directive #3: the exact measure pre-flights sum(df^2)
    against SPARK_GRAFT_EXACT_PAIR_BUDGET and refuses with an error
    NAMING the scale twin, instead of filling disk mid-shuffle."""
    import pytest as _pytest

    from tests.conftest import SF_SMOKE

    from nzwirelessmap_fetch_spark.operators.text import (
        ExactMeasureBoundError,
        _WINNOW_PAIRS_CACHE,
        corpus_winnowing,
    )

    _WINNOW_PAIRS_CACHE.clear()
    monkeypatch.setenv("SPARK_GRAFT_EXACT_PAIR_BUDGET", "1")
    with _pytest.raises(ExactMeasureBoundError, match="corpus_winnowing_capped"):
        corpus_winnowing(spark, SF_SMOKE)
    monkeypatch.delenv("SPARK_GRAFT_EXACT_PAIR_BUDGET")
    assert corpus_winnowing(spark, SF_SMOKE).count() >= 0
    _WINNOW_PAIRS_CACHE.clear()


def test_lsh_eval_sequenced_oracle_equals_oneshot(spark, ddb):
    """r7 verdict directive #3: the sequenced gate oracle (two temp-table
    steps + final select, one disk-spilling pipeline per statement) must
    equal the one-shot driver oracle — both are assembled from the same
    SQL fragments, and this pins the assembly."""
    from nzwirelessmap_fetch_spark.operators.dedup import (
        DEDUP_LSH_QUALITY_EVAL_SQL,
        DEDUP_LSH_QUALITY_EVAL_SQL_STEPS,
    )
    from tests.oracle import frame_fingerprint

    oneshot = ddb.execute(DEDUP_LSH_QUALITY_EVAL_SQL).df()
    for step in DEDUP_LSH_QUALITY_EVAL_SQL_STEPS[:-1]:
        ddb.execute(step)
    sequenced = ddb.execute(DEDUP_LSH_QUALITY_EVAL_SQL_STEPS[-1]).df()
    assert frame_fingerprint(oneshot) == frame_fingerprint(sequenced)
    # registry exposure: the gate harness finds the steps by name
    from nzwirelessmap_fetch_spark.plans import registry

    steps = registry.oracle_gate_steps()
    assert "dedup_lsh_quality_eval" in steps
    assert steps["dedup_lsh_quality_eval"][-1] == DEDUP_LSH_QUALITY_EVAL_SQL_STEPS[-1]


def test_inter_cache_transform_parity(ddb):
    """The gate's inter-CTE cache rewrite (tools/oracle_cache.py) must
    be result-identical to the committed one-shot oracles for every
    ELIGIBLE entry — the full-allowlist pin behind the sf1 gate's
    shared quadratic substrate."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from nzwirelessmap_fetch_spark.plans import registry
    from tools.oracle_cache import ELIGIBLE, sequenced
    from tests.oracle import frame_fingerprint

    oracles = entrymod.oracle_sql()
    steps = registry.oracle_gate_steps()
    assert ELIGIBLE <= set(oracles)
    ddb.execute("DROP TABLE IF EXISTS _gate_inter_lt")
    for name in sorted(ELIGIBLE):
        statements = list(steps.get(name) or [oracles[name]])
        cached = sequenced(name, statements)
        assert cached is not None and len(cached) == len(statements) + 1
        oneshot = ddb.execute(oracles[name]).df()
        for stmt in cached[:-1]:
            ddb.execute(stmt)
        got = ddb.execute(cached[-1]).df()
        assert frame_fingerprint(oneshot) == frame_fingerprint(got), name
    # the capped variants must be refused by the ALLOWLIST (their
    # keep-filtered postings keep the canonical CTE names, so only the
    # explicit name check keeps the cache out of them)
    assert sequenced("dedup_ngram_jaccard_capped", [oracles["dedup_ngram_jaccard_capped"]]) is None
    assert sequenced("corpus_containment_capped", [oracles["corpus_containment_capped"]]) is None


def test_pattern_match_gate_oracle_parity(ddb):
    """The linear window-carry gate oracle for events_pattern_match must
    equal the independent one-shot (quadratic v×p) oracle — the
    formulation swap that survives a Zipfian user key at sf1."""
    from nzwirelessmap_fetch_spark.operators.events_analytics import (
        EVENTS_PATTERN_MATCH_SQL,
        EVENTS_PATTERN_MATCH_SQL_STEPS,
    )
    from tests.oracle import frame_fingerprint

    oneshot = ddb.execute(EVENTS_PATTERN_MATCH_SQL).df()
    assert len(EVENTS_PATTERN_MATCH_SQL_STEPS) == 1
    got = ddb.execute(EVENTS_PATTERN_MATCH_SQL_STEPS[0]).df()
    assert frame_fingerprint(oneshot) == frame_fingerprint(got)


def test_asof_nearest_gate_oracle_parity(ddb):
    """The linear two-carry gate oracle for asof_nearest_click must equal
    the independent one-shot (quadratic ranking) oracle, at sf0.01 and
    on the Zipf-skew fixture (where the user key is hub-heavy)."""
    import os as _os

    import duckdb as _duckdb

    from nzwirelessmap_fetch_spark.operators.asof import (
        ASOF_NEAREST_CLICK_SQL,
        ASOF_NEAREST_CLICK_SQL_STEPS,
    )
    from tests.oracle import frame_fingerprint

    assert len(ASOF_NEAREST_CLICK_SQL_STEPS) == 1
    a = ddb.execute(ASOF_NEAREST_CLICK_SQL).df()
    b = ddb.execute(ASOF_NEAREST_CLICK_SQL_STEPS[0]).df()
    assert frame_fingerprint(a) == frame_fingerprint(b)
    skew = "/root/repo/.skew_fixture/events.parquet"
    if _os.path.exists(skew):
        con = _duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{skew}')")
        a = con.execute(ASOF_NEAREST_CLICK_SQL).df()
        b = con.execute(ASOF_NEAREST_CLICK_SQL_STEPS[0]).df()
        assert frame_fingerprint(a) == frame_fingerprint(b)


def test_kn_gate_oracle_parity(ddb):
    """The stepwise KN gate oracle (temp-table big, one equi-join per
    statement) must equal the one-shot — the formulation that denies
    DuckDB's join-order optimizer the lft x cont cross product it picks
    on a 1M-bigram vocabulary."""
    from nzwirelessmap_fetch_spark.operators.text import (
        TEXT_KNESER_NEY_BIGRAM_SQL,
        TEXT_KNESER_NEY_BIGRAM_SQL_STEPS,
    )
    from tests.oracle import frame_fingerprint

    oneshot = ddb.execute(TEXT_KNESER_NEY_BIGRAM_SQL).df()
    for stmt in TEXT_KNESER_NEY_BIGRAM_SQL_STEPS[:-1]:
        ddb.execute(stmt)
    got = ddb.execute(TEXT_KNESER_NEY_BIGRAM_SQL_STEPS[-1]).df()
    assert frame_fingerprint(oneshot) == frame_fingerprint(got)
