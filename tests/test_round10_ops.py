"""Round-10 verdict directives + ADVICE items.

- #5: content-hash canonicalization for Spark 4 collated strings
  (sql_string_collations loses its in-engine adjudication exemption)
  and length-prefixed string cells ('|' payloads can no longer make
  distinct rows hash identically — r9 ADVICE).
- #6: exact-measure refusal budget derived from the host (free spill
  disk / available RAM) instead of a tuned constant.
- ADVICE: vacuum sweeps stale '.v=X.vacuum.<pid>' tombstones; the
  checkpoint-pointer advance re-checks after replace.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_CORRECT


# ---------------------------------------------------------------- content hash


def test_content_hash_pipe_payloads_disambiguated(spark):
    """('a|b','c') and ('a','b|c') joined rows collided under the bare
    '|' join (r9 ADVICE); the length prefix makes them distinct — and
    both engines still agree on the new canonical form."""
    from nzwirelessmap_fetch_spark.functions.content_hash import (
        content_fingerprint,
        content_fingerprint_sql,
    )

    a = spark.createDataFrame([("a|b", "c")], "s string, t string")
    b = spark.createDataFrame([("a", "b|c")], "s string, t string")
    fa = content_fingerprint(a).collect()[0]
    fb = content_fingerprint(b).collect()[0]
    assert (fa["hash_sum"], fa["hash_xor"]) != (fb["hash_sum"], fb["hash_xor"])

    con = duckdb.connect()
    fields = [("s", "VARCHAR"), ("t", "VARCHAR")]
    oa = con.execute(
        content_fingerprint_sql("SELECT 'a|b' AS s, 'c' AS t", fields)
    ).fetchone()
    ob = con.execute(
        content_fingerprint_sql("SELECT 'a' AS s, 'b|c' AS t", fields)
    ).fetchone()
    assert (str(fa["hash_sum"]), int(fa["hash_xor"])) == (str(oa[1]), int(oa[2]))
    assert (str(fb["hash_sum"]), int(fb["hash_xor"])) == (str(ob[1]), int(ob[2]))


def test_content_hash_array_string_pipe_and_comma(spark):
    """Array<string> elements are length-prefixed too: ['a,b'] vs
    ['a','b'] and ['x|y'] vs two cells stay distinct, engine-portably."""
    from nzwirelessmap_fetch_spark.functions.content_hash import (
        content_fingerprint,
        content_fingerprint_sql,
    )

    a = spark.createDataFrame([(["a,b"],)], "xs array<string>")
    b = spark.createDataFrame([(["a", "b"],)], "xs array<string>")
    fa = content_fingerprint(a).collect()[0]
    fb = content_fingerprint(b).collect()[0]
    assert (fa["hash_sum"], fa["hash_xor"]) != (fb["hash_sum"], fb["hash_xor"])

    con = duckdb.connect()
    oa = con.execute(
        content_fingerprint_sql(
            "SELECT ['a,b']::VARCHAR[] AS xs", [("xs", "VARCHAR[]")]
        )
    ).fetchone()
    assert (str(fa["hash_sum"]), int(fa["hash_xor"])) == (str(oa[1]), int(oa[2]))


def test_content_hash_collated_string_supported(spark):
    """r9 verdict directive #5: UTF8_LCASE collated strings canonicalize
    via lower() — the oracle twin's explicit rewrite — so the last
    content-hash-exempt registry entry is now engine-adjudicable.
    Unknown collations stay loudly unsupported."""
    from nzwirelessmap_fetch_spark.functions.content_hash import (
        ContentHashUnsupported,
        content_fingerprint,
        content_fingerprint_sql,
    )

    df = spark.sql(
        "SELECT v COLLATE UTF8_LCASE AS s FROM VALUES ('MiXeD'), ('other') t(v)"
    )
    assert df.schema.fields[0].dataType.simpleString() == (
        "string collate UTF8_LCASE"
    )
    sfp = content_fingerprint(df).collect()[0]

    con = duckdb.connect()
    ofp = con.execute(
        content_fingerprint_sql(
            "SELECT lower(s) AS s FROM (VALUES ('MiXeD'), ('other')) t(s)",
            [("s", "VARCHAR")],
        )
    ).fetchone()
    assert int(sfp["n_rows"]) == int(ofp[0])
    assert str(sfp["hash_sum"]) == str(ofp[1])
    assert int(sfp["hash_xor"]) == int(ofp[2])

    # case variants are the SAME equivalence class → same fingerprint
    df2 = spark.sql("SELECT 'MIXED' COLLATE UTF8_LCASE AS s")
    df3 = spark.sql("SELECT 'mixed' COLLATE UTF8_LCASE AS s")
    f2 = content_fingerprint(df2).collect()[0]
    f3 = content_fingerprint(df3).collect()[0]
    assert (f2["hash_sum"], f2["hash_xor"]) == (f3["hash_sum"], f3["hash_xor"])

    bad = spark.sql("SELECT 'x' COLLATE UNICODE_CI AS s")
    with pytest.raises(ContentHashUnsupported):
        content_fingerprint(bad)


def test_sql_string_collations_now_engine_adjudicable(spark, ddb):
    """The registry entry itself: in-engine fingerprint green against
    the oracle — the r9 parity exemption is closed."""
    import __spark_entry__ as entrymod

    from nzwirelessmap_fetch_spark.functions.content_hash import (
        content_fingerprint,
        content_fingerprint_sql,
    )

    sdf = entrymod.queries()["sql_string_collations"](spark, SF_CORRECT)
    sfp = content_fingerprint(sdf).collect()[0]
    osql = entrymod.oracle_sql()["sql_string_collations"]
    desc = ddb.execute(f"DESCRIBE {osql}").fetchall()
    ofp = ddb.execute(
        content_fingerprint_sql(osql, [(d[0], d[1]) for d in desc])
    ).fetchone()
    assert int(sfp["n_rows"]) == int(ofp[0])
    assert str(sfp["hash_sum"]) == str(ofp[1])
    assert int(sfp["hash_xor"]) == int(ofp[2])


# ---------------------------------------------------------------- admission


def test_exact_budget_derivation_tracks_host():
    """r9 verdict directive #6: the refusal point is derived from free
    spill disk / available RAM — a smaller host refuses earlier, the
    dev box derives the same regime as the old 2e9 constant."""
    from nzwirelessmap_fetch_spark.functions import admission as adm

    dev = adm.derive_budget_for(
        disk_free=84 * 10**9, mem_available=128 * 2**30
    )
    assert 1_000_000_000 <= dev <= 3_000_000_000  # old-constant regime

    laptop = adm.derive_budget_for(
        disk_free=8 * 10**9, mem_available=8 * 2**30
    )
    assert laptop < dev / 5  # an order earlier, roughly ∝ disk

    # RAM-starved big-disk host: the memory term binds
    starved = adm.derive_budget_for(
        disk_free=1000 * 10**9, mem_available=2 * 2**30
    )
    assert starved < adm.derive_budget_for(
        disk_free=1000 * 10**9, mem_available=128 * 2**30
    )

    # floor: tiny hosts still run the sf0.01 gate's ~1e5 fan-outs
    assert adm.derive_budget_for(10**6, 10**6) >= adm.MIN_BUDGET

    # density families keep the old 4x ratio
    assert adm.derive_budget_for(84 * 10**9, 128 * 2**30, scale=0.25) * 4 == (
        pytest.approx(dev, rel=0.01)
    )


def test_exact_budget_env_override_is_absolute(monkeypatch):
    from nzwirelessmap_fetch_spark.functions import admission as adm

    monkeypatch.setenv("SPARK_GRAFT_EXACT_PAIR_BUDGET", "12345")
    assert adm.exact_pair_budget() == 12345
    assert adm.exact_pair_budget(scale=0.25) == 12345  # verbatim, as before
    monkeypatch.delenv("SPARK_GRAFT_EXACT_PAIR_BUDGET")
    assert adm.exact_pair_budget() >= adm.MIN_BUDGET


def test_spoofed_small_host_refuses_earlier(spark, monkeypatch):
    """End-to-end: on a spoofed tiny host (no env override) the winnow
    exact measure refuses at sf0.01 where the real host admits it."""
    import nzwirelessmap_fetch_spark.functions.admission as adm
    import nzwirelessmap_fetch_spark.operators.text as tx
    from nzwirelessmap_fetch_spark.operators.text import ExactMeasureBoundError

    monkeypatch.delenv("SPARK_GRAFT_EXACT_PAIR_BUDGET", raising=False)
    monkeypatch.setattr(adm, "disk_free_bytes", lambda: 10**7)  # 10 MB free
    monkeypatch.setattr(adm, "mem_available_bytes", lambda: 10**7)
    adm._derived_budget.cache_clear()
    monkeypatch.setattr(adm, "MIN_BUDGET", 1)
    try:
        monkeypatch.setattr(tx, "_WINNOW_PAIRS_CACHE", {})
        with pytest.raises(ExactMeasureBoundError, match="corpus_winnowing_capped"):
            tx.corpus_winnowing(spark, SF_CORRECT)
    finally:
        adm._derived_budget.cache_clear()
        tx._WINNOW_PAIRS_CACHE.clear()


# ---------------------------------------------------------------- vacuum


def test_vacuum_sweeps_stale_tombstones(spark, tmp_path):
    """A crash between os.rename and rmtree leaves a
    '.v=X.vacuum.<pid>' tombstone no 'v=*' glob revisits; vacuum now
    reaps tombstones older than the grace window (r9 ADVICE)."""
    import os
    import time

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    t = SnapshotParquetTable(tmp_path)
    df = spark.range(5).toDF("x")
    t.write_version(df, "tbl", "v1")
    t.write_version(df, "tbl", "v2")

    tomb = tmp_path / "tbl" / ".v=dead.vacuum.99999"
    tomb.mkdir()
    (tomb / "junk.parquet").write_bytes(b"x")
    old = time.time() - 7200
    os.utime(tomb, (old, old))

    fresh = tmp_path / "tbl" / ".v=young.vacuum.88888"
    fresh.mkdir()  # inside the grace window: a LIVE vacuum mid-delete

    t.vacuum("tbl", keep_latest=2, orphan_grace_sec=3600)
    assert not tomb.exists()
    assert fresh.exists()


def test_vacuum_tombstone_of_old_dir_is_grace_protected(spark, tmp_path):
    """os.rename preserves the version dir's old mtime, so a LIVE
    vacuum's just-renamed tombstone of an hours-old directory would
    look past-grace to a concurrent stale sweep and be deleted under
    its feet; _remove must touch the tombstone after the rename so the
    grace window measures time-since-rename."""
    import os
    import time

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    t = SnapshotParquetTable(tmp_path)
    df = spark.range(5).toDF("x")
    for v in ("v1", "v2", "v3"):
        t.write_version(df, "tbl", v)

    # age v1's data dir far past the grace window, as a long-lived
    # table's expired versions always are
    old = time.time() - 7200
    d = tmp_path / "tbl" / "v=v1"
    os.utime(d, (old, old))

    captured = {}
    orig_rmtree = __import__("shutil").rmtree

    def spying_rmtree(path, *a, **kw):
        p = str(path)
        if ".vacuum." in p and "v=v1" in p:
            captured["age"] = time.time() - os.stat(p).st_mtime
        return orig_rmtree(path, *a, **kw)

    import shutil as _shutil

    _shutil.rmtree, restore = spying_rmtree, orig_rmtree
    try:
        t.vacuum("tbl", keep_latest=2, orphan_grace_sec=3600)
    finally:
        _shutil.rmtree = restore

    # the tombstone observed at delete time was FRESH (touched after
    # rename), not carrying the 2 h-old dir mtime a concurrent sweep
    # would have reaped
    assert captured["age"] < 60
    assert not d.exists()


# ------------------------------------------------- multi-part checkpoints


def _commit_n(sink, table, n, start=0):
    """n raw commits (no data files — _commit_logged is the arbiter and
    the write-cost probe needs volume, not parquet)."""
    for i in range(start, start + n):
        sink._commit_logged(
            table, f"v{i}", [["k", "bigint"]],
            commit_ts=(
                f"2024-01-01T{i // 3600:02d}:{(i // 60) % 60:02d}:"
                f"{i % 60:02d}.000000Z"
            ),
        )


def test_checkpoint_cumulative_write_cost_is_subquadratic(tmp_path, monkeypatch):
    """r9 verdict directive #1: cumulative checkpoint bytes over V
    commits must be ~linear (O(V·logV)), not the r9 monolithic
    O(V²/interval). Measured by instrumenting every checkpoint-file
    publish across 1000 commits and comparing against BOTH growth
    models."""
    import math

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    sink = SnapshotParquetTable(tmp_path)
    written = {"bytes": 0}
    orig = SnapshotParquetTable._link_atomic

    def counting_link(self, table, payload, dest_name):
        import json as _json

        written["bytes"] += len(_json.dumps(payload, sort_keys=True))
        return orig(self, table, payload, dest_name)

    monkeypatch.setattr(SnapshotParquetTable, "_link_atomic", counting_link)
    V = 1000
    _commit_n(sink, "t", V)

    interval = sink.CHECKPOINT_INTERVAL
    n_cp = V // interval
    row_bytes = 60  # ~[seq, "vN", ts, "write"] serialized
    quadratic_model = row_bytes * interval * n_cp * (n_cp + 1) // 2  # r9 law
    loglinear_model = row_bytes * V * (math.log2(n_cp) + 2)
    assert written["bytes"] < quadratic_model / 4, (
        written["bytes"], quadratic_model)
    assert written["bytes"] < loglinear_model * 3, (
        written["bytes"], loglinear_model)

    # part count stays logarithmic and the state is exact
    cdir = sink._checkpoint_dir("t")
    state = sink._state("t")
    assert state["seq"] == V
    assert [r[0] for r in state["index"]] == list(range(1, V + 1))
    manifests = [p for p in cdir.iterdir() if p.name.endswith(".checkpoint.json")]
    assert len(manifests) <= sink.CHECKPOINT_KEEP
    import json as _json

    newest = max(manifests, key=lambda p: p.name)
    parts = _json.loads(newest.read_text())["parts"]
    assert len(parts) <= math.log2(n_cp) + 1


def test_checkpoint_retention_reaps_manifests_and_parts(tmp_path, monkeypatch):
    """Superseded manifests and merge-source parts are deleted past the
    grace window; live manifests keep every part they reference."""
    import json as _json

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    monkeypatch.setattr(SnapshotParquetTable, "CHECKPOINT_REAP_GRACE_SEC", 0.0)
    sink = SnapshotParquetTable(tmp_path)
    _commit_n(sink, "t", 100)
    cdir = sink._checkpoint_dir("t")
    manifests = sorted(
        p.name for p in cdir.iterdir() if p.name.endswith(".checkpoint.json")
    )
    assert manifests == ["00000090.checkpoint.json", "00000100.checkpoint.json"]
    on_disk = {p.name for p in cdir.iterdir() if p.name.endswith(".cppart")}
    referenced = set()
    for m in manifests:
        referenced.update(_json.loads((cdir / m).read_text())["parts"])
    assert referenced <= on_disk  # every referenced part exists
    assert on_disk == referenced  # nothing unreferenced survives at grace 0


def test_checkpoint_reads_monolithic_r9_format(tmp_path):
    """Back-compat: an r9-era monolithic checkpoint ('index' inline) is
    still readable, and the NEXT checkpoint re-homes it as a part."""
    import json as _json

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    sink = SnapshotParquetTable(tmp_path)
    _commit_n(sink, "t", 10)
    ldir = sink._log_dir("t")
    cdir = sink._checkpoint_dir("t")
    # rewrite the manifest in the r9 monolithic shape, FLAT in the log
    # dir where r9 wrote it (exercises the legacy-location fallback)
    m = ldir / "00000010.checkpoint.json"
    state = sink._state("t")
    mono = {
        "seq": 10,
        "index": state["index"],
        "schema": state["schema"],
        "latest": state["latest"],
    }
    for p in cdir.iterdir():
        if p.name.endswith(".cppart") or p.name.endswith(".checkpoint.json"):
            p.unlink()
    m.write_text(_json.dumps(mono, sort_keys=True))
    got = sink._state("t")
    assert got is not None and [r[0] for r in got["index"]] == list(range(1, 11))

    _commit_n(sink, "t", 10, start=10)  # next checkpoint at seq 20
    got = sink._state("t")
    assert got["seq"] == 20
    newest = _json.loads((cdir / "00000020.checkpoint.json").read_text())
    assert "parts" in newest
    assert got["latest"] == "v19"
    assert not m.exists()  # migration leaves no flat manifest behind


def test_checkpoint_missing_part_degrades_then_self_heals(tmp_path):
    """A reaped/lost part under a live manifest degrades _state to the
    full-scan fallback (never a wrong answer); the next checkpoint
    rebuilds from the entries and reads recover."""
    import json as _json

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    sink = SnapshotParquetTable(tmp_path)
    _commit_n(sink, "t", 20)
    cdir = sink._checkpoint_dir("t")
    newest = _json.loads((cdir / "00000020.checkpoint.json").read_text())
    (cdir / newest["parts"][0]).unlink()

    assert sink._state("t") is None  # loud degradation, not wrong data
    assert sink.resolve("t") == "v19"  # full-scan paths still correct
    assert sink.version_as_of("t", "2024-01-01T00:00:05.000000Z") == "v5"

    _commit_n(sink, "t", 10, start=20)  # checkpoint at 30 self-heals
    state = sink._state("t")
    assert state is not None and state["seq"] == 30
    assert [r[0] for r in state["index"]] == list(range(1, 31))


def test_checkpoint_read_cost_logarithmic_in_commits(tmp_path, monkeypatch):
    """Read cost after V=430 commits: pointer + manifest + ≤log parts +
    ≤interval tail — nowhere near O(V) file reads."""
    from nzwirelessmap_fetch_spark.sinks import writers as W

    sink = W.SnapshotParquetTable(tmp_path)
    _commit_n(sink, "t", 433)

    reads = {"n": 0}
    orig = W.Path.read_text

    def counting_read_text(self, *a, **kw):
        if self.suffix in (".json", ".cppart"):
            reads["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(W.Path, "read_text", counting_read_text)
    monkeypatch.setattr(
        sink, "log_entries",
        lambda table: (_ for _ in ()).throw(AssertionError("audit scan on hot path")),
    )
    assert sink.is_committed("t", "v431")
    assert reads["n"] <= sink.CHECKPOINT_INTERVAL + 2 + 8  # 8 ≥ log2(43)


# ---------------------------------------------------- sampled Lloyd training


def test_kmeans_train_stride_oracle_parity(ddb):
    """r9 verdict directive #3: the Lloyd training sample's stride and
    membership arithmetic replays identically in DuckDB from COUNT(*),
    and sizes the sample ∝ K·c (linear training cost)."""
    from nzwirelessmap_fetch_spark.operators.similarity import (
        KMEANS_TRAIN_PER_CELL,
        _TRAIN_MIX,
        _TRAIN_MOD,
        _adaptive_n_cells,
        _train_stride,
    )

    n = ddb.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    k = _adaptive_n_cells(n)
    stride = _train_stride(n, k)
    o_stride = ddb.execute(
        f"""SELECT GREATEST(1, COUNT(*) // (GREATEST(16,
              CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))
              * {KMEANS_TRAIN_PER_CELL})) FROM embeddings"""
    ).fetchone()[0]
    assert stride == o_stride

    # membership: python vs DuckDB integer arithmetic, larger stride so
    # the mix actually partitions (sf0.01 derives stride 1 = full corpus)
    big_stride = 7
    py_members = ddb.execute("SELECT vec_id FROM embeddings").df()["vec_id"]
    py_set = {int(v) for v in py_members
              if ((int(v) * _TRAIN_MIX) % _TRAIN_MOD) % big_stride == 0}
    ddb_set = {
        r[0]
        for r in ddb.execute(
            f"""SELECT vec_id FROM embeddings
                WHERE ((vec_id * {_TRAIN_MIX}) % {_TRAIN_MOD})
                      % {big_stride} = 0"""
        ).fetchall()
    }
    assert py_set == ddb_set and 0 < len(ddb_set) < n


def test_kmeans_training_cost_linear_in_corpus():
    """The sampled build's training fan-out |sample|·K ≈ c·K² = c·n is
    LINEAR across decades — vs the unsampled n·K = n^1.5 law."""
    from nzwirelessmap_fetch_spark.operators.similarity import (
        KMEANS_TRAIN_PER_CELL,
        _adaptive_n_cells,
        _train_stride,
    )

    prev = None
    for n in (10**4, 10**5, 10**6, 10**7):
        k = _adaptive_n_cells(n)
        sample = n // _train_stride(n, k)
        fanout = sample * k
        if prev is not None:
            assert fanout / prev < 15  # ~10x per decade = linear (±sqrt noise)
        prev = fanout
        assert sample <= KMEANS_TRAIN_PER_CELL * k * 2


# -------------------------------------------------- sf1 merge adjudication


def test_merge_adjudication_rules(tmp_path):
    """r9 ADVICE: (a) a schema mismatch fails an output-bounded row even
    when its content hash matches; (b) a bounded row's scale twin may
    itself be adjudicated via the output-bounded content-hash path."""
    import json
    import subprocess
    import sys

    # real registry names, so the tool's name validation passes
    def run(rows):
        src = tmp_path / "shard.json"
        out = tmp_path / "merged.json"
        src.write_text(json.dumps(rows))
        rc = subprocess.run(
            [sys.executable, "tools/merge_sf1_artifacts.py", str(out), str(src)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        return rc.returncode, rc.stdout

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    cb_green = {"output_bounded": True, "rows_match": True,
                "schema_match": True, "content_hash_match": True}

    # (a) rename-only divergence on the content-hash path must FAIL
    rc, _ = run({"dedup_exact": {**cb_green, "schema_match": False},
                 "p2p_links": green})
    assert rc == 1
    rc, _ = run({"dedup_exact": cb_green, "p2p_links": green})
    assert rc == 0

    # (b) a bounded row leaning on a content-hash-adjudicated twin passes
    rc, _ = run({
        "dedup_ngram_jaccard": {"bounded": True,
                                "scale_twin": "dedup_ngram_jaccard_capped"},
        "dedup_ngram_jaccard_capped": cb_green,
    })
    assert rc == 0
    # ...but not on a twin whose own schema mismatched
    rc, _ = run({
        "dedup_ngram_jaccard": {"bounded": True,
                                "scale_twin": "dedup_ngram_jaccard_capped"},
        "dedup_ngram_jaccard_capped": {**cb_green, "schema_match": False},
    })
    assert rc == 1

    # (c) a green row — by EITHER adjudication method — never loses to
    # a later source's errored re-run
    def run2(rows_a, rows_b):
        a, b = tmp_path / "a.json", tmp_path / "b.json"
        out = tmp_path / "merged.json"
        a.write_text(json.dumps(rows_a))
        b.write_text(json.dumps(rows_b))
        rc = subprocess.run(
            [sys.executable, "tools/merge_sf1_artifacts.py",
             str(out), str(a), str(b)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        return rc.returncode

    assert run2({"p2p_links": green},
                {"p2p_links": {"err": "OOM"}}) == 0
    assert run2({"dedup_exact": cb_green, "p2p_links": green},
                {"dedup_exact": {"err": "OOM"}}) == 0
    # a NON-green prior row IS refreshed by the later source
    assert run2({"p2p_links": {"rows_match": False}},
                {"p2p_links": green}) == 0
    assert run2({"p2p_links": green},
                {"p2p_links": {"rows_match": False, "schema_match": True,
                               "hash_match": False}}) == 1


# ------------------------------------- multi-part checkpoint under races


def _cp_commit_worker(root, wid, n_rounds, q):
    """Commit-only worker for the multi-part checkpoint stress: raw
    protocol commits with reap grace forced to 0 so retention races the
    other workers' merges as hard as possible."""
    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    SnapshotParquetTable.CHECKPOINT_REAP_GRACE_SEC = 0.0
    sink = SnapshotParquetTable(root)
    for r in range(n_rounds):
        sink._commit_logged(
            "t", f"w{wid}r{r}", [["k", "bigint"]],
        )
    q.put(("w", wid))


def _cp_reader_worker(root, wid, n_iters, q):
    """Reader racing checkpoint writes/merges/reaps: every _state must
    be either None (degradation to the full scan — allowed) or an EXACT
    prefix-consistent index (seqs 1..state.seq with unique versions).
    Time-boxed rather than iteration-boxed: it keeps probing until it
    has observed ≥n_iters checkpoint-backed states (or 20 s), so the
    liveness assertion cannot flake on spawn-startup jitter racing the
    first checkpoint."""
    import time

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    sink = SnapshotParquetTable(root)
    states = degraded = bad = 0
    deadline = time.monotonic() + 20.0
    while states < n_iters and time.monotonic() < deadline:
        state = sink._state("t")
        if state is None:
            degraded += 1
            continue
        states += 1
        seqs = [r[0] for r in state["index"]]
        if seqs != list(range(1, state["seq"] + 1)):
            bad += 1
        if len({r[1] for r in state["index"]}) != len(state["index"]):
            bad += 1
    q.put(("r", wid, states, degraded, bad))


def test_multipart_checkpoint_multiprocess_consistent(tmp_path):
    """4 committers × 25 commits with grace-0 reaping racing 2 readers:
    every reader-observed state is exact and gap-free (or a loud
    full-scan degradation, never wrong), the final checkpoint equals
    the audit scan, retention holds, and no scratch files leak."""
    import multiprocessing as mp

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    root = str(tmp_path)
    n_workers, n_rounds, n_readers, n_iters = 4, 25, 2, 150
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_cp_commit_worker, args=(root, w, n_rounds, q))
        for w in range(n_workers)
    ] + [
        ctx.Process(target=_cp_reader_worker, args=(root, w, n_iters, q))
        for w in range(n_readers)
    ]
    for p in procs:
        p.start()
    stats = [q.get(timeout=300) for _ in procs]
    for p in procs:
        p.join(timeout=300)
        assert p.exitcode == 0

    sink = SnapshotParquetTable(root)
    entries = sink.log_entries("t")
    assert len(entries) == n_workers * n_rounds
    state = sink._state("t")
    assert state is not None and state["seq"] == entries[-1]["seq"]
    assert [r[1] for r in state["index"]] == [e["version"] for e in entries]

    readers = [s for s in stats if s[0] == "r"]
    assert sum(s[4] for s in readers) == 0, "reader saw an inconsistent index"
    assert sum(s[2] for s in readers) > 0  # some reads used the checkpoint

    ldir = sink._log_dir("t")
    cdir = sink._checkpoint_dir("t")
    manifests = [p for p in cdir.iterdir() if p.name.endswith(".checkpoint.json")]
    assert len(manifests) <= SnapshotParquetTable.CHECKPOINT_KEEP
    scratch = list(ldir.iterdir()) + list(cdir.iterdir())
    assert not [p for p in scratch if p.name.endswith(".tmp")], (
        "leaked tmp files"
    )


def test_reap_grace_protects_unmanifested_parts(tmp_path, monkeypatch):
    """A committer that dies between part publish and manifest publish
    leaves an unreferenced .cppart; the grace window must keep it (so a
    slow committer's manifest is never orphaned by a racing reaper) and
    a past-grace reap must sweep it. Live referenced parts survive even
    a grace-0 reap."""
    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    sink = SnapshotParquetTable(tmp_path)
    _commit_n(sink, "t", 20)

    # simulate the mid-crash: part published, manifest never written
    orphan = sink._write_part(
        "t", 20, 30,
        [[21, "vX", "2024-01-01T00:00:21.000000Z", "write"]],
    )
    opath = sink._part_path("t", orphan)
    assert opath.exists()

    sink._reap_checkpoints("t")  # default 300 s grace: young orphan survives
    assert opath.exists()

    monkeypatch.setattr(SnapshotParquetTable, "CHECKPOINT_REAP_GRACE_SEC", 0.0)
    sink._reap_checkpoints("t")  # past grace: swept
    assert not opath.exists()

    # referenced parts are untouched by the grace-0 reap and reads work
    state = sink._state("t")
    assert state is not None and state["seq"] == 20
    assert [r[0] for r in state["index"]] == list(range(1, 21))


def test_content_hash_adversarial_values_cross_engine(spark):
    """Deterministic adversarial matrix through BOTH engines' canonical
    forms: tier-boundary doubles (the 9e12 / 9e24 pin branches), ±Inf,
    NaN (canonicalizes to NULL), -0.0, min/max BIGINT, empty / unicode /
    control-char / '|' strings, an all-NULL row, and a duplicated row
    (SUM must see it twice while XOR cancels — both engines must agree
    on both aggregates)."""
    import datetime as dt

    from nzwirelessmap_fetch_spark.functions.content_hash import (
        content_fingerprint,
        content_fingerprint_sql,
    )

    ts = dt.datetime(2024, 2, 29, 23, 59, 59, 999999)
    d = dt.date(2024, 2, 29)
    rows = [
        ("", -0.0, 0, ts, d),
        ("naïve—☃", 8.9e12, -9223372036854775808, ts, d),
        ("a|b", 9.1e12, 9223372036854775807, ts, d),
        ("tab\tand\nnewline", 1e25, -1, ts, d),
        (None, None, None, None, None),
        ("inf", float("inf"), 42, ts, d),
        ("-inf", float("-inf"), 7, ts, d),
        ("nan", float("nan"), 1, ts, d),
        ("a|b", 9.1e12, 9223372036854775807, ts, d),  # exact duplicate
    ]
    df = spark.createDataFrame(
        rows, "s string, x double, i bigint, t timestamp, dd date"
    )
    got = content_fingerprint(df).collect()[0]
    assert got["n_rows"] == len(rows)

    vals = ", ".join(
        "({})".format(", ".join([
            "NULL" if r[0] is None else "'" + r[0].replace(
                "\t", "'||chr(9)||'").replace("\n", "'||chr(10)||'") + "'",
            "NULL" if r[1] is None else (
                "'Infinity'::DOUBLE" if r[1] == float("inf")
                else "'-Infinity'::DOUBLE" if r[1] == float("-inf")
                else "'NaN'::DOUBLE" if r[1] != r[1]
                else f"CAST({r[1]!r} AS DOUBLE)"
            ),
            "NULL" if r[2] is None else f"CAST({r[2]} AS BIGINT)",
            "NULL" if r[3] is None else
            "TIMESTAMP '2024-02-29 23:59:59.999999'",
            "NULL" if r[4] is None else "DATE '2024-02-29'",
        ]))
        for r in rows
    )
    sql = (
        f"SELECT * FROM (VALUES {vals}) AS t(s, x, i, t, dd)"
    )
    fields = [
        ("s", "VARCHAR"), ("x", "DOUBLE"), ("i", "BIGINT"),
        ("t", "TIMESTAMP"), ("dd", "DATE"),
    ]
    con = duckdb.connect()
    oracle = con.execute(content_fingerprint_sql(sql, fields)).fetchone()
    assert int(oracle[0]) == len(rows)
    assert str(got["hash_sum"]) == str(oracle[1])
    assert int(got["hash_xor"]) == int(oracle[2])

    # the duplicate row is visible to SUM: dropping it changes hash_sum
    # but leaves hash_xor unchanged (xor of an identical pair cancels)
    got9 = got
    got8 = content_fingerprint(
        spark.createDataFrame(
            rows[:-1], "s string, x double, i bigint, t timestamp, dd date"
        )
    ).collect()[0]
    assert got8["hash_sum"] != got9["hash_sum"]
    # both aggregates must recover the SAME 60-bit row hash for the
    # dropped duplicate: sum difference = xor difference = h(dup row)
    dup_hash = int(str(got9["hash_sum"])) - int(str(got8["hash_sum"]))
    assert dup_hash == int(got8["hash_xor"]) ^ int(got9["hash_xor"])
    assert 0 <= dup_hash < 2**60


# ------------------------------------------------- sharded gate tool hygiene


def test_shard_layout_heavy_light_partition():
    """Shard 0 gets exactly the inter-cache-eligible (quadratic oracle)
    entries; the rest round-robin; the layout is a partition of the
    input; n_shards=1 degenerates to one shard."""
    from tools.oracle_cache import ELIGIBLE
    from tools.run_sharded_gate import shard_layout

    heavy = sorted(ELIGIBLE)[:3]
    assert heavy, "fixture assumption: some eligible entries exist"
    names = heavy + [f"light_{i}" for i in range(10)]

    shards = shard_layout(names, 4)
    assert shards[0] == heavy
    flat = [n for s in shards for n in s]
    assert sorted(flat) == sorted(names)  # partition: no dupes, no drops
    assert all(n.startswith("light_") for s in shards[1:] for n in s)

    assert shard_layout(names, 1) == [names]


def test_reap_orphan_spill_dirs(tmp_path, monkeypatch):
    """Dead-pid spill dirs are reaped; live-pid and non-numeric-suffix
    dirs are kept."""
    import subprocess
    import sys as _sys

    from tools import run_sharded_gate as G

    dead = subprocess.Popen([_sys.executable, "-c", "pass"])
    dead.wait()

    d_dead = tmp_path / f"duckdb_spill_{dead.pid}"
    d_live = tmp_path / f"duckdb_spill_{__import__('os').getpid()}"
    d_junk = tmp_path / "duckdb_spill_manual"
    for d in (d_dead, d_live, d_junk):
        d.mkdir()
        (d / "block").write_bytes(b"x")

    monkeypatch.setattr(
        G.glob, "glob", lambda pat: [str(d_dead), str(d_live), str(d_junk)]
    )
    reaped = G.reap_orphan_spill_dirs()
    assert reaped == [str(d_dead)]
    assert not d_dead.exists()
    assert d_live.exists() and d_junk.exists()


def test_extract_bench_sf1_shapes(tmp_path, capsys):
    """The sf1 bench extractor lifts spark_sec per entry, computes the
    headline subset by family prefix, and NAMES untimed rows (bounded
    refusals) instead of dropping them silently."""
    import json as _json

    from tools.extract_bench_sf1 import main as extract

    art = {
        "p2p_links": {"spark_sec": 1.5, "total_sec": 9.0},
        "dedup_exact": {"spark_sec": 2.0, "total_sec": 4.0},
        "agg_rollup": {"spark_sec": 0.5, "total_sec": 1.0},
        "corpus_winnowing": {"bounded": True, "total_sec": 0.1},  # refusal
        "_meta": "not-a-dict-row-guard",
    }
    src = tmp_path / "uniform.json"
    src.write_text(_json.dumps(art))
    out = tmp_path / "BENCH_SF1.json"

    assert extract(str(out), [f"uniform={src}"]) == 0
    got = _json.loads(out.read_text())
    shape = got["shapes"]["uniform"]
    assert shape["n_timed"] == 3
    assert shape["total_spark_sec"] == 4.0
    assert shape["headline"] == {"p2p_links": 1.5, "dedup_exact": 2.0}
    assert shape["headline_total_sec"] == 3.5
    assert shape["untimed"] == ["corpus_winnowing"]


def test_checkpoint_crash_at_every_publish_point(tmp_path):
    """Crash-safety sweep: simulate a committer dying immediately
    before EACH file operation inside the checkpoint path (part writes,
    manifest publish, pointer advance, reap) in turn. After every
    injected death a fresh reader must agree with the audit-scan truth
    — checkpoint-backed or loudly degraded, never wrong — and the next
    interval's checkpoint self-heals."""

    from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable

    class _Crash(BaseException):
        pass

    hooks = (
        "_write_part", "_link_atomic",
        "_advance_checkpoint_pointer", "_reap_checkpoints",
    )

    def sweep(k: int, root) -> bool:
        """Returns True if the k-th checkpoint op exists (else the sweep
        is past the end of the op sequence)."""
        state = {"armed": False, "n": 0, "crashed": False}
        orig = {h: getattr(SnapshotParquetTable, h) for h in hooks}
        orig_cp = SnapshotParquetTable._maybe_checkpoint

        def wrap(fn):
            def inner(self, *a, **kw):
                if state["armed"]:
                    if state["n"] == k:
                        state["crashed"] = True
                        raise _Crash()
                    state["n"] += 1
                return fn(self, *a, **kw)
            return inner

        def armed_cp(self, table, entry):
            state["armed"] = True
            try:
                return orig_cp(self, table, entry)
            finally:
                state["armed"] = False

        for h in hooks:
            setattr(SnapshotParquetTable, h, wrap(orig[h]))
        SnapshotParquetTable._maybe_checkpoint = armed_cp
        try:
            sink = SnapshotParquetTable(root)
            try:
                _commit_n(sink, "t", 10)  # checkpoint fires at seq 10
            except _Crash:
                pass
        finally:
            for h in hooks:
                setattr(SnapshotParquetTable, h, orig[h])
            SnapshotParquetTable._maybe_checkpoint = orig_cp

        # the dying committer still committed entry 10 before the
        # checkpoint path began — that is the truth a reader must see
        reader = SnapshotParquetTable(root)
        entries = reader.log_entries("t")
        assert len(entries) == 10
        assert reader.resolve("t") == "v9"
        assert reader.version_as_of("t", "2024-01-01T00:00:05.000000Z") == "v5"
        st = reader._state("t")
        if st is not None:  # checkpoint-backed read must be exact
            assert st["seq"] == 10
            assert [r[0] for r in st["index"]] == list(range(1, 11))
            assert st["latest"] == "v9"

        # survivors keep committing: the next interval self-heals
        _commit_n(reader, "t", 10, start=10)
        healed = reader._state("t")
        assert healed is not None and healed["seq"] == 20
        assert [r[0] for r in healed["index"]] == list(range(1, 21))
        assert reader.resolve("t") == "v19"
        return state["crashed"]

    k = 0
    while sweep(k, tmp_path / f"k{k}"):
        k += 1
        assert k < 64, "runaway op count in the checkpoint path"
    assert k >= 4, f"expected >=4 crash points, swept {k}"
