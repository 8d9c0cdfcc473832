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
