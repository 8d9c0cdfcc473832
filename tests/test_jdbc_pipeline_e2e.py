"""Derby-backed §3.1 DAG rehearsal (r6 verdict directive #9): ONE test
composing acquire → zip tree staging → LIVE JDBC ingest (Derby embedded,
the driver Spark ships) → flagship SQL → versioned multi-sink with
marker-last ordering → idempotent re-run probe. This is the reference's
real flow (fetch.go:26-161) with the database behind an actual JDBC
driver — the UCanAccess deployment swaps driver + URL factory only."""

from __future__ import annotations

import threading
import zipfile
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import pytest

from tests.conftest import SF_SMOKE

FLAGSHIP_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]


@pytest.fixture(scope="module")
def derby_zip(tmp_path_factory):
    """Derby database loaded FROM the fixture parquet via Spark's JDBC
    writer (the distributed row-copy, P12), cleanly shut down, then
    zipped as a directory tree under prismdb/ — the served artifact."""
    from py4j.protocol import Py4JJavaError

    from nzwirelessmap_fetch_spark.session import get_spark

    root = tmp_path_factory.mktemp("derbysrc")
    db = root / "prismdb"
    spark = get_spark("derby-build", cpus=4)
    for t in FLAGSHIP_TABLES:
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        # Derby's dialect maps StringType -> CLOB, which rejects the
        # comparisons Spark pushes down; declare VARCHAR explicitly
        # (what a real schema would use)
        varchars = ", ".join(
            f"{c} VARCHAR(1024)" for c, dt in df.dtypes if dt == "string"
        )
        w = (
            df.write.format("jdbc")
            .option("url", f"jdbc:derby:{db};create=true")
            .option("dbtable", t)
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        )
        if varchars:
            w = w.option("createTableColumnTypes", varchars)
        w.mode("overwrite").save()
    # clean shutdown flushes the store (Derby signals success via
    # SQLException 08006, surfacing here as Py4JJavaError)
    try:
        spark._jvm.java.sql.DriverManager.getConnection(  # noqa: SLF001
            f"jdbc:derby:{db};shutdown=true"
        )
    except Py4JJavaError:
        pass
    zip_path = root / "prism-derby.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in sorted(db.rglob("*")):
            if p.is_file():
                zf.write(p, f"prismdb/{p.relative_to(db)}")
    return zip_path


@pytest.fixture(scope="module")
def http_source(derby_zip):
    handler = partial(
        SimpleHTTPRequestHandler, directory=str(Path(derby_zip).parent)
    )
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}/{Path(derby_zip).name}"
    server.shutdown()


def test_jdbc_pipeline_end_to_end(spark, http_source, tmp_path):
    """Full DAG over a real JDBC engine, output equal to the parquet
    flagship, marker-last sink layout, and the P3 skip on re-run."""
    from nzwirelessmap_fetch_spark.pipeline import (
        ARTIFACT_CSV,
        ARTIFACT_JSON,
        run_pipeline_from_url_jdbc,
    )
    from nzwirelessmap_fetch_spark.plans.flagship import flagship

    out = tmp_path / "out"
    r1 = run_pipeline_from_url_jdbc(
        spark, http_source, tmp_path / "staging", out
    )
    assert r1["skipped"] is False
    # the flagship over the JDBC-ingested tables equals the parquet run
    expected = flagship(spark, SF_SMOKE).count()
    assert r1["rows"] == expected > 0
    # multi-sink layout (fetch.go parity): versioned CSV; JSON gets the
    # latest pointer FIRST and the timestamped completion marker LAST
    assert (out / ARTIFACT_CSV / r1["version"]).exists()
    assert (out / ARTIFACT_JSON / r1["version"]).exists()
    assert (out / ARTIFACT_JSON / "latest").exists()
    # idempotent re-run: the timestamped JSON marker gates everything
    r2 = run_pipeline_from_url_jdbc(
        spark, http_source, tmp_path / "staging2", out
    )
    assert r2 == {"skipped": True, "version": r1["version"], "rows": None}


def test_jdbc_discovery_skips_system_catalogs(spark, derby_zip, tmp_path):
    """P8 over JDBC metadata: exactly the user tables, no SYS catalogs."""
    from nzwirelessmap_fetch_spark.sources.readers import discover_jdbc_tables
    from nzwirelessmap_fetch_spark.sources.zip_staging import stage_tree

    db_root = stage_tree(derby_zip, "prismdb/", tmp_path / "tree")
    names = discover_jdbc_tables(
        spark,
        f"jdbc:derby:{db_root}",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert sorted(n.lower() for n in names) == sorted(FLAGSHIP_TABLES)
