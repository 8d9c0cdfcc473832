"""P8-P12 end-to-end: SQLite database → Spark DataFrames.

The reference's ingest is Access → SQLite via a vendored jar
(fetch.go:189-196), after which every query runs against the SQLite file.
This module is the Spark-side twin of that landing zone: discover the
tables (P8), map the closed type system (P9), register temp views (P10),
and copy rows in with the MONEY/BOOLEAN conversions (P12) — so a user can
point the engine at the same ``.sqlite3`` artifact the reference produces
and query it with Spark SQL.

Two paths:
- ``read_jdbc`` (sources/readers.py) when a sqlite-JDBC driver jar is on
  the Spark classpath — the production path (partitioned reads, no driver
  staging). This container ships no such jar, so:
- this module's stdlib-``sqlite3`` staging path: rows stream through the
  driver in bounded batches into an Arrow ``ParquetWriter``, then Spark
  scans the staged parquet. Driver memory stays bounded at one batch, and
  the scan itself is a real distributed columnar read (pushdown, pruning,
  parallel row groups) — not a ``createDataFrame`` of driver rows. Fine
  for the reference's data scale (a national licence DB); at 100 TB the
  landing zone is parquet/JDBC from the start, same downstream plan.

Type discipline: the mdb-sqlite converter emits exactly five SQLite
column types (BLOB, INTEGER, DATETIME, DOUBLE, TEXT — SURVEY.md §1.2), so
the map below is CLOSED and unknown declared types fail loudly, the same
contract as the jar's ``SQLException("Unhandled MS Acess datatype:")``.
"""

from __future__ import annotations

import sqlite3
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Closed map of the SQLite column types the Access converter emits
# (AccessExporter#createTable tableswitch — SURVEY.md §1.2).
SQLITE_TYPE_MAP: dict[str, T.DataType] = {
    "BLOB": T.BinaryType(),
    "INTEGER": T.LongType(),   # SQLite INTEGER is up to 64-bit
    "DATETIME": T.StringType(),  # converter stores datetimes as text; parse downstream
    "DOUBLE": T.DoubleType(),
    "TEXT": T.StringType(),
    "": T.StringType(),        # SQLite allows untyped columns; affinity = TEXT-ish
}

FETCH_BATCH_ROWS = 10_000  # driver staging batch: bounded memory, not row-at-a-time


def map_sqlite_type(declared: str) -> T.DataType:
    """Closed-map lookup on the DECLARED column type; loud failure on
    anything the Access converter can't have produced."""
    key = declared.strip().upper()
    try:
        return SQLITE_TYPE_MAP[key]
    except KeyError:
        raise ValueError(f"Unhandled SQLite column type: {declared!r}") from None


def discover_tables(db_path: str | Path) -> list[str]:
    """P8: enumerate user tables (mirrors ``Database.getTableNames``)."""
    with sqlite3.connect(db_path) as conn:
        rows = conn.execute(
            "SELECT name FROM sqlite_master WHERE type = 'table' "
            "AND name NOT LIKE 'sqlite_%' ORDER BY name"
        ).fetchall()
    return [r[0] for r in rows]


def discover_schema(db_path: str | Path, table: str) -> T.StructType:
    """P8/P9: PRAGMA table_info → explicit StructType via the closed map."""
    with sqlite3.connect(db_path) as conn:
        cols = conn.execute(f"PRAGMA table_info('{table}')").fetchall()
    if not cols:
        raise ValueError(f"table {table!r} not found in {db_path}")
    return T.StructType(
        [T.StructField(name, map_sqlite_type(decl), True) for _, name, decl, *_ in cols]
    )


# Arrow physical types for the closed SQLite map (parquet staging schema).
_ARROW_TYPES: dict[str, pa.DataType] = {
    "binary": pa.binary(),
    "bigint": pa.int64(),
    "double": pa.float64(),
    "string": pa.string(),
}


def _arrow_schema(schema: T.StructType) -> pa.Schema:
    return pa.schema(
        [(f.name, _ARROW_TYPES[f.dataType.simpleString()]) for f in schema.fields]
    )


def stage_sqlite_table_to_parquet(
    db_path: str | Path, table: str, staging_dir: str | Path
) -> tuple[Path, T.StructType]:
    """Stream one SQLite table into a staged parquet file.

    Rows flow in bounded batches (FETCH_BATCH_ROWS) through an Arrow
    ``ParquetWriter`` — the reference's row-at-a-time ``executeUpdate``
    loop (AccessExporter#populateTable) collapsed into columnar batch
    copies with O(batch) driver memory regardless of table size."""
    schema = discover_schema(db_path, table)
    arrow = _arrow_schema(schema)
    staging = Path(staging_dir)
    staging.mkdir(parents=True, exist_ok=True)
    dest = staging / f"{table}.parquet"
    with sqlite3.connect(db_path) as conn, pq.ParquetWriter(dest, arrow) as writer:
        cur = conn.execute(f"SELECT * FROM '{table}'")
        while rows := cur.fetchmany(FETCH_BATCH_ROWS):
            cols = list(zip(*rows))
            writer.write_batch(
                pa.record_batch(
                    [pa.array(c, type=f.type) for c, f in zip(cols, arrow)],
                    schema=arrow,
                )
            )
    return dest, schema


def read_sqlite_table(
    spark: SparkSession,
    db_path: str | Path,
    table: str,
    staging_dir: str | Path | None = None,
) -> DataFrame:
    """Stage one SQLite table and return a distributed scan over it.

    The result is a real parquet scan (column pruning + predicate
    pushdown reach the staged file), not a driver-resident local
    relation."""
    staging = Path(staging_dir) if staging_dir else Path(tempfile.mkdtemp(prefix="sqlite_stage_"))
    dest, schema = stage_sqlite_table_to_parquet(db_path, table, staging)
    return spark.read.schema(schema).parquet(str(dest))


def register_sqlite_database(
    spark: SparkSession,
    db_path: str | Path,
    prefix: str = "",
    staging_dir: str | Path | None = None,
) -> dict[str, DataFrame]:
    """P10: every table in the database becomes a temp view — after this,
    ``spark.sql`` replaces the reference's sqlite3-CLI query step."""
    staging = Path(staging_dir) if staging_dir else Path(tempfile.mkdtemp(prefix="sqlite_stage_"))
    out: dict[str, DataFrame] = {}
    for t in discover_tables(db_path):
        df = read_sqlite_table(spark, db_path, t, staging)
        df.createOrReplaceTempView(f"{prefix}{t}")
        out[t] = df
    return out
