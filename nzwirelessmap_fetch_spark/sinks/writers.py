"""Output sinks re-creating the reference's artifact contract
(SURVEY.md §2.1 P15-P18, §7.4).

The reference writes four artifacts per run, keyed by the source's
Last-Modified timestamp, with a mutable ``latest`` pointer and a
timestamped JSON object written LAST as the completion marker
(fetch.go:149-157: "the timestamped write is how we tell the pipeline
completed end-to-end"). A crash mid-run therefore never looks complete,
and the marker doubles as the idempotency key (fetch.go:55-67).

Spark-native translation:
- headered CSV / NDJSON: ``df.write`` (distributed, committer-atomic).
- bug-compat single JSON array (csv2json2.py:3 emits ONE array, not
  NDJSON): requires driver materialization → hard-gated by a row budget.
  At 100 TB you use NDJSON + a manifest; the array writer exists for
  byte-level parity on small results only.
- all-string projection: P16 — every value stringified, NULL → '' (the
  CSV boundary semantics).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.compat import all_string

# Driver-side materialization budget for the bug-compat array writer.
SINGLE_ARRAY_MAX_ROWS = 1_000_000


def to_all_strings(df: DataFrame) -> DataFrame:
    """P16: the reference's public result type system is
    Array<Map<String,String>> — stringify every column, NULL → ''."""
    return df.select([all_string(c).alias(c) for c in df.columns])


def write_headered_csv(df: DataFrame, path: str) -> None:
    """P15: headered CSV (sqlite3 ``.headers on`` / ``.mode csv``)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_ndjson(df: DataFrame, path: str) -> None:
    """The scale-correct JSON sink (one record per line, distributed)."""
    df.write.mode("overwrite").json(path)


def write_single_json_array(df: DataFrame, path: str | Path) -> None:
    """P17 bug-compat: ONE JSON array of all-string records
    (csv2json2.py:1-3). Materializes on the driver — guarded."""
    n = df.count()
    if n > SINGLE_ARRAY_MAX_ROWS:
        raise ValueError(
            f"single-array JSON writer is driver-side; {n} rows exceeds the "
            f"{SINGLE_ARRAY_MAX_ROWS} budget — use write_ndjson at scale"
        )
    records = [row.asDict() for row in to_all_strings(df).collect()]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(records, f)


class VersionedArtifactSink:
    """P3 + P18: ``root/<artifact>/<version>`` layout with a ``latest``
    pointer and marker-last ordering.

    write order (fetch.go:149-157 parity):
        1. ``latest``  (mutable pointer, STANDARD-class in the reference)
        2. ``<version>`` (completion marker, NEARLINE in the reference)

    ``exists(version)`` before running is the whole-pipeline memoization
    (fetch.go:55-67). Storage classes are bucket metadata, not engine
    behavior — documented, not emulated.
    """

    def __init__(self, root: str | Path):
        self.root = Path(root)

    def _path(self, artifact: str, version: str) -> Path:
        return self.root / artifact / version

    def exists(self, artifact: str, version: str) -> bool:
        return self._path(artifact, version).exists()

    def write_versioned_json(self, df: DataFrame, artifact: str, version: str) -> None:
        """latest first, version marker last — crash-safe completion
        semantics."""
        self.write_json_array_file(df, artifact, "latest")
        self.write_json_array_file(df, artifact, version)

    def write_json_array_file(self, df: DataFrame, artifact: str, version: str) -> None:
        write_single_json_array(df, self._path(artifact, version))

    def write_versioned_csv(self, df: DataFrame, artifact: str, version: str) -> None:
        write_headered_csv(df, str(self._path(artifact, version)))

    def write_versioned_ndjson(self, df: DataFrame, artifact: str, version: str) -> None:
        write_ndjson(df, str(self._path(artifact, version)))


def write_bucketed_table(
    df: DataFrame, name: str, n_buckets: int = 32, key: str | None = None
) -> None:
    """Materialize a managed table bucketed on its natural layout key
    (catalog.LAYOUT_KEYS) — the write-once shuffle that makes every later
    equi-join on that key exchange-free (tests/test_bucketing.py proves
    the plan property). The Spark replacement for the reference's
    secondary-index re-creation (SURVEY.md §2.1 P11)."""
    from ..catalog import LAYOUT_KEYS

    key = key or LAYOUT_KEYS.get(name)
    if key is None:
        raise ValueError(f"no layout key registered for table {name!r}")
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(name)
    )
