"""Growth probe for the checkpointed txn log (r8 verdict directive #6
"done" criterion): read_as_of resolution cost must be FLAT in version
count. Pure protocol — no SparkSession; commits are raw _commit_logged
appends with 1-file parquet data dirs.

    python tools/scaling_txn_checkpoint.py

Prints a markdown growth table for SCALING.md: per version-count decade,
the mean wall time and the number of log-file reads for one
version_as_of resolution, with and without the checkpoint path.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from nzwirelessmap_fetch_spark.sinks import writers as W


def build(n: int) -> tuple[str, W.SnapshotParquetTable]:
    root = tempfile.mkdtemp(prefix=f"cp-growth-{n}-")
    sink = W.SnapshotParquetTable(root)
    for i in range(n):
        d = sink._dir("t", f"v{i}")
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(pa.table({"k": [i]}), d / "part-0.parquet")
        sink._commit_logged(
            "t", f"v{i}", [["k", "bigint"]],
            commit_ts=f"2024-01-01T{i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}.000000Z",
        )
    return root, sink


def probe(sink: W.SnapshotParquetTable, n: int, use_checkpoint: bool) -> tuple[float, int]:
    ts = f"2024-01-01T{(n // 2) // 3600:02d}:{((n // 2) // 60) % 60:02d}:{(n // 2) % 60:02d}.000000Z"
    reads = {"n": 0}
    orig = W.Path.read_text

    def counting(selfp, *a, **kw):
        if selfp.suffix == ".json":
            reads["n"] += 1
        return orig(selfp, *a, **kw)

    W.Path.read_text = counting
    try:
        if not use_checkpoint:
            ptr = sink._checkpoint_pointer("t")
            saved = ptr.read_text() if ptr.exists() else None
            if saved is not None:
                ptr.unlink()
        t0 = time.perf_counter()
        for _ in range(5):
            v = sink.version_as_of("t", ts)
        dt = (time.perf_counter() - t0) / 5
        if not use_checkpoint and saved is not None:
            ptr.write_text(saved)
    finally:
        W.Path.read_text = orig
    assert v == f"v{n // 2}"
    return dt, reads["n"] // 5


def main() -> None:
    print("| versions | as-of via checkpoint (ms / file reads) | full-scan path (ms / file reads) |")
    print("|---|---|---|")
    for n in (10, 100, 1000):
        root, sink = build(n)
        cp_dt, cp_reads = probe(sink, n, use_checkpoint=True)
        fs_dt, fs_reads = probe(sink, n, use_checkpoint=False)
        print(
            f"| {n} | {cp_dt * 1000:.2f} / {cp_reads} "
            f"| {fs_dt * 1000:.2f} / {fs_reads} |",
            flush=True,
        )
        shutil.rmtree(root)


if __name__ == "__main__":
    main()
