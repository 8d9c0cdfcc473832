"""Growth probe for the multi-part txn-log checkpoint (r9 verdict
directive #1 "done" criterion): cumulative checkpoint bytes over V
commits must grow ~linearly (O(V log V)), not quadratically (the r9
monolithic law: every checkpoint rewrote the full index, O(V²/interval)
cumulative). Pure protocol — no SparkSession, no data files; commits
are raw _commit_logged appends.

    python tools/scaling_checkpoint_bytes.py

Prints a markdown growth table for SCALING.md: per commit-count decade,
measured cumulative checkpoint bytes (parts + manifests), the r9
quadratic model's bytes for the same history, the ratio, the newest
manifest's part count, and one is_committed read's file-read count.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nzwirelessmap_fetch_spark.sinks import writers as W


def build_measuring(n: int) -> tuple[str, W.SnapshotParquetTable, int, int]:
    root = tempfile.mkdtemp(prefix=f"cp-bytes-{n}-")
    sink = W.SnapshotParquetTable(root)
    written = {"bytes": 0, "row_bytes": 0}
    orig = W.SnapshotParquetTable._link_atomic

    def counting(self, table, payload, dest_name):
        b = len(json.dumps(payload, sort_keys=True))
        written["bytes"] += b
        if dest_name.endswith(".cppart") and payload.get("lo") == 0:
            # full-history part: per-row serialized size for the model
            written["row_bytes"] = b // max(1, len(payload["index"]))
        return orig(self, table, payload, dest_name)

    W.SnapshotParquetTable._link_atomic = counting
    try:
        for i in range(n):
            sink._commit_logged(
                "t", f"v{i}", [["k", "bigint"]],
                commit_ts=(
                    f"2024-01-01T{i // 3600:02d}:{(i // 60) % 60:02d}:"
                    f"{i % 60:02d}.000000Z"
                ),
            )
    finally:
        W.SnapshotParquetTable._link_atomic = orig
    return root, sink, written["bytes"], written["row_bytes"] or 60


def read_cost(sink: W.SnapshotParquetTable, n: int) -> int:
    reads = {"n": 0}
    orig = W.Path.read_text

    def counting(selfp, *a, **kw):
        if selfp.suffix in (".json", ".cppart"):
            reads["n"] += 1
        return orig(selfp, *a, **kw)

    W.Path.read_text = counting
    try:
        assert sink.is_committed("t", f"v{n // 2}")
    finally:
        W.Path.read_text = orig
    return reads["n"]


def main() -> None:
    interval = W.SnapshotParquetTable.CHECKPOINT_INTERVAL
    print(
        "| commits | multi-part cumulative bytes | r9 monolithic model | "
        "ratio | parts in newest manifest | is_committed file reads |"
    )
    print("|---|---|---|---|---|---|")
    for n in (100, 1000, 10000):
        root, sink, measured, row_bytes = build_measuring(n)
        n_cp = n // interval
        mono = row_bytes * interval * n_cp * (n_cp + 1) // 2
        cdir = sink._checkpoint_dir("t")
        newest = max(
            (p for p in cdir.iterdir() if p.name.endswith(".checkpoint.json")),
            key=lambda p: p.name,
        )
        parts = len(json.loads(newest.read_text())["parts"])
        reads = read_cost(sink, n)
        print(
            f"| {n} | {measured:,} | {mono:,} | {measured / mono:.3f} | "
            f"{parts} (log2({n_cp})={math.log2(n_cp):.1f}) | {reads} |"
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
