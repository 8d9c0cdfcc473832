"""Table-lifecycle growth rows (r7 verdict directive #6): time
optimize / merge_into / restore / vacuum on the orders table across
three SF decades and report actual rewritten bytes, so the compaction
planner's target math is validated against real on-disk sizes.

    python tools/scaling_tableops.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nzwirelessmap_fetch_spark.session import get_spark  # noqa: E402
from nzwirelessmap_fetch_spark.sinks.writers import SnapshotParquetTable  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(REPO, ".scaling_sf1")),
]
FRAG_FILES = 64


def main() -> None:
    spark = get_spark(
        "scaling-tableops", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    rows = []
    for tag, sf in FIXTURES:
        root = tempfile.mkdtemp(prefix=f"tableops-{tag}-")
        sink = SnapshotParquetTable(root)
        orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))
        n = orders.count()

        t0 = time.monotonic()
        sink.write_version(orders.repartition(FRAG_FILES), "orders", "1")
        t_write = time.monotonic() - t0

        t0 = time.monotonic()
        stats = sink.optimize(
            spark, "orders", "2", cluster_by=["o_orderdate", "o_orderkey"]
        )
        t_opt = time.monotonic() - t0

        # MERGE: ~1% of keys updated + 1000 inserts
        changes = (
            orders.filter(F.col("o_orderkey") % 100 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1)
            .unionByName(
                orders.limit(1000).withColumn(
                    "o_orderkey", F.col("o_orderkey") + 2_000_000_000
                )
            )
        )
        n_changes = changes.count()
        t0 = time.monotonic()
        sink.merge_into(spark, "orders", changes, "o_orderkey", "3")
        t_merge = time.monotonic() - t0

        t0 = time.monotonic()
        sink.restore(spark, "orders", "2", "4")
        t_restore = time.monotonic() - t0

        t0 = time.monotonic()
        vac = sink.vacuum("orders", keep_latest=2)
        t_vac = time.monotonic() - t0

        rows.append(
            (
                tag,
                n,
                stats["bytes_before"],
                stats["files_after"],
                stats["target_files"],
                n_changes,
                round(t_write, 2),
                round(t_opt, 2),
                round(t_merge, 2),
                round(t_restore, 2),
                round(t_vac, 2),
                len(vac["removed_expired"]) + len(vac["removed_orphans"]),
            )
        )
        shutil.rmtree(root)
        print(f"{tag}: done", flush=True)

    print(
        "\n| sf | orders rows | bytes_before | files 64→ | target | "
        "merge Δrows | write v1 s | optimize s | merge s | restore s | "
        "vacuum s | dirs GC'd |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
