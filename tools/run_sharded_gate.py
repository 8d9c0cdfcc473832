"""Sharded full-registry oracle gate for large fixtures (r7 verdict
directive #2: the sf1 gate must also run on the REALISTIC Zipf corpus).

Runs tools/check_queries.py as N round-robin shards (memory notes: one
process's DuckDB side of a quadratic oracle peaks ~50 GB unbounded, and
N concurrent 48 g Spark drivers oversubscribe the box — both knobs are
set per shard below), then merges with tools/merge_sf1_artifacts.py.

    python tools/run_sharded_gate.py SF_DIR OUT.json [--shards N]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str]) -> int:
    sf_dir, out = argv[0], argv[1]
    n_shards = int(argv[argv.index("--shards") + 1]) if "--shards" in argv else 3

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    shards = [names[i::n_shards] for i in range(n_shards)]
    procs = []
    shard_files = []
    for i, shard in enumerate(shards):
        env = dict(
            os.environ,
            SPARK_GRAFT_CHECK_SF=sf_dir,
            SPARK_GRAFT_CHECK_OUT=os.path.join(REPO, f".gate_shard{i}.json"),
            SPARK_GRAFT_DUCKDB_MEM="24GB",
            SPARK_GRAFT_DRIVER_MEM="20g",
            SPARK_GRAFT_CPUS="10",
            SPARK_GRAFT_ORACLE_SEQ="1",
            # NOTE (r9, measured): do NOT set SPARK_GRAFT_ORACLE_LOCK on
            # round-robin shards — check_queries takes the lock around
            # EVERY oracle execution in seq mode, so one shard's
            # 20-minute quadratic build serializes all shards to ~zero
            # throughput. The lock belongs to the r8 H/L layout only:
            # one H shard owning every heavy oracle (builds the inter
            # cache once), lock-free L shards for the rest.
        )
        shard_files.append(env["SPARK_GRAFT_CHECK_OUT"])
        log = open(os.path.join(REPO, f".gate_shard{i}.log"), "w")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, os.path.join(REPO, "tools/check_queries.py")]
                    + shard,
                    env=env,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                    cwd=REPO,
                ),
                log,
            )
        )
        print(f"shard {i}: {len(shard)} queries, pid {procs[-1][0].pid}", flush=True)
    t0 = time.monotonic()
    rcs = []
    for i, (p, log) in enumerate(procs):
        rcs.append(p.wait())
        log.close()
        print(
            f"shard {i} exit {rcs[-1]} after {time.monotonic() - t0:.0f}s",
            flush=True,
        )
    # merge (logs as fallback for shards killed before writing JSON)
    sources = [
        f if os.path.exists(f) else f"log:{f.replace('.json', '.log')}"
        for f in shard_files
    ]
    merge = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/merge_sf1_artifacts.py"), out]
        + sources,
        cwd=REPO,
    )
    return merge.returncode


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
