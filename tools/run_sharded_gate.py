"""Sharded full-registry oracle gate for large fixtures (r7 verdict
directive #2: the sf1 gate must also run on the REALISTIC Zipf corpus).

Runs tools/check_queries.py as N shards (memory notes: one process's
DuckDB side of a quadratic oracle peaks ~50 GB unbounded, and N
concurrent 48 g Spark drivers oversubscribe the box — both knobs are
set per shard below), then merges with tools/merge_sf1_artifacts.py.

Two gate-operations lessons from the r9 sf1 runs are ENCODED here
rather than left as operator knowledge (r9 verdict directive #7):

- **H/L shard layout by default**: shard 0 (the H shard) owns every
  entry whose oracle carries the full-postings quadratic shingle join
  (``tools.oracle_cache.ELIGIBLE``) — it builds the per-connection
  ``inter`` cache ONCE and never contends with another copy of the
  Σdf² spill; the remaining entries round-robin across the L shards.
  No ``SPARK_GRAFT_ORACLE_LOCK`` anywhere: with the heavy oracles
  isolated on one process the lock only serializes (measured r9: a
  lock on round-robin shards collapsed throughput to ~zero behind one
  20-minute quadratic build).
- **Orphan spill reaping on start**: check_queries points DuckDB's
  temp_directory at /tmp/duckdb_spill_<pid>; a killed gate process
  leaves the dir behind (a 47 GB orphan cost one r9 entry a
  no-space-left death). Any spill dir whose owning pid is dead is
  removed before shards launch.

    python tools/run_sharded_gate.py SF_DIR OUT.json [--shards N]
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def reap_orphan_spill_dirs() -> list[str]:
    """Delete /tmp/duckdb_spill_<pid> dirs whose pid is no longer
    alive. Live gate processes keep their spill; everything else is
    leaked disk in the exact place the shards are about to spill."""
    reaped = []
    for d in glob.glob("/tmp/duckdb_spill_*"):
        try:
            pid = int(d.rsplit("_", 1)[-1])
        except ValueError:
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
            continue  # owner alive — in use
        except ProcessLookupError:
            pass
        except PermissionError:
            continue  # alive under another uid
        shutil.rmtree(d, ignore_errors=True)
        reaped.append(d)
    return reaped


def shard_layout(names: list[str], n_shards: int) -> list[list[str]]:
    """H/L layout: shard 0 gets every inter-cache-eligible (quadratic
    shingle-join oracle) entry; the rest round-robin over the other
    shards. With n_shards == 1 everything runs in one process."""
    from tools.oracle_cache import ELIGIBLE

    if n_shards <= 1:
        return [list(names)]
    heavy = [n for n in names if n in ELIGIBLE]
    light = [n for n in names if n not in ELIGIBLE]
    shards = [heavy] + [light[i:: n_shards - 1] for i in range(n_shards - 1)]
    # drop empty shards (r10 ADVICE: a names subset with no ELIGIBLE
    # entries, or n_shards-1 exceeding the light-entry count, produced
    # an empty argv — and check_queries treats empty argv as "run the
    # FULL registry", silently re-running ~326 entries in contention
    # with the real shards)
    return [s for s in shards if s]


def main(argv: list[str]) -> int:
    sf_dir, out = argv[0], argv[1]
    n_shards = int(argv[argv.index("--shards") + 1]) if "--shards" in argv else 3

    reaped = reap_orphan_spill_dirs()
    if reaped:
        print(f"reaped {len(reaped)} orphan spill dirs: {reaped}", flush=True)

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    shards = shard_layout(names, n_shards)
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
            SPARK_GRAFT_ATTR_SHARED="1",
        )
        env.pop("SPARK_GRAFT_ORACLE_LOCK", None)  # see module docstring
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
        kind = "H" if i == 0 and n_shards > 1 else "L"
        print(
            f"shard {i} ({kind}): {len(shard)} queries, pid {procs[-1][0].pid}",
            flush=True,
        )
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
