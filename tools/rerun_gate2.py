"""Round-8 sf1-Zipf gate, phase 2: re-run the entries the phase-1 shards
had not finished (plus the 6 concurrent-spill casualties) with the
inter-CTE cache and the cross-process oracle spill lock enabled.

Partition: one H shard takes every remaining oracle that carries the
quadratic shingle self-join (it builds the _gate_inter_lt cache once);
two L shards split the rest. All three share SPARK_GRAFT_ORACLE_LOCK so
at most one oracle spills at a time.
"""
import json, os, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from nzwirelessmap_fetch_spark.plans import registry

state = json.load(open(os.path.join(REPO, ".gate_state.json")))
remaining = state["remaining"]
oracles = entrymod.oracle_sql()
steps = registry.oracle_gate_steps()

def is_heavy(n):
    texts = list(steps.get(n) or []) + ([oracles[n]] if n in oracles else [])
    return any("USING (shingle)" in t for t in texts)

H = [n for n in remaining if is_heavy(n)]
rest = [n for n in remaining if not is_heavy(n)]
L = [rest[0::2], rest[1::2]]
print(f"H={len(H)} {H}\nL0={len(L[0])} L1={len(L[1])}", flush=True)

lock = os.path.join(REPO, ".gate_oracle.lock")
procs = []
for tag, names, mem in (("H", H, "32GB"), ("L0", L[0], "16GB"), ("L1", L[1], "16GB")):
    if not names:
        continue
    env = dict(
        os.environ,
        SPARK_GRAFT_CHECK_SF=os.path.join(REPO, ".skew_fixture_sf1"),
        SPARK_GRAFT_CHECK_OUT=os.path.join(REPO, f".gate2_{tag}.json"),
        SPARK_GRAFT_DUCKDB_MEM=mem,
        SPARK_GRAFT_DRIVER_MEM="20g",
        SPARK_GRAFT_CPUS="10",
        SPARK_GRAFT_ORACLE_SEQ="1",
        SPARK_GRAFT_ORACLE_LOCK=lock,
    )
    log = open(os.path.join(REPO, f".gate2_{tag}.log"), "w")
    procs.append((tag, subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools/check_queries.py")] + names,
        env=env, stdout=log, stderr=subprocess.STDOUT, cwd=REPO), log))
    print(f"shard {tag}: {len(names)} queries pid {procs[-1][1].pid}", flush=True)

t0 = time.monotonic()
for tag, p, log in procs:
    rc = p.wait(); log.close()
    print(f"shard {tag} exit {rc} after {time.monotonic()-t0:.0f}s", flush=True)

# merge: phase-1 logs first (overridden by anything newer), then phase-2
sources = [f"log:.gate_shard{i}.log" for i in range(3)] + [
    (f".gate2_{t}.json" if os.path.exists(f".gate2_{t}.json") else f"log:.gate2_{t}.log")
    for t in ("H", "L0", "L1")
]
rc = subprocess.run(
    [sys.executable, os.path.join(REPO, "tools/merge_sf1_artifacts.py"),
     "CORRECTNESS_SF1_SKEW_FULL.json"] + sources, cwd=REPO).returncode
sys.exit(rc)
