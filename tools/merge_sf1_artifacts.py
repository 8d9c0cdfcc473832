"""Merge the sharded sf1 gate runs into CORRECTNESS_SF1_FULL.json.

The sf1 full-registry gate runs as parallel shards (memory: one
process's DuckDB side of a quadratic oracle peaks at ~50 GB — see
check_queries' SPARK_GRAFT_DUCKDB_MEM). Shard results land in
.sf1_shard*.json; a shard killed before writing its JSON leaves its
per-entry lines in its log, which this tool also accepts. Later
sources override earlier ones (re-runs supersede errored rows).

    python tools/merge_sf1_artifacts.py out.json shard0.json log:file.log ...
"""

from __future__ import annotations

import json
import re
import sys


def load(source: str) -> dict:
    if source.startswith("log:"):
        rows = {}
        with open(source[4:]) as f:
            text = f.read().replace("\r", "\n")
        for line in text.splitlines():
            # SEARCH, not match: Spark's console progress bar can leave a
            # redraw fragment glued before the result row on the same
            # line (no \r between "...]"  and the print), which a
            # line-anchored match silently drops.
            m = re.search(r"([a-z0-9_]+): (\{.*\})\s*$", line)
            if m:
                try:
                    rows[m.group(1)] = json.loads(m.group(2))
                except json.JSONDecodeError:
                    continue
        return rows
    with open(source) as f:
        return json.load(f)


def main(out: str, sources: list[str]) -> int:
    merged: dict = {}
    for s in sources:
        for name, row in load(s).items():
            prev = merged.get(name)
            # a green row never loses to an errored re-run; otherwise
            # later sources override
            if prev and prev.get("hash_match") and row.get("err"):
                continue
            merged[name] = row
    bad = [
        n
        for n, v in merged.items()
        if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
    ]
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"{out}: {len(merged)} entries, {len(bad)} failing {bad[:8]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1], sys.argv[2:]))
