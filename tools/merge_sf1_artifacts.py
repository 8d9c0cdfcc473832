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


def _known_names() -> frozenset[str]:
    """The registry's query names — the only keys a log row may carry.
    Imported lazily (the registry import starts no SparkSession)."""
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nzwirelessmap_fetch_spark.plans import registry

    return frozenset(registry.queries())


def load(source: str, known: frozenset[str]) -> dict:
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
            if not m:
                if "{" in line and '"rows_match"' in line:
                    # a result-shaped line the regex could not key —
                    # surface it instead of silently dropping (r8 ADVICE)
                    print(f"UNPARSED result line in {source}: {line[:160]}",
                          file=sys.stderr)
                continue
            name = m.group(1)
            if name not in known:
                # progress-bar fragment glued to the name (captured name
                # gained a prefix): recover the longest known suffix
                fixes = [k for k in known if name.endswith(k)]
                if len(fixes) != 1:
                    print(f"UNKNOWN query name {name!r} in {source}: "
                          f"{line[:160]}", file=sys.stderr)
                    continue
                name = fixes[0]
            try:
                rows[name] = json.loads(m.group(2))
            except json.JSONDecodeError:
                print(f"UNDECODABLE result row for {name!r} in {source}: "
                      f"{line[:160]}", file=sys.stderr)
                continue
        return rows
    with open(source) as f:
        return json.load(f)


def _green(v: dict | None) -> bool:
    if not v:
        return False
    if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
        return True
    # an output-explosive row adjudicated by the in-engine content
    # hash is equally trustworthy as a scale twin (r9 ADVICE: an
    # exact-measure twin that goes output-explosive must not read
    # as failing); schema_match participates wherever computed
    return bool(
        v.get("output_bounded")
        and v.get("rows_match")
        and v.get("content_hash_match")
        and v.get("schema_match", True)
    )


def main(out: str, sources: list[str]) -> int:
    known = _known_names()
    merged: dict = {}
    sidecars: dict = {}
    for s in sources:
        for name, row in load(s, known).items():
            if name in ("_shared_builds", "_admission"):
                # per-shard sidecars (shared-build attribution; the
                # admission-budget header each shard's passes were
                # admitted under): keep per-source, never adjudicated
                # as query rows
                # keyed by the FULL source spec: two runs' shards share
                # basenames (.gate_shard<i>.json) and must not collide
                sidecars.setdefault(s, {})[name] = row
                continue
            if name == "_sidecars":
                # a previously-merged artifact used as a source: carry
                # its per-shard sidecars through unchanged
                sidecars.update(row)
                continue
            prev = merged.get(name)
            # a green row never loses to an errored re-run; otherwise
            # later sources override. Green by EITHER adjudication
            # method — an output-bounded content-hash-green row must
            # not be overwritten by a later errored shard any more
            # than a full-hash-green one.
            if prev and _green(prev) and row.get("err"):
                continue
            merged[name] = row

    def adjudicated(v: dict) -> bool:
        if _green(v):
            return True  # full hash green
        if v.get("bounded"):
            # measured admission bound naming the scale twin — counts as
            # adjudicated ONLY if the named twin's row is itself
            # rows/schema/hash green in this same merged artifact
            # (r8 ADVICE: a bounded row must not lean on a failing twin)
            return _green(merged.get(v.get("scale_twin") or ""))
        if v.get("output_bounded") and v.get("rows_match"):
            # output-explosive: count parity, upgraded to content parity
            # when the in-engine hash columns are present; a recorded
            # schema mismatch fails the row either way (r9 ADVICE)
            if not v.get("schema_match", True):
                return False
            if "content_hash_match" in v:
                return bool(v.get("content_hash_match"))
            return True
        return bool(v.get("rows_only"))

    bad = [n for n, v in merged.items() if not adjudicated(v)]
    kinds = {
        "hash_green": sum(1 for v in merged.values() if v.get("hash_match")),
        "bounded": sum(1 for v in merged.values() if v.get("bounded")),
        "count_parity": sum(
            1 for v in merged.values()
            if v.get("output_bounded") and v.get("rows_match")
        ),
        "rows_only": sum(
            1 for v in merged.values()
            if v.get("rows_only") and not v.get("output_bounded")
        ),
    }
    if sidecars:
        merged["_sidecars"] = sidecars
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    n_rows = len(merged) - (1 if sidecars else 0)
    print(f"{out}: {n_rows} entries, {len(bad)} failing {bad[:8]} | {kinds}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1], sys.argv[2:]))
