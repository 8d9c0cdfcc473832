"""CLI: run any registry query by name.

    python -m nzwirelessmap_fetch_spark.run_query QUERY [SF_DIR] [--limit N]
    python -m nzwirelessmap_fetch_spark.run_query --list

The user-facing twin of the driver contract: the same `queries()` registry
the correctness harness drives, behind one command. Output rows print as
JSON lines (bounded by --limit, default 20 — this is an inspection tool,
not a sink; pipelines use the writers in sinks/)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    from .plans import registry

    ap = argparse.ArgumentParser(
        prog="run_query", description="Run one registry query and print rows."
    )
    ap.add_argument("query", nargs="?", help="query name (see --list)")
    ap.add_argument(
        "sf_dir", nargs="?", default="/root/testdata/sf0.01", help="fixture dir"
    )
    ap.add_argument("--limit", type=int, default=20, help="max rows to print")
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    args = ap.parse_args(argv)

    names = sorted(registry.queries())
    if args.list or not args.query:
        print("\n".join(names))
        return 0
    if args.query not in names:
        print(f"unknown query {args.query!r}; see --list", file=sys.stderr)
        return 2

    from .session import get_spark

    df = registry.queries()[args.query](get_spark("run_query"), args.sf_dir)
    for row in df.limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
