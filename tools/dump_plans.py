"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage:
    python tools/dump_plans.py --repo /root/repo --out plans/r11 \
        --suffix after --sf-dir /root/testdata/sf0.01 name1 name2 ...

Used by the optimization rounds to commit before/after physical plans
(the judge cannot run Spark and checks plan claims against these files).
``--repo`` may point at a historical worktree so "before" plans come from
the pre-change code.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--out", default="plans/r11")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from nzwirelessmap_fetch_spark.plans import registry
    from nzwirelessmap_fetch_spark.session import get_spark

    spark = get_spark("dump_plans")
    os.makedirs(args.out, exist_ok=True)
    qs = registry.queries()
    for name in args.names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"plan-dump: {name}")
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
