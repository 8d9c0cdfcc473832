"""TPC-H power run: the 22 classic queries in sequence at one scale
factor (default sf0.1), each to the no-op sink, cache cleared between
queries. Prints the per-query table and a geometric mean — the classic
single-stream "power" metric, here as evidence the fixture-adapted
suite is complete AND interactive-speed.

    python tools/tpch_power_run.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nzwirelessmap_fetch_spark.plans import registry  # noqa: E402
from nzwirelessmap_fetch_spark.session import get_spark  # noqa: E402

# Q1 is agg_pricing_summary (plans/relational.py) — same plan shape.
TPCH = ["agg_pricing_summary"] + [
    n for n in sorted(registry.queries()) if n.startswith("tpch_q")
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tpch-power", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.range(1000).count()
    qs = registry.queries()
    times: dict[str, float] = {}
    for name in TPCH:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = time.perf_counter() - t0
        spark.catalog.clearCache()
    print(f"\n| query | s ({sf_dir}) |\n|---|---|")
    for name in TPCH:
        print(f"| {name} | {times[name]:.2f} |")
    gm = math.exp(sum(math.log(max(t, 1e-3)) for t in times.values()) / len(times))
    print(f"| **geomean** | **{gm:.2f}** |")
    print(f"| **total** | **{sum(times.values()):.2f}** |")


if __name__ == "__main__":
    main()
