"""Attribute the sf1-Zipf streaming tail (r10 verdict directive #3).

Runs the three expensive streaming entries (stream_stream_join,
stream_left_outer_join, stream_stateful_user_stats) against a fixture
and records, per entry, the engine's own micro-batch progress (batch
count, per-batch input rows, state-operator rows/commit times, duration
breakdown) plus batch-computed skew facts (head-user share of each join
side, true output pair count). The point is a MEASURED breakdown of
where the 283 s + 220 s sf1-Zipf wall time goes — state volume, batch
overhead, or output volume — before any re-plan is attempted.

Usage: python tools/attr_streaming_tail.py [SF_DIR] [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nzwirelessmap_fetch_spark.catalog import Catalog  # noqa: E402
from nzwirelessmap_fetch_spark.session import get_spark  # noqa: E402
from nzwirelessmap_fetch_spark.streaming import events_stream as es  # noqa: E402


def skew_facts(spark, sf_dir: str) -> dict:
    """Batch-side facts about the join-key distribution: how big the
    Zipf head is on each side, and the true pair-output volume the
    streaming joins must emit regardless of plan."""
    e = Catalog(spark, sf_dir).table("events")
    by_user = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .pivot("event_type", ["purchase", "click"])
        .sum("n")
        .fillna(0)
    )
    top = by_user.orderBy(F.desc(F.col("purchase") + F.col("click"))).limit(5)
    tot = by_user.agg(
        F.sum("purchase").alias("purchases"), F.sum("click").alias("clicks")
    ).first()
    # true inner-join output volume (the semantic floor for both joins)
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("c_us")
    )
    cell = es.JOIN_CELL_US  # the joins' own band width — never drift
    pc = p.select(
        "user_id",
        "p_us",
        F.explode(
            F.sequence(
                F.expr(f"(p_us - {cell}) div {cell}"),
                F.expr(f"p_us div {cell}"),
            )
        ).alias("cell"),
    )
    cc = c.withColumn("cell", F.expr(f"c_us div {cell}"))
    n_pairs = (
        pc.join(cc, ["user_id", "cell"])
        .filter(
            (F.col("c_us") >= F.col("p_us") - cell) & (F.col("c_us") <= F.col("p_us"))
        )
        .count()
    )
    return {
        "totals": {"purchases": tot["purchases"], "clicks": tot["clicks"]},
        "top5_users": [r.asDict() for r in top.collect()],
        "true_inner_pairs": n_pairs,
    }


def run_entry(name: str, fn, spark, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    out = fn(spark, sf_dir)
    n_out = out.count()
    wall = round(time.perf_counter() - t0, 2)
    return {
        "wall_s": wall,
        "output_rows": n_out,
        "progress": dict(es.LAST_RUN_METRICS),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.skew_fixture_sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("attr_streaming_tail", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "10")))
    report = {"sf_dir": sf_dir, "skew": skew_facts(spark, sf_dir)}
    for name, fn in [
        ("stream_stream_join", es.stream_stream_join),
        ("stream_left_outer_join", es.stream_left_outer_join),
        ("stream_stateful_user_stats", es.stream_stateful_user_stats),
    ]:
        report[name] = run_entry(name, fn, spark, sf_dir)
        print(f"{name}: {report[name]['wall_s']}s, "
              f"{report[name]['output_rows']} rows, "
              f"{report[name]['progress'].get('n_batches')} batches",
              flush=True)
    text = json.dumps(report, indent=1, default=str)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
