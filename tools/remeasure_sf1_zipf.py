"""Isolated sf1-Zipf Spark-side re-measurement of the round-11
re-planned entries (and the contention-suspect lines), bench.py
methodology: noop sink, cache cleared between entries, best-of-2 on
entries over the retry threshold, shared memoized builds timed as
their own attribution lines.

Why this exists: the committed BENCH_SF1.json zipf shape was extracted
from the r10 sharded gate (CORRECTNESS_SF1_SKEW_FULL.json), which ran
BEFORE the r11 re-plans and with up to 3 concurrent shard processes +
DuckDB quadratic-oracle spills on the same box — so (a) the re-planned
entries' zipf lines are stale, and (b) several lines on byte-identical
inputs across shapes (e.g. window_percent_rank over the ×10-replica
orders table: 3.4 s uniform vs 40.1 s zipf) are contention artifacts,
not plan costs. This tool re-measures BOTH classes isolated (one Spark,
no oracle, quiet box) so OPTIMIZATION_r11.md diffs plan changes against
plan costs.

Usage: python tools/remeasure_sf1_zipf.py [OUT.json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.path.join(REPO, ".skew_fixture_sf1")

# re-planned in r11 (stale zipf lines) + contention suspects (identical
# or near-identical inputs across shapes with >5x shape ratio)
DEFAULT = [
    "dedup_simhash_hamming",
    "dedup_simhash_content_hash",
    "dedup_simhash_quality_eval",
    "events_attribution",
    "stream_stream_join",
    "stream_left_outer_join",
    "sim_ivf",
    "sim_ivf_pq",
    "sim_ivf_kmeans",
    "sim_ivf_recall_eval",
    "sim_rrf_fusion",
    "corpus_semdedup",
    "window_percent_rank",
    "agg_winsorized_mean",
    "ml_feature_hashing",
    "map_funcs",
    "join_scd2_lookup",
]

RETRY_OVER_S = 2.5


def main(argv: list[str]) -> int:
    out = argv[0] if argv else os.path.join(REPO, "REMEASURE_SF1_ZIPF.json")
    names = argv[1:] or DEFAULT
    from nzwirelessmap_fetch_spark.plans import registry
    from nzwirelessmap_fetch_spark.session import get_spark

    spark = get_spark("remeasure-sf1-zipf")
    # same one-time warmups as bench.py so first-entry numbers measure
    # the plan, not process bootstrap
    spark.range(1000).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    wq = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination()

    timings: dict[str, float] = {}

    # attribute the memoized substrates as their own lines, but only
    # when a consumer is actually being measured (the simhash build is
    # ~9 min at sf1-Zipf — pure waste for a sim_*/events run)
    if any(n.startswith("dedup_simhash") for n in names):
        from nzwirelessmap_fetch_spark.operators.dedup import (
            _verified_jaccard_pairs,
            _verified_simhash_pairs,
        )

        spark.sparkContext.setJobDescription("shared_simhash_pair_build")
        t0 = time.perf_counter()
        _verified_simhash_pairs(spark, SF_DIR)
        timings["shared_simhash_pair_build"] = round(time.perf_counter() - t0, 3)
        # the quality eval's truth side
        spark.sparkContext.setJobDescription("shared_jaccard_pair_build")
        t0 = time.perf_counter()
        _verified_jaccard_pairs(spark, SF_DIR)
        timings["shared_jaccard_pair_build"] = round(time.perf_counter() - t0, 3)

    qs = registry.queries()

    def run_one(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return elapsed

    for name in names:
        timings[name] = run_one(name)
        print(f"{name}: {timings[name]}s", flush=True)
    for name in names:
        if timings[name] > RETRY_OVER_S:
            timings[name] = min(timings[name], run_one(name))
            print(f"{name} retry -> {timings[name]}s", flush=True)

    payload = {
        "sf_dir": SF_DIR,
        "method": "isolated quiet-box, noop sink, clearCache between, "
        "best-of-2 over %.1fs; shared builds attributed" % RETRY_OVER_S,
        "timings": timings,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
