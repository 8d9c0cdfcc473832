"""One-decade-up scaling sweep: sf0.1 → sf1 (r4 verdict directive #3).

No sf1 fixture ships in /root/testdata, so this tool BUILDS one by
replicating the sf0.1 tables ×10 under .scaling_sf1/ (gitignored),
growth-realistically:

- ``documents``: each replica's words are prefixed ``r{i}.`` so replicas
  share ZERO shingles — vocabulary grows with the corpus (Heaps' law),
  document-frequency per shingle stays flat, and the TRUE near-dup pair
  count grows linearly (each replica contributes the sf0.1 pairs). Naive
  byte-copy replication would instead make every doc a 10-way exact dup,
  inflating true pair counts ×100 BY CONSTRUCTION and measuring the
  fixture, not the plan.
- ``embeddings``: vectors are cyclically rolled by the replica index
  (norm- and distribution-preserving new points, not 10 coincident
  copies that would degenerate every top-k to clone sets).
- ``orders``: key-shifted copies (densities scale linearly).
- remaining tables: copied as-is (the family under test doesn't read
  them; they exist so Catalog paths resolve).

Then it times the r4-named expansion family at sf0.1 and sf1 and prints
the 0.1→1 ratio table for SCALING.md: a 10× data step costing ≤10× time
= no quadratic candidate generation at the top of the measured range.

    python tools/scaling_sf1.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nzwirelessmap_fetch_spark.catalog import TABLES  # noqa: E402
from nzwirelessmap_fetch_spark.plans import registry  # noqa: E402
from nzwirelessmap_fetch_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling_sf1")
REPLICAS = 10

QUERIES_GRAPH_STREAM = [
    # r6 verdict directive #7: the graph + streaming families' decade
    "graph_pagerank",
    "graph_triangle_count",
    "graph_kcore",
    "graph_modularity",
    "graph_louvain_one_level",
    "dedup_connected_components",
    "stream_windowed_counts",
    "stream_sliding_counts",
    "stream_stateful_user_stats",
    "stream_dedup_events",
    "stream_jvm_running_totals",
    "stream_foreach_batch_merge",
]

QUERIES = [
    # the r4 verdict's named expansion family
    "corpus_span_dedup",
    "dedup_simhash_hamming",
    "sim_lsh_banded",
    "ml_quantile_binning",
    "sim_maxsim_late_interaction",
    "sim_maxsim_pruned",
    "dedup_ngram_jaccard_capped",
    "corpus_winnowing_capped",
    "corpus_containment_capped",
    "corpus_containment",
    "geo_grid_neighbor_join",
    # linear-regime references so the family ratios have a baseline
    "text_stats",
    "dedup_exact",
    "agg_pricing_summary",
]


# v2: events replicated too (graph+stream decade)
# v3: replica 0 keeps the ORIGINAL words (r8 verdict directive #3) — an
#     all-prefixed corpus has zero quality-passing docs (no stopwords
#     survive the r{i}. prefix), which made corpus_dedup_pipeline and
#     corpus_bm25_topk vacuous 0-row agreements at the 100× gate. With
#     replica 0 verbatim, a quality-passing query-bearing slice exists
#     while cross-replica shingle disjointness (bare vs prefixed words)
#     and therefore linear true-pair growth are preserved.
_BUILD_VERSION = "v3"


def build_sf1(spark) -> None:
    marker = os.path.join(SF1, "_built")
    if os.path.exists(marker) and open(marker).read().strip() == _BUILD_VERSION:
        return
    if os.path.exists(SF1):
        shutil.rmtree(SF1)
    os.makedirs(SF1, exist_ok=True)
    ids = list(range(REPLICAS))

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    parts = []
    for i in ids:
        text = (
            F.col("text")  # replica 0: verbatim (see _BUILD_VERSION v3)
            if i == 0
            else F.array_join(
                F.transform(
                    F.split("text", " "), lambda w: F.concat(F.lit(f"r{i}."), w)
                ),
                " ",
            )
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    rep = rep.withColumn("n_chars", F.length("text").cast("long"))
    rep.repartition(32).write.mode("overwrite").parquet(f"{SF1}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in ids:
        k = i % dim
        rolled = (
            F.concat(
                F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
            )
            if k
            else F.col("embedding")
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    rep.repartition(32).write.mode("overwrite").parquet(f"{SF1}/embeddings.parquet")

    orders = spark.read.parquet(f"{SF01}/orders.parquet")
    parts = [
        orders.select(
            (F.col("o_orderkey") + i * 100_000_000).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        for i in ids
    ]
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    rep.repartition(32).write.mode("overwrite").parquet(f"{SF1}/orders.parquet")

    # events: key-shifted replicas — NEW users per replica (user_id +
    # i·1e6), so streaming per-key state grows linearly with data (the
    # growth-realistic shape: more users, not 10× traffic on the same
    # users), and event ids stay unique for the dedup entries.
    events = spark.read.parquet(f"{SF01}/events.parquet")
    parts = [
        events.select(
            (F.col("event_id") + i * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + i * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in ids
    ]
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    rep.repartition(32).write.mode("overwrite").parquet(f"{SF1}/events.parquet")

    for t in TABLES:
        if t in ("documents", "embeddings", "orders", "events"):
            continue
        src = f"{SF01}/{t}.parquet"
        dst = f"{SF1}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)
    open(os.path.join(SF1, "_built"), "w").write(_BUILD_VERSION)


def main() -> None:
    spark = get_spark(
        "scaling-sf1", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    spark.range(1000).count()
    build_sf1(spark)
    qs = registry.queries()
    queries = (
        QUERIES_GRAPH_STREAM if "--graph-stream" in sys.argv else QUERIES
    )
    results: dict[str, dict[str, float]] = {}
    for sf, sf_dir in (("0.1", SF01), ("1", SF1)):
        for name in queries:
            best = float("inf")
            for _ in range(2):  # best-of-2: same host-noise guard as bench.py
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            results.setdefault(name, {})[sf] = best
            print(f"  sf{sf} {name}: {best:.2f}s", flush=True)
    print("| query | sf0.1 s | sf1 s | 0.1→1 ratio (10× data) |")
    print("|---|---|---|---|")
    for name in queries:
        r = results[name]
        print(
            f"| {name} | {r['0.1']:.2f} | {r['1']:.2f} "
            f"| {r['1'] / max(r['0.1'], 1e-9):.1f}× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
