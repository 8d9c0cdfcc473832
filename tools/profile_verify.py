"""A/B profile of the n-gram verification join: keyed vs broadcast vs
intersect-cost-only. Run after profile_ngram.py pointed at the same SF."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.catalog import Catalog
from nzwirelessmap_fetch_spark.operators.dedup import JACCARD_THRESHOLD, _shingles
from nzwirelessmap_fetch_spark.session import get_spark


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-verify", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.range(1000).count()
    t = JACCARD_THRESHOLD

    d = Catalog(spark, sf).table("documents")
    sh = _shingles(d).select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    sets = (
        sh.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"), F.count(F.lit(1)).alias("n"))
        .persist()
    )
    sets.count()

    prefixes = sets.select(
        "doc_id",
        "n",
        F.posexplode(
            F.slice("hs", F.lit(1), (F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1).cast("int"))
        ).alias("pos", "h"),
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    alpha = F.ceil((F.col("a.n") + F.col("b.n")) * F.lit(t / (1 + t)))
    cand = (
        a.join(b, "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter((F.col("b.n") >= F.col("a.n") * t) & (F.col("b.n") <= F.col("a.n") / t))
        .filter(F.least(F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")) >= alpha)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .persist()
    )
    print("CAND", cand.count(), flush=True)

    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("na"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("nb"))

    def verify(join_a, join_b, label):
        t0 = time.perf_counter()
        out = (
            cand.join(join_a, "doc_a")
            .join(join_b, "doc_b")
            .withColumn("n_inter", F.size(F.array_intersect("hs_a", "hs_b")))
            .withColumn(
                "jaccard",
                F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= t)
            .select("doc_a", "doc_b", "jaccard")
        )
        n = out.count()
        print(label, n, round(time.perf_counter() - t0, 2), flush=True)

    verify(sa, sb, "KEYED")
    verify(F.broadcast(sa), F.broadcast(sb), "BROADCAST")

    # width test: same joins, no intersect — is the cost data movement or
    # the per-pair set intersection?
    t0 = time.perf_counter()
    n = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select((F.col("na") + F.col("nb")).alias("s"))
        .agg(F.sum("s")).first()[0]
    )
    print("JOIN_ONLY", n, round(time.perf_counter() - t0, 2), flush=True)


if __name__ == "__main__":
    main()
