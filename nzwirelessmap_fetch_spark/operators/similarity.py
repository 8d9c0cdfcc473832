"""Similarity search over the ``embeddings`` table (SURVEY.md §2.4).

- sim_topk_bruteforce  exact cosine top-k: the correctness baseline.
  Query set broadcast against the corpus → per-query window top-k. At 100 TB
  the corpus side streams (one scan, no shuffle of the vectors); cost is
  O(|corpus|·|queries|·dim) FLOPs spread across executors.

- sim_lsh_bucketed     the scale path: 8 deterministic random-hyperplane
  sign bits → 256 buckets → candidate pairs only within a bucket → exact
  cosine re-rank. Replaces the O(n²) pair space with bucket-local joins —
  the shuffle is keyed by bucket id. More planes / multi-probe = standard
  knobs; an IVF variant is the same plan shape with learned centroids as
  the bucketer.

Hyperplanes are pseudo-random ±1 vectors derived from an LCG on (plane,
dim) — integer arithmetic, so Spark and the DuckDB oracle build bit-equal
planes without sharing code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.vectors import cosine

TOP_K = 10
N_QUERIES = 5  # fixture query set: vec_id < 5
N_PLANES = 8
PAIR_THRESHOLD = 0.35


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k of the corpus for each query vector."""
    e = Catalog(spark, sf_dir).table("embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("cos", cosine(F.col("q_emb"), F.col("embedding")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cos", "rank")
    )


SIM_TOPK_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.q_id, e.vec_id,
         list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(generate_series(1, len(e.embedding)),
                            i -> q.q_emb[i]::DOUBLE * e.embedding[i]::DOUBLE)),
           (a, b) -> a + b)
         / (sqrt(list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(1, len(q.q_emb)),
                              i -> q.q_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE)),
             (a, b) -> a + b))
            * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(1, len(e.embedding)),
                              i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)),
             (a, b) -> a + b))) AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.q_id
)
SELECT q_id, vec_id, cos, CAST(rank AS INT) AS rank FROM (
  SELECT q_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {TOP_K}
"""


def _bucket_expr() -> F.Column:
    """256-way random-hyperplane bucket id, one pure-SQL expression.

    Plane (j, d) sign = ±1 from an LCG bit:
        bit = ((1103515245*(j*dim + d) + 12345) >> 16) & 1;  sign = 2*bit - 1
    bucket bit j = [ Σ_d emb[d]·sign(j,d) > 0 ].
    """
    return F.expr(
        """
        aggregate(
          transform(sequence(0, 7), j ->
            CASE WHEN aggregate(
                   sequence(0, size(embedding) - 1), CAST(0.0 AS DOUBLE),
                   (acc, d) -> acc + CAST(embedding[d] AS DOUBLE) *
                     (2 * ((shiftright(CAST(1103515245 AS BIGINT) * (j * size(embedding) + d) + 12345, 16)) % 2) - 1)
                 ) > 0
            THEN shiftleft(1, j) ELSE 0 END),
          0, (acc, v) -> acc + v)
        """
    )


def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-neighbor pairs via LSH buckets + exact cosine re-rank."""
    e = Catalog(spark, sf_dir).table("embeddings")
    bucketed = e.withColumn("bucket", _bucket_expr().cast("int"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos", cosine(F.col("a.embedding"), F.col("b.embedding")))
        .filter(F.col("cos") >= PAIR_THRESHOLD)
    )
    return pairs.select(
        F.col("bucket"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        "cos",
    )


SIM_LSH_BUCKETED_SQL = f"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         CAST(list_reduce(list_prepend(0,
           list_transform(generate_series(0, 7), j ->
             CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(generate_series(0, len(embedding) - 1),
                      d -> embedding[d + 1]::DOUBLE *
                           (2 * (((1103515245 * (j * len(embedding) + d) + 12345) >> 16) % 2) - 1))),
                    (a, b) -> a + b) > 0
             THEN (1 << j) ELSE 0 END)),
           (a, b) -> a + b) AS INT) AS bucket
  FROM embeddings
)
SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(generate_series(1, len(a.embedding)),
                          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
         (x, y) -> x + y)
       / (sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(generate_series(1, len(a.embedding)),
                            i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)),
           (x, y) -> x + y))
          * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(generate_series(1, len(b.embedding)),
                            i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
           (x, y) -> x + y))) AS cos
FROM bucketed a
JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(generate_series(1, len(a.embedding)),
                          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
         (x, y) -> x + y)
       / (sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(generate_series(1, len(a.embedding)),
                            i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)),
           (x, y) -> x + y))
          * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(generate_series(1, len(b.embedding)),
                            i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)),
           (x, y) -> x + y))) >= {PAIR_THRESHOLD}
"""
