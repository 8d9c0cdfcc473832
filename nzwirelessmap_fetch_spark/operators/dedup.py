"""Deduplication operators over the ``documents`` table (SURVEY.md §2.4).

Four levels of the standard dedup ladder, all expressed with built-in
DataFrame ops (whole-stage codegen; no Python in the hot path):

- exact          content-hash groupBy
- n-gram Jaccard inverted-index self-join on word-bigram shingles
- MinHash + LSH  signature → band → bucket-join candidate pairs
- SimHash        32-bit weighted-bit signature (near-dup banding ready)

Scale design: no crossJoin anywhere. Pair generation always goes through an
equi-join on a *content-derived key* (shingle / band-signature), so the
shuffle is keyed and skew is bounded by token frequency — at 100 TB the
standard mitigation (drop ultra-frequent shingles, i.e. a document-frequency
cap) hooks in as one extra filter on the shingle table.

Hashing is md5-derived (functions/hashing.py) so signatures are
bit-reproducible in any engine — the DuckDB oracles compute the exact same
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.hashing import MERSENNE_P, md5_long

# MinHash configuration: 16 permutations in 4 bands of 4 rows. Band-match
# probability ~ 1-(1-j^4)^4 — the classic S-curve centered near j≈0.7.
NUM_PERMS = 16
BAND_SIZE = 4


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct word-bigram shingles per document.

    Word bigrams (not char n-grams) keep the shingle vocabulary large
    relative to the corpus so the inverted index discriminates; the
    ``array_distinct`` gives set semantics for Jaccard.
    """
    w = docs.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 2
    )
    return w.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")
            )
        ).alias("shingle"),
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(content) → group → canonical id + copy count.

    At scale this is one keyed shuffle on a uniformly-distributed 128-bit
    key (no skew by construction)."""
    d = Catalog(spark, sf_dir).table("documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(text)     AS content_hash,
       MIN(doc_id)   AS canonical_id,
       COUNT(*)      AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-bigram Jaccard ≥ 0.5.

    Inverted-index formulation: explode shingles, equi-join on shingle,
    count intersections, then ``|A∩B| / (|A|+|B|-|A∩B|)``. The only shuffles
    are keyed by shingle and by doc pair — never O(n²)."""
    d = Catalog(spark, sf_dir).table("documents")
    sh = _shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


DEDUP_NGRAM_JACCARD_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w)-1),
                                 i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs.

    shingle → md5-derived 32-bit hash → 16 universal-hash permutations
    ``(a_i·h + b_i) mod P`` → per-doc per-perm min → 4-row band signatures →
    equi-join docs sharing any band signature.

    The permutation fan-out is a broadcast cross join against a 16-row dim —
    rows scale as |shingles|×16, shuffled keyed by doc_id. Candidate
    generation is an equi-join on (band, signature): keyed, broadcastable
    never, but bucket sizes are the LSH collision classes — exactly the
    pairs we want."""
    d = Catalog(spark, sf_dir).table("documents")
    sh = _shingles(d).withColumn("h", md5_long("shingle"))

    perms = spark.range(NUM_PERMS).select(
        F.col("id").cast("int").alias("perm"),
        (F.lit(2) * F.col("id") + 1).alias("a"),
        (F.lit(104729) * F.col("id") + 12345).alias("b"),
    )
    mh = (
        sh.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % MERSENNE_P).alias("mh"))
    )
    bands = (
        mh.withColumn("band", (F.col("perm") / BAND_SIZE).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("perm", "mh"))),
                    lambda s: s.mh.cast("string"),
                ),
            ).alias("sig")
        )
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


DEDUP_MINHASH_LSH_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w)-1),
                                 i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
),
perms AS (
  SELECT i AS perm, 2*i + 1 AS a, 104729*i + 12345 AS b
  FROM generate_series(0, 15) t(i)
),
mh AS (
  SELECT doc_id, perm, MIN((a*h + b) % 2147483647) AS mh
  FROM h CROSS JOIN perms
  GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, perm // 4 AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm) AS sig
  FROM mh GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document.

    Every word occurrence votes ±1 on each of 32 bit positions according to
    its md5-derived hash; bit j of the signature is 1 iff the vote sum is
    positive. Near-dup docs land within small Hamming distance — banding the
    signature (split into 4 bytes, equi-join on any byte) gives the scale
    path, same shape as MinHash-LSH."""
    d = Catalog(spark, sf_dir).table("documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).withColumn("h", md5_long("word"))

    bits = spark.range(32).select(F.col("id").cast("int").alias("j"))
    votes = (
        words.crossJoin(F.broadcast(bits))
        .withColumn(
            "contrib",
            F.when(F.expr("(h >> j) % 2") == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("contrib").alias("s"))
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << j")).otherwise(
                    F.lit(0)
                )
            ).alias("simhash")
        )
    )


DEDUP_SIMHASH_SQL = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM words
),
votes AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN generate_series(0, 31) t(j)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
FROM votes
GROUP BY doc_id
"""
