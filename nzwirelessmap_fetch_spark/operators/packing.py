"""Training-data assembly operators: sequence packing and embedding
quantization (SURVEY.md §2.4 extension surface).

Not in the reference (its pipeline ends at a JSON artifact — fetch.go:
143-157); these are the ops a large-scale LLM training pipeline runs after
dedup/quality filtering, charter-mandated alongside them.

- pack_sequences      concat-and-chunk packing: map every document onto
                      fixed-size token-budget chunks
- embedding_quantize  int8 symmetric quantization of embedding vectors
                      with reconstruction-error stats

Scale design: packing is ONE window aggregation partitioned by shard —
the shard is the parallel unit, so 100 TB packs as thousands of
independent shards with a single shuffle (the partitionBy exchange) and
no global ordering anywhere. Quantization is a zero-shuffle scan with
row-local array folds (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog

TOKEN_BUDGET = 256  # tokens per packed training sequence
N_SHARDS = 4        # deterministic shards; at scale ~ (corpus tokens / budget) / rows-per-task


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing over ``documents``.

    The standard LLM pretraining layout: within a shard, documents are
    concatenated in a deterministic order and the token stream is cut
    into fixed ``TOKEN_BUDGET`` chunks; a document can straddle a chunk
    boundary. Emits, per document, where its tokens land: exclusive
    running start offset, first/last chunk index, chunks spanned, and
    the offset inside its first chunk.

    The plan is one running-sum window per shard (map-side token count →
    one hash exchange on shard → sorted window). No global order: shards
    pack independently, which is what keeps the op linear at 100 TB.

    Cross-engine hardening (round-4 driver-gate fix): DuckDB types a
    windowed ``SUM(BIGINT)`` as HUGEINT (int128), which lands in pandas
    as float64 on some duckdb/pandas version pairs — the only
    env-sensitive fingerprint surface the r3 driver gate found. Every
    output column is therefore explicitly CAST to BIGINT on BOTH
    engines, and the token count uses the space-count identity
    ``1 + len(text) - len(replace(text,' ',''))`` (equal to
    ``size(split(text,' '))`` for non-NULL text, but with no dependence
    on either engine's split-of-empty-string behavior).
    """
    d = Catalog(spark, sf_dir).table("documents")
    tokens = (
        F.length("text") - F.length(F.expr("replace(text, ' ', '')")) + F.lit(1)
    ).cast("bigint")
    shard = (F.col("doc_id") % N_SHARDS).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.select(
            "doc_id",
            shard.alias("shard"),
            tokens.alias("n_tokens"),
        )
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / TOKEN_BUDGET)
            .cast("bigint")
            .alias("first_chunk"),
            F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / TOKEN_BUDGET)
            .cast("bigint")
            .alias("last_chunk"),
            (
                F.floor((F.col("start_offset") + F.col("n_tokens") - 1) / TOKEN_BUDGET)
                - F.floor(F.col("start_offset") / TOKEN_BUDGET)
                + 1
            )
            .cast("bigint")
            .alias("chunks_spanned"),
            (F.col("start_offset") % TOKEN_BUDGET).cast("bigint").alias("offset_in_chunk"),
        )
    )


PACK_SEQUENCES_SQL = f"""
WITH tokd AS (
  SELECT doc_id,
         CAST(doc_id % {N_SHARDS} AS INT) AS shard,
         CAST(1 + LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_tokens
  FROM documents
),
offs AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM tokd
)
SELECT doc_id, shard, n_tokens, start_offset,
       CAST(start_offset // {TOKEN_BUDGET} AS BIGINT) AS first_chunk,
       CAST((start_offset + n_tokens - 1) // {TOKEN_BUDGET} AS BIGINT) AS last_chunk,
       CAST((start_offset + n_tokens - 1) // {TOKEN_BUDGET}
         - start_offset // {TOKEN_BUDGET} + 1 AS BIGINT) AS chunks_spanned,
       CAST(start_offset % {TOKEN_BUDGET} AS BIGINT) AS offset_in_chunk
FROM offs
"""


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of ``embeddings.embedding`` with
    reconstruction-error statistics.

    Per vector: scale = 127 / max|x|, q_i = round(x_i * scale), and the
    error of dequantizing back (max abs error + MSE, strict left folds so
    the oracle's accumulation order is identical). Row-local array
    expressions only — zero shuffles, scan-bound, the int8 payload is
    4× smaller at rest (what a 100 TB serving/ANN tier actually stores).
    """
    e = Catalog(spark, sf_dir).table("embeddings")
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    scale = F.lit(127.0) / F.nullif(amax, F.lit(0.0))
    q = F.transform("embedding", lambda x: F.round(x * F.col("scale")).cast("int"))
    dq_err = F.transform(
        F.arrays_zip(F.col("embedding"), F.col("q")),
        lambda s: F.abs(s["embedding"] - s["q"].cast("double") / F.col("scale")),
    )
    return (
        e.select("vec_id", "embedding", scale.alias("scale"))
        .withColumn("q", q)
        .withColumn("err", dq_err)
        .select(
            "vec_id",
            "scale",
            F.size("q").alias("n_dims"),
            F.array_max("err").alias("max_abs_err"),
            (
                F.aggregate("err", F.lit(0.0), lambda a, x: a + x * x)
                / F.size("err")
            ).alias("mse"),
        )
    )


EMBEDDING_QUANTIZE_SQL = """
WITH scaled AS (
  SELECT vec_id, embedding,
         -- CAST: bare 127.0 is DECIMAL(4,1) in DuckDB and the division
         -- would run in decimal, truncating scale to 4 digits
         CAST(127.0 AS DOUBLE)
           / NULLIF(list_max(list_transform(embedding, x -> abs(x))), 0.0)
           AS scale
  FROM embeddings
),
err AS (
  SELECT vec_id, scale, LEN(embedding) AS n_dims,
         list_transform(embedding,
                        x -> abs(x - CAST(CAST(ROUND(x * scale) AS INT) AS DOUBLE) / scale))
           AS e
  FROM scaled
)
SELECT vec_id, scale, CAST(n_dims AS INT) AS n_dims,
       list_max(e) AS max_abs_err,
       list_reduce(list_prepend(0.0, e), (a, x) -> a + x * x) / n_dims AS mse
FROM err
"""


def pack_bins_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing bin packing per shard — REAL packing (each
    document lands whole in exactly one bin), complementing
    pack_sequences' concat-and-chunk layout where documents straddle
    chunk boundaries. FFD is the classic 11/9·OPT+1 heuristic and is
    inherently sequential, so this is the sanctioned Arrow escape hatch:
    ``applyInPandas`` runs the imperative loop per shard (shards pack
    independently — the parallel unit at 100 TB), and the DuckDB oracle
    replays the exact same decisions with a recursive CTE that threads
    the bin-capacity list through the item sequence. Deterministic order
    (tokens desc, doc_id asc) makes both engines agree bit-for-bit."""
    import pandas as pd

    d = Catalog(spark, sf_dir).table("documents")
    items = d.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).cast("int").alias("shard"),
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
    ).filter(F.col("n_tokens") <= TOKEN_BUDGET)

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
        remaining: list[int] = []
        assignment: list[int] = []
        for n in pdf["n_tokens"]:
            for i, rem in enumerate(remaining):
                if rem >= n:
                    remaining[i] = rem - n
                    assignment.append(i + 1)
                    break
            else:
                remaining.append(TOKEN_BUDGET - n)
                assignment.append(len(remaining))
        pdf = pdf.assign(bin_idx=assignment)
        return pdf

    return items.groupBy("shard").applyInPandas(
        ffd, "doc_id long, shard int, n_tokens int, bin_idx int"
    )


PACK_BINS_FFD_SQL = f"""
WITH RECURSIVE
items AS (
  SELECT doc_id,
         CAST(doc_id % {N_SHARDS} AS INT) AS shard,
         CAST(LEN(string_split(text, ' ')) AS INT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY doc_id % {N_SHARDS}
                            ORDER BY LEN(string_split(text, ' ')) DESC, doc_id)
           AS rn
  FROM documents
  WHERE LEN(string_split(text, ' ')) <= {TOKEN_BUDGET}
),
fit(shard, rn, doc_id, n_tokens, bins, bin_idx) AS (
  SELECT shard, rn, doc_id, n_tokens,
         [{TOKEN_BUDGET} - n_tokens], 1
  FROM items WHERE rn = 1
  UNION ALL
  SELECT i.shard, i.rn, i.doc_id, i.n_tokens,
         CASE WHEN p.pos IS NULL
              THEN list_append(f.bins, {TOKEN_BUDGET} - i.n_tokens)
              ELSE list_transform(generate_series(1, LEN(f.bins)),
                                  j -> CASE WHEN j = p.pos
                                            THEN f.bins[j] - i.n_tokens
                                            ELSE f.bins[j] END)
         END,
         CAST(COALESCE(p.pos, LEN(f.bins) + 1) AS INT)
  FROM fit f
  JOIN items i ON i.shard = f.shard AND i.rn = f.rn + 1
  CROSS JOIN LATERAL (
    -- NULLIF: list_position returns 0, not NULL, when nothing matches
    SELECT NULLIF(list_position(list_transform(f.bins, b -> b >= i.n_tokens),
                                true), 0) AS pos
  ) p
)
SELECT doc_id, shard, n_tokens, bin_idx FROM fit
"""


CHUNK_TOKENS = 32   # context-window length per training chunk
CHUNK_STRIDE = 24   # tokens between chunk starts (overlap = 32 - 24 = 8)


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking (§2.4 training assembly): the
    RAG/long-context prep step — cut each document's token stream into
    CHUNK_TOKENS-long windows every CHUNK_STRIDE tokens so adjacent
    chunks share an 8-token overlap and no token is orphaned.

    Per-doc chunk count is closed-form (ceil((n-C)/S)+1), generated with
    ``sequence``+``explode`` — a MAP-SIDE fan-out with zero shuffles; the
    parquet scan is read once and Catalyst keeps the whole plan in one
    codegen stage. At 100 TB this is embarrassingly parallel (no keyed
    exchange at all).

    ``sequence(0, n_chunks-1)`` is safe from Spark's descending-sequence
    trap (memory: sequence descends when the stop is below the start)
    because n_chunks ≥ 1 for every non-NULL text (split('') → ['']).
    """
    d = Catalog(spark, sf_dir).table("documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1)).otherwise(
        F.floor((n - CHUNK_TOKENS + CHUNK_STRIDE - 1) / CHUNK_STRIDE) + 1
    )
    d = d.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n_tokens"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx"),
    )
    start0 = F.col("chunk_idx") * CHUNK_STRIDE  # 0-based token offset
    sl = F.slice(F.col("toks"), start0 + 1, CHUNK_TOKENS)
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start0.cast("bigint").alias("chunk_start"),
        F.size(sl).cast("int").alias("chunk_len"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


TEXT_CHUNK_OVERLAP_SQL = f"""
WITH tokd AS (
  SELECT doc_id,
         string_split(text, ' ') AS toks,
         LEN(string_split(text, ' ')) AS n
  FROM documents
),
counted AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= {CHUNK_TOKENS} THEN 1
              ELSE (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1
         END AS n_chunks
  FROM tokd
),
fanned AS (
  SELECT doc_id, toks, n, CAST(u.chunk_idx AS INT) AS chunk_idx
  FROM counted, UNNEST(generate_series(0, CAST(n_chunks - 1 AS BIGINT))) AS u(chunk_idx)
)
SELECT doc_id,
       chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       CAST(LEN(list_slice(toks, chunk_idx * {CHUNK_STRIDE} + 1,
                           chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS})) AS INT)
         AS chunk_len,
       array_to_string(list_slice(toks, chunk_idx * {CHUNK_STRIDE} + 1,
                                  chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')
         AS chunk_text
FROM fanned
"""
