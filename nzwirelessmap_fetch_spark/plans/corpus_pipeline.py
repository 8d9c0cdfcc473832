"""Composed corpus-curation pipeline: the operators working TOGETHER.

Every stage exists as its own oracle-checked query; this plan chains them
the way a real training-data build does:

    quality gate → exact dedup (canonical per content hash)
                 → SimHash near-dup collapse (canonical per signature)
                 → deterministic train/eval split

The point is compositional: each stage consumes the previous stage's
DataFrame, Catalyst fuses the whole thing into one job, and the oracle is
the same CTE chain in SQL. At 100 TB the stages keep their individual
scale properties (quality + simhash are scan-local maps; each dedup is
one keyed window; the split is a hash on the row) — composition adds no
new shuffles beyond the two dedup windows.

Two registry entries share the chain: ``corpus_dedup_pipeline`` emits the
curated rows; ``corpus_curation_report`` emits the stage funnel (how many
rows each stage kept) — the attrition dashboard every curation run ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..operators.text import (
    MIN_DIVERSITY,
    MIN_STOP_RATIO,
    MIN_WORDS,
    STOPWORDS,
)

TRAIN_PCT = 90  # md5-keyed split: 90 train / 10 eval


def _split_col() -> F.Column:
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        % 100
    )
    return F.when(bucket < TRAIN_PCT, "train").otherwise("eval")


def _stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The shared stage chain. Keys: raw → quality → exact → near; each
    frame is the survivor set after that stage."""
    d = Catalog(spark, sf_dir).table("documents")
    w = F.split("text", " ")
    n_words = F.size(w)
    stop_ratio = (
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double") / n_words
    )
    diversity = F.size(F.array_distinct(w)).cast("double") / n_words
    quality_ok = (
        (n_words >= MIN_WORDS)
        & (stop_ratio >= MIN_STOP_RATIO)
        & (diversity >= MIN_DIVERSITY)
    )
    simhash = F.expr(
        """
        aggregate(
          zip_with(
            aggregate(
              transform(split(text, ' '),
                        w -> CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)),
              array_repeat(CAST(0 AS BIGINT), 32),
              (acc, h) -> zip_with(acc, sequence(0, 31),
                                   (s, j) -> s + IF((h >> j) % 2 = 1, 1, -1))),
            sequence(0, 31),
            (s, j) -> IF(s > 0, shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
          CAST(0 AS BIGINT), (acc, v) -> acc + v)
        """
    )
    quality = d.filter(quality_ok).select(
        "doc_id",
        "lang",
        "source",
        F.md5("text").alias("content_hash"),
        simhash.alias("simhash"),
    )
    # canonical row per exact content hash, then per SimHash signature —
    # each is ONE keyed window (min doc wins, deterministic)
    w_exact = Window.partitionBy("content_hash")
    w_near = Window.partitionBy("simhash")
    exact = quality.withColumn("canon_exact", F.min("doc_id").over(w_exact)).filter(
        F.col("doc_id") == F.col("canon_exact")
    )
    near = exact.withColumn("canon_near", F.min("doc_id").over(w_near)).filter(
        F.col("doc_id") == F.col("canon_near")
    )
    return {"raw": d, "quality": quality, "exact": exact, "near": near}


def corpus_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    near = _stages(spark, sf_dir)["near"]
    return near.select("doc_id", "lang", "source", _split_col().alias("split"))


def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-attrition funnel of the curation pipeline (§2.4 composition):
    ONE row — raw count, quality survivors, post-exact-dedup, post-near-dup,
    train/eval split sizes. The report a production curation run publishes
    next to its output so drops are visible per stage, not just end-to-end.

    Each stage count is a scalar aggregate of the same shared plan
    (Catalyst reuses the scan; the dedup windows are the only exchanges —
    identical physical work to the pipeline itself plus four 1-row aggs,
    combined with broadcast joins of single-row frames, never a collect).
    """
    s = _stages(spark, sf_dir)
    n_raw = s["raw"].agg(F.count(F.lit(1)).alias("n_raw"))
    n_quality = s["quality"].agg(F.count(F.lit(1)).alias("n_quality"))
    n_exact = s["exact"].agg(F.count(F.lit(1)).alias("n_exact"))
    split = s["near"].select(_split_col().alias("split"))
    # coalesce: SUM over zero rows is NULL in Spark but the report
    # contract is counts — an empty pipeline (every doc failing the
    # quality gate, which the r6 skew-fixture full gate produced) must
    # report 0/0, matching the oracle's COUNT semantics
    n_near = split.agg(
        F.count(F.lit(1)).alias("n_near"),
        F.coalesce(
            F.sum((F.col("split") == "train").cast("int")), F.lit(0)
        ).alias("n_train"),
        F.coalesce(
            F.sum((F.col("split") == "eval").cast("int")), F.lit(0)
        ).alias("n_eval"),
    )
    return (
        n_raw.join(F.broadcast(n_quality))
        .join(F.broadcast(n_exact))
        .join(F.broadcast(n_near))
    )


_PIPELINE_CTES = f"""
WITH m AS (
  SELECT doc_id, lang, source, text,
         LEN(string_split(text, ' ')) AS n_words,
         CAST(LEN(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
              AS DOUBLE) / LEN(string_split(text, ' ')) AS stop_ratio,
         CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / LEN(string_split(text, ' ')) AS diversity
  FROM documents
),
quality AS (
  SELECT doc_id, lang, source, text FROM m
  WHERE n_words >= {MIN_WORDS}
    AND stop_ratio >= {MIN_STOP_RATIO}
    AND diversity >= {MIN_DIVERSITY}
),
words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM quality
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM words
),
votes AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN generate_series(0, 31) t(j)
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM votes GROUP BY doc_id
),
survivors AS (
  SELECT q.doc_id, q.lang, q.source, md5(q.text) AS content_hash, sig.simhash
  FROM quality q JOIN sig ON sig.doc_id = q.doc_id
),
exact AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY content_hash) AS canon_exact
  FROM survivors
),
near AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY simhash) AS canon_near
  FROM exact WHERE doc_id = canon_exact
)"""

_SPLIT_SQL = (
    f"CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
    f" < {TRAIN_PCT} THEN 'train' ELSE 'eval' END"
)

CORPUS_DEDUP_PIPELINE_SQL = f"""{_PIPELINE_CTES}
SELECT doc_id, lang, source,
       {_SPLIT_SQL} AS split
FROM near WHERE doc_id = canon_near
"""

CORPUS_CURATION_REPORT_SQL = f"""{_PIPELINE_CTES},
final AS (
  SELECT doc_id, {_SPLIT_SQL} AS split FROM near WHERE doc_id = canon_near
)
SELECT (SELECT COUNT(*) FROM documents) AS n_raw,
       (SELECT COUNT(*) FROM quality)   AS n_quality,
       (SELECT COUNT(*) FROM exact WHERE doc_id = canon_exact) AS n_exact,
       (SELECT COUNT(*) FROM final)     AS n_near,
       (SELECT COUNT(*) FROM final WHERE split = 'train') AS n_train,
       (SELECT COUNT(*) FROM final WHERE split = 'eval')  AS n_eval
"""


# ---------------------------------------------------------------------------
# Canonical-representative picking over transitive dup clusters
# ---------------------------------------------------------------------------

def corpus_canonical_picks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative picker (§2.4 dedup — the "keep the best
    copy" decision that follows clustering): for every transitive
    near-dup component, keep the member with the highest linear quality
    logit (ties → smaller doc_id) and count what gets dropped. This is
    the composition the PageRank docstring motivates — clustering says
    WHICH docs are the same; this op decides WHICH ONE survives, by
    quality rather than by arbitrary minimum id.

    Plan: the component labels (|dup-cluster members| rows — far smaller
    than the corpus) join the zero-shuffle quality scores, then ONE
    window per component picks the argmax — components are near-dup
    families (bounded fan-in), so the window partitions are tiny. The
    oracle nests both stages' exact SQL and replays the same
    ROW_NUMBER pick.
    """
    from ..operators.dedup import dedup_connected_components
    from ..operators.text import corpus_quality_logit

    cc = dedup_connected_components(spark, sf_dir).select("doc_id", "component_id")
    q = corpus_quality_logit(spark, sf_dir).select("doc_id", "logit_milli")
    j = cc.join(q, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("logit_milli"), F.asc("doc_id")
    )
    ranked = j.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
            F.max(F.when(F.col("rn") == 1, F.col("logit_milli"))).alias("kept_logit"),
        )
        .select(
            "component_id",
            "n_members",
            "kept_doc",
            "kept_logit",
            (F.col("n_members") - 1).cast("int").alias("n_dropped"),
        )
        .orderBy("component_id")
    )


def _canonical_picks_sql() -> str:
    from ..operators.dedup import DEDUP_CONNECTED_COMPONENTS_SQL
    from ..operators.text import CORPUS_QUALITY_LOGIT_SQL

    return f"""
WITH cc AS ({DEDUP_CONNECTED_COMPONENTS_SQL}),
q AS ({CORPUS_QUALITY_LOGIT_SQL}),
ranked AS (
  SELECT cc.component_id, cc.doc_id, q.logit_milli,
         ROW_NUMBER() OVER (PARTITION BY cc.component_id
                            ORDER BY q.logit_milli DESC, cc.doc_id ASC) AS rn
  FROM cc JOIN q USING (doc_id)
)
SELECT component_id,
       CAST(COUNT(*) AS INT) AS n_members,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
       MAX(CASE WHEN rn = 1 THEN logit_milli END) AS kept_logit,
       CAST(COUNT(*) - 1 AS INT) AS n_dropped
FROM ranked
GROUP BY component_id
ORDER BY component_id
"""


CORPUS_CANONICAL_PICKS_SQL = _canonical_picks_sql()
