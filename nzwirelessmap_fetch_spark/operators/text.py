"""Text-analysis operators over the ``documents`` table (SURVEY.md §2.4).

All built-in expressions (codegen'd, Arrow-free): ratios and counts are
exact integer/divide arithmetic so the DuckDB oracles hash-match bit-for-bit.

- text_stats        length/word/stopword/quality metrics per doc
- text_langid       stopword-vote language ID (argmax with stable tiebreak)
- text_token_count  whitespace + BPE-ish regex token counts
- text_fingerprint  polynomial rolling hash (content fingerprint)
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas-UDF string type hints resolve here
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.hashing import md5_long, md5_long60, rolling_hash

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Per-language stopword votes for the n-gram-free language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "las", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "在", "了", "和"),
}


def _words(col: str = "text"):
    return F.split(col, " ")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: the filter inputs a training-data
    pipeline prunes on (length, word count, stopword density, lexical
    diversity)."""
    d = Catalog(spark, sf_dir).table("documents")
    w = _words()
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    n_distinct = F.size(F.array_distinct(w))
    return d.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars_calc"),
        n_words.cast("int").alias("n_words"),
        (F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_words)
        .alias("avg_word_len"),
        (n_stop.cast("double") / n_words).alias("stop_ratio"),
        (n_distinct.cast("double") / n_words).alias("lexical_diversity"),
    )


TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(LENGTH(text) AS INT)                      AS n_chars_calc,
       CAST(LEN(string_split(text, ' ')) AS INT)      AS n_words,
       CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
           / LEN(string_split(text, ' '))             AS avg_word_len,
       CAST(LEN(list_filter(string_split(text, ' '),
                x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
            AS DOUBLE) / LEN(string_split(text, ' ')) AS stop_ratio,
       CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / LEN(string_split(text, ' '))             AS lexical_diversity
FROM documents
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID: count marker hits per candidate language,
    pick the argmax (ties broken by language code — deterministic).

    Per-row argmax: a literal array of (−score, cand, score) structs sorted
    lexicographically, element 0 is the winner. A pure map — no unpivot, no
    window, ZERO shuffles — so at 100 TB this is scan-bound like the other
    text ops (the earlier stack+row_number form shuffled |docs|×|langs|
    rows on doc_id for nothing)."""
    d = Catalog(spark, sf_dir).table("documents")
    w = _words()
    def _in(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    entries = [
        F.struct(
            (-F.size(F.filter(w, _in(markers))).cast("long")).alias("neg"),
            F.lit(lang).alias("cand"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    best = F.sort_array(F.array(*entries))[0]
    return d.select(
        "doc_id",
        "lang",
        best["cand"].alias("predicted"),
        (-best["neg"]).alias("score"),
    )


def _langid_branch(lang: str, markers: tuple[str, ...]) -> str:
    marker_list = ", ".join(f"'{m}'" for m in markers)
    return (
        f"SELECT doc_id, lang, '{lang}' AS cand, "
        f"CAST(LEN(list_filter(string_split(text, ' '), x -> x IN ({marker_list}))) AS BIGINT) AS score "
        "FROM documents"
    )


TEXT_LANGID_SQL = (
    "SELECT doc_id, lang, cand AS predicted, score FROM (\n"
    "  SELECT doc_id, lang, cand, score,\n"
    "         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn\n"
    "  FROM (\n    "
    + "\n    UNION ALL\n    ".join(
        _langid_branch(lang, markers) for lang, markers in LANG_MARKERS.items()
    )
    + "\n  )\n) WHERE rn = 1"
)


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens
    (letter-runs / digit-runs / single punctuation), and the chars/4
    estimate used for quick budget math."""
    d = Catalog(spark, sf_dir).table("documents")
    return d.select(
        "doc_id",
        F.size(_words()).cast("int").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("int")
        .alias("n_bpe_tokens"),
        ((F.length("text") + 3) / 4).cast("int").alias("est_tokens"),
    )


TEXT_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(LEN(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
       CAST((LENGTH(text) + 3) // 4 AS INT) AS est_tokens
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive content fingerprint: polynomial rolling hash over
    characters (functions/hashing.rolling_hash). Distinguishes permuted
    near-dups that bag-of-words signatures (SimHash) conflate."""
    d = Catalog(spark, sf_dir).table("documents")
    return d.select("doc_id", rolling_hash("text").alias("fingerprint"))


TEXT_FINGERPRINT_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split(text, ''),
                          c -> ascii(c)::BIGINT)),
         (a, b) -> (a*31 + b) % 2147483647) AS fingerprint
FROM documents
"""


def text_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.3 UDF/UDAF/UDTF row): LATERAL table function
    exploding each document into (word, position) rows.

    UDTFs are the 1→N escape hatch when the expansion logic is imperative
    Python (real tokenizers, parsers, samplers) — the declarative twin is
    ``explode``/``posexplode``, which stays JVM-side and is what the other
    text operators use. Arrow-optimized evaluation
    (``spark.sql.execution.pythonUDTF.arrow.enabled``) batches rows; the
    per-doc row order out of ``eval`` is preserved within the lateral
    expansion, and positions make the result order-insensitive anyway."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield (w, i)

    spark.udtf.register("split_words_udtf", SplitWords)
    Catalog(spark, sf_dir).table("documents").createOrReplaceTempView(
        "__docs_for_udtf"
    )
    return spark.sql(
        "SELECT doc_id, t.word, t.pos "
        "FROM __docs_for_udtf, LATERAL split_words_udtf(text) t"
    )


TEXT_UDTF_TOKENS_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
i AS (SELECT doc_id, w, unnest(range(0, len(w))) AS p FROM d)
SELECT doc_id, w[p + 1] AS word, CAST(p AS INT) AS pos FROM i
"""


def text_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4's ``analyze`` hook): the output
    schema is computed at PLAN TIME from a constant argument — here a
    comma-separated field list, so ``char_stats_udtf(text,
    'n_vowels,n_digits')`` and ``…'n_spaces'`` are the same function
    with different shapes. This is the table-function contract static
    ``returnType`` UDTFs (``text_udtf_tokens``) can't express, and the
    shape Spark's docs reserve for schema-bearing ingest helpers
    (CSV-ish splitters, configurable feature extractors).

    Char classes are counted with explicit ASCII sets on the Python
    side and the equivalent regexp strip on the oracle side — no
    unicode-category functions (Python ``isdigit`` accepts unicode
    digits; the fixture is ASCII but the contract shouldn't rely on
    it)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StructField, StructType

    try:  # analyze-hook API location (pyspark >= 3.5)
        from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult  # noqa: F401
        from pyspark.sql.functions import AnalyzeResult as _AR
    except ImportError:  # pragma: no cover — older layout
        from pyspark.sql.udtf import AnalyzeResult as _AR

    _SETS = {
        "n_vowels": set("aeiou"),
        "n_digits": set("0123456789"),
        "n_spaces": {" "},
    }

    @udtf
    class CharStats:
        @staticmethod
        def analyze(text, fields):
            names = [f.strip() for f in fields.value.split(",")]
            unknown = [n for n in names if n not in _SETS]
            if unknown:
                raise ValueError(f"unknown char-stat field(s): {unknown}")
            return _AR(
                StructType([StructField(n, IntegerType()) for n in names])
            )

        def eval(self, text: str, fields: str):
            names = [f.strip() for f in fields.split(",")]
            yield tuple(sum(c in _SETS[n] for c in text) for n in names)

    spark.udtf.register("char_stats_udtf", CharStats)
    Catalog(spark, sf_dir).table("documents").createOrReplaceTempView(
        "__docs_for_poly_udtf"
    )
    return spark.sql(
        "SELECT doc_id, t.n_vowels, t.n_digits, t.n_spaces "
        "FROM __docs_for_poly_udtf, "
        "LATERAL char_stats_udtf(text, 'n_vowels,n_digits,n_spaces') t"
    )


TEXT_UDTF_POLYMORPHIC_SQL = """
SELECT doc_id,
       CAST(LENGTH(regexp_replace(text, '[^aeiou]', '', 'g')) AS INT)
         AS n_vowels,
       CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS INT)
         AS n_digits,
       CAST(LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS INT)
         AS n_spaces
FROM documents
"""


PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of email/phone shapes plus match
    counts — the pre-training hygiene pass. Pure per-row regexp ops
    (codegen, zero shuffles); at 100 TB this is scan-bound and pipelines
    with the quality filter in one stage.

    Regexes use only RE2-safe syntax (no backrefs/lookaround) so Java and
    RE2-based engines agree; both patterns are anchored to character
    classes, not word boundaries (\\b differs subtly across engines)."""
    d = Catalog(spark, sf_dir).table("documents")
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), 0))
        .cast("int")
        .alias("n_phones"),
    )


TEXT_PII_SCRUB_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                      '{PII_PHONE}', '<PHONE>', 'g')          AS scrubbed,
       CAST(LEN(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS n_emails,
       CAST(LEN(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS n_phones
FROM documents
"""


# Quality gate thresholds: the standard pre-training corpus filter shape
# (length window, stopword floor, repetition ceiling).
MIN_WORDS, MAX_WORDS = 5, 100_000
MIN_STOP_RATIO = 0.01
MIN_DIVERSITY = 0.3


def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop decision + first failing reason per document — the
    text_stats metrics turned into an actionable corpus filter. Reason
    codes make reject sampling auditable (count per reason = the corpus
    health dashboard). One scan, zero shuffles."""
    d = Catalog(spark, sf_dir).table("documents")
    w = _words()
    n_words = F.size(w)
    stop_ratio = (
        F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double") / n_words
    )
    diversity = F.size(F.array_distinct(w)).cast("double") / n_words
    reason = (
        F.when(n_words < MIN_WORDS, "too_short")
        .when(n_words > MAX_WORDS, "too_long")
        .when(stop_ratio < MIN_STOP_RATIO, "low_stopword_ratio")
        .when(diversity < MIN_DIVERSITY, "repetitive")
        .otherwise("ok")
    )
    return d.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


CORPUS_QUALITY_FILTER_SQL = f"""
WITH m AS (
  SELECT doc_id,
         LEN(string_split(text, ' ')) AS n_words,
         CAST(LEN(list_filter(string_split(text, ' '),
                  x -> x IN ('the','a','of','and','to','in','is','on','for','with')))
              AS DOUBLE) / LEN(string_split(text, ' ')) AS stop_ratio,
         CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / LEN(string_split(text, ' ')) AS diversity
  FROM documents
)
SELECT doc_id,
       CASE WHEN n_words < {MIN_WORDS} THEN 'too_short'
            WHEN n_words > {MAX_WORDS} THEN 'too_long'
            WHEN stop_ratio < {MIN_STOP_RATIO} THEN 'low_stopword_ratio'
            WHEN diversity < {MIN_DIVERSITY} THEN 'repetitive'
            ELSE 'ok' END AS reason,
       (CASE WHEN n_words < {MIN_WORDS} THEN 'too_short'
            WHEN n_words > {MAX_WORDS} THEN 'too_long'
            WHEN stop_ratio < {MIN_STOP_RATIO} THEN 'low_stopword_ratio'
            WHEN diversity < {MIN_DIVERSITY} THEN 'repetitive'
            ELSE 'ok' END) = 'ok' AS keep
FROM m
"""


SAMPLE_PCT = 10  # deterministic 10% sample


def corpus_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed deterministic sampling: keep a document iff
    ``md5(doc_id) mod 100 < 10``.

    Unlike ``df.sample()`` (seeded per-partition RNG — resample on every
    repartition), a hash-keyed sample is a pure function of the row:
    stable across reruns, engines, partitionings, and cluster sizes, and
    trivially stratifiable (hash (doc_id, epoch) for rotating eval
    holdouts). This is how 100 TB pipelines carve train/eval splits."""
    d = Catalog(spark, sf_dir).table("documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return d.filter(bucket < SAMPLE_PCT).select("doc_id", "lang", "source")


CORPUS_DETERMINISTIC_SAMPLE_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < {SAMPLE_PCT}
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-ratio quality metrics: the near-duplicate-within-a-
    document signal (boilerplate, keyword stuffing, decoding loops) that
    corpus filters prune on alongside text_stats.

    Per document: distinct-token ratio and the frequency share of the
    most common token. Row-local array expressions only — zero shuffles,
    scan-bound. The top-token count is a run-length scan over the SORTED
    token array (one fold carrying (prev, run, best) state): O(n log n)
    per row vs the O(distinct × n) count-each-distinct-token fold, which
    went quadratic on low-diversity documents — exactly the documents
    this metric exists to flag."""
    d = Catalog(spark, sf_dir).table("documents")
    toks = _words()
    top_freq = F.expr(
        """
        aggregate(
          array_sort(split(text, ' ')),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          (s, t) -> named_struct(
            'prev', t,
            'run', IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1, 1),
            'best', GREATEST(s.best,
                             IF(s.prev IS NOT NULL AND t = s.prev, s.run + 1, 1))),
          s -> s.best)
        """
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("distinct_ratio"),
        top_freq.cast("int").alias("top_token_freq"),
        (top_freq.cast("double") / F.size(toks)).alias("top_token_ratio"),
    )


TEXT_REPETITION_SQL = """
WITH tokd AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
counted AS (
  SELECT doc_id, toks,
         list_max(list_transform(list_distinct(toks),
                                 t -> LEN(list_filter(toks, x -> x = t)))) AS top_freq
  FROM tokd
)
SELECT doc_id,
       CAST(LEN(toks) AS INT) AS n_tokens,
       CAST(LEN(list_distinct(toks)) AS INT) AS n_distinct,
       CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks) AS distinct_ratio,
       CAST(top_freq AS INT) AS top_token_freq,
       CAST(top_freq AS DOUBLE) / LEN(toks) AS top_token_ratio
FROM counted
"""


NGRAM_TOPK = 20


def corpus_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics: the top bigrams by document
    frequency (vocabulary building, boilerplate discovery, contamination
    screening all start here).

    Plan shape: row-local bigram expansion (zip_with over two slices —
    no index arithmetic edge cases on short docs) → explode → ONE
    partial-aggregated shuffle on the n-gram key → global top-k via
    TakeOrdered (no full sort). Map-side combine absorbs the explode
    fan-out before it crosses the wire; at 100 TB hot n-grams are the
    skew risk and ride AQE skew handling, with the dedup module's
    df-cap valve as the explicit guard if one key dominates."""
    d = Catalog(spark, sf_dir).table("documents")
    toks = _words()
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select("doc_id", F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.desc("df"), F.desc("n"), F.asc("ngram"))
        .limit(NGRAM_TOPK)
    )


CORPUS_NGRAM_TOPK_SQL = f"""
WITH tokd AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, GREATEST(LEN(t) - 1, 0)),
                               i -> t[i] || ' ' || t[i + 1])) AS ngram
  FROM tokd
)
SELECT ngram, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS n
FROM grams
GROUP BY ngram
ORDER BY df DESC, n DESC, ngram ASC
LIMIT {NGRAM_TOPK}
"""


SHINGLE_WIDTH = 8
BENCHMARK_SOURCE = "src0"


def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: training documents that share at
    least one {SHINGLE_WIDTH}-token shingle with a held-out benchmark
    set (here: ``source = 'src0'``) — the n-gram-overlap check run
    before training on scraped corpora.

    Plan shape: the corpus side expands to (doc, shingle) postings
    row-locally and flows STRAIGHT into a broadcast join against the
    (distinct'd, tiny) benchmark posting list — no corpus-wide distinct:
    the broadcast probe discards the overwhelming non-matching majority
    map-side, and countDistinct absorbs duplicate postings afterward, so
    the only shuffle in the whole plan is the final per-doc group-by of
    the (rare) contaminated hits. The join key is the 60-bit md5 slice
    of the shingle (``md5_long60``) — 8 bytes on the wire instead of the
    ~40-char shingle text, and still bit-replayable by the DuckDB oracle
    (collision odds ~2^-60 per pair are far below the screen's own
    n-gram false-positive rate)."""
    d = Catalog(spark, sf_dir).table("documents")
    toks = _words()
    n_sh = F.size(toks) - (SHINGLE_WIDTH - 1)
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs must hit the
    # empty branch, not the transform
    shingles = F.when(
        n_sh >= 1,
        F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.array_join(F.slice(toks, i, SHINGLE_WIDTH), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # repartition BEFORE the expansion: the fixture's documents table is
    # one small parquet split, so without this the O(tokens) shingle
    # explode + per-shingle md5 runs on a single task (measured 9.3 s at
    # sf0.1; ~2 s parallel). At 100 TB the scan arrives pre-split and
    # this is a no-op-sized round-robin of raw doc rows.
    width = max(int(spark.conf.get("spark.sql.shuffle.partitions")), 32)
    postings = d.repartition(width).select(
        "doc_id", "source", F.explode(shingles).alias("shingle")
    ).select("doc_id", "source", md5_long60("shingle").alias("sh_h"))
    bench = (
        postings.filter(F.col("source") == BENCHMARK_SOURCE)
        .select(F.col("doc_id").alias("bench_id"), "sh_h")
        .distinct()
    )
    train = postings.filter(F.col("source") != BENCHMARK_SOURCE)
    return (
        train.join(F.broadcast(bench), "sh_h")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh_h").alias("n_shared_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs_hit"),
        )
    )


CORPUS_CONTAMINATION_SQL = f"""
WITH tokd AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
raw_postings AS (
  SELECT doc_id, source,
         UNNEST(list_transform(
           generate_series(1, GREATEST(LEN(t) - {SHINGLE_WIDTH - 1}, 0)),
           i -> array_to_string(t[i:i + {SHINGLE_WIDTH - 1}], ' '))) AS shingle
  FROM tokd
),
postings AS (
  SELECT DISTINCT doc_id, source,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sh_h
  FROM raw_postings
),
bench AS (
  SELECT doc_id AS bench_id, sh_h FROM postings
  WHERE source = '{BENCHMARK_SOURCE}'
),
train AS (
  SELECT doc_id, sh_h FROM postings WHERE source <> '{BENCHMARK_SOURCE}'
)
SELECT t.doc_id,
       COUNT(DISTINCT t.sh_h) AS n_shared_shingles,
       COUNT(DISTINCT b.bench_id) AS n_bench_docs_hit
FROM train t JOIN bench b ON t.sh_h = b.sh_h
GROUP BY t.doc_id
"""


def pandas_scalar_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized SCALAR pandas UDF (§2.3 UDF taxonomy, completing
    grouped applyInPandas + Python UDTF): batch text normalization
    (strip non-alphanumerics, squeeze whitespace, trim, upcase).

    This op is deliberately expressible with built-ins (the oracle IS
    the built-in form) — it exists to pin the Arrow scalar-UDF plumbing:
    columnar batches in, zero-copy pandas Series out, no row-at-a-time
    Python anywhere. The real users of this path are normalizations that
    genuinely need Python libraries (unicode NFC, ftfy-style mojibake
    repair) where per-row UDFs would be 10-100x slower."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return (
            s.str.replace(r"[^a-z0-9 ]", "", regex=True)
            .str.replace(r" +", " ", regex=True)
            .str.strip()
            .str.upper()
        )

    d = Catalog(spark, sf_dir).table("documents")
    return d.select(
        "doc_id",
        norm("text").alias("norm"),
    ).withColumn("n_norm_chars", F.length("norm").cast("int"))


PANDAS_SCALAR_NORMALIZE_SQL = """
SELECT doc_id,
       UPPER(TRIM(regexp_replace(regexp_replace(text, '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g'))) AS norm,
       CAST(LENGTH(UPPER(TRIM(regexp_replace(regexp_replace(text, '[^a-z0-9 ]', '', 'g'),
                                             ' +', ' ', 'g')))) AS INT) AS n_norm_chars
FROM documents
"""


STRATUM_QUOTA = 40  # docs kept per language


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling — the data-MIXING op: cap every
    language stratum at a fixed quota so no source dominates the training
    mix (the per-stratum twin of corpus_deterministic_sample's global
    percentage cut).

    Selection inside a stratum is by md5(doc_id) order, so membership is
    content-keyed: stable across engines, partitionings, and corpus
    growth apart from hash-order insertions. One window per stratum (the
    shuffle is by ``lang``); quotas per (lang, source) or any finer
    stratum are the same plan with a wider partition key."""
    d = Catalog(spark, sf_dir).table("documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_QUOTA)
        .select("doc_id", "lang", "source", F.col("rn").cast("int").alias("rn"))
    )


CORPUS_STRATIFIED_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, source, CAST(rn AS INT) AS rn
FROM ranked WHERE rn <= {STRATUM_QUOTA}
"""


SPAN_W = 8  # words per span window


def corpus_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (sub-document) duplication profile (§2.4): slide an
    8-word window over every document, hash each span, and measure how
    much of each document consists of spans that also appear in OTHER
    documents — the boilerplate/quotation detector that document-level
    dedup (exact, MinHash) cannot see, and the shape line-level dedup
    of web corpora takes in production.

    Plan: span expansion is a row-local transform+explode (map-side
    fan-out); spans shuffle ONCE keyed by their md5-derived 32-bit hash
    (narrow 8-byte key, never the span text); the document rollup rides
    a second keyed agg on doc_id. Cross-doc span frequency and per-doc
    dup ratio come out decimal-pinned. At 100 TB a df-cap valve on
    ultra-hot spans (boilerplate headers) bounds the hot keys — same
    mitigation as _shingles(max_df=...).
    """
    d = Catalog(spark, sf_dir).table("documents")
    spans = (
        d.select(
            "doc_id",
            F.explode(
                # Spark sequence(1, n) DESCENDS for n <= 0 (ROADMAP
                # invariant) — short docs must hit the empty branch.
                F.expr(
                    f"""CASE WHEN size(split(text, ' ')) >= {SPAN_W}
                         THEN transform(sequence(1, size(split(text, ' ')) - {SPAN_W} + 1),
                                        i -> array_join(slice(split(text, ' '), i, {SPAN_W}), ' '))
                         ELSE array() END"""
                )
            ).alias("span"),
        )
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("span"), 1, 8), 16, 10).cast("long").alias("h"),
        )
        .distinct()
    )
    span_df = spans.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        spans.join(span_df, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("n_docs") >= 2).cast("int")).alias("n_shared_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_shared_spans",
            (F.col("n_shared_spans").cast("double") / F.col("n_spans"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("shared_ratio"),
        )
    )


CORPUS_SPAN_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
spans AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(s), 1, 8))::BIGINT AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, GREATEST(len(w) - {SPAN_W} + 1, 0)),
                                 i -> array_to_string(w[i:i+{SPAN_W - 1}], ' '))) AS s
    FROM w)
),
span_df AS (
  SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM spans GROUP BY h
)
SELECT s.doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_spans,
       CAST(CAST(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)
                 AS DECIMAL(18,6)) AS DOUBLE) AS shared_ratio
FROM spans s JOIN span_df d USING (h)
GROUP BY s.doc_id
"""


def corpus_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span SCRUB — the ACTION that `corpus_span_dedup`'s profile feeds
    (§2.4, the ExactSubstr discipline of Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499,
    applied at the word-span grain): every word position covered by any
    {SPAN_W}-word span that also appears in ANOTHER document is REMOVED,
    and the cleaned text is emitted — detection→removal as one
    operator, the way production curation actually rewrites documents
    (soft-weighting's counterpart for sub-document duplication).

    Plan: indexed span hashes are a row-local transform+explode; the
    duplicated-span set is one keyed agg (n_docs ≥ 2) semi-joined back;
    covered positions explode ×{SPAN_W} (bounded) and dedupe; the
    rebuild is a per-doc sort_array(collect_list(struct(p, word))) —
    doc-length-bounded arrays, one keyed agg. Fully-scrubbed documents
    survive as empty text via the left join (a dropped row would
    silently shrink the corpus). At 100 TB the dup-span set takes the
    same df-cap valve as every hot-key family member."""
    d = Catalog(spark, sf_dir).table("documents")
    # persisted: `w` feeds the span explode, the word explode AND the
    # final doc spine; `pos` feeds the dup agg and the coverage semi-join
    # — without the persists the md5-span subtree evaluates 3× (measured
    # 11.3 s → ~4 s at sf0.01). Both frames are corpus-row / span-row
    # sized with bounded payloads.
    w = d.select("doc_id", F.split("text", " ").alias("w")).persist()
    spans_arr = F.expr(
        f"""CASE WHEN size(w) >= {SPAN_W}
             THEN transform(sequence(1, size(w) - {SPAN_W} + 1),
                            i -> struct(i AS i,
                                        cast(conv(substring(md5(
                                          array_join(slice(w, i, {SPAN_W}), ' ')
                                        ), 1, 8), 16, 10) AS BIGINT) AS h))
             ELSE array() END"""
    )
    pos = (
        w.select("doc_id", F.explode(spans_arr).alias("s"))
        .select("doc_id", F.col("s.i").alias("i"), F.col("s.h").alias("h"))
        .persist()
    )
    # one shuffle (partial-agg COUNT DISTINCT) instead of distinct +
    # groupBy stacking two exchanges on different keys
    dup = (
        pos.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    covered = (
        pos.join(dup, "h", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + F.lit(SPAN_W - 1))
            ).alias("p"),
        )
        .distinct()
    )
    words = w.select(
        "doc_id", F.posexplode("w").alias("p0", "word")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "word")
    kept = (
        words.join(covered, ["doc_id", "p"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.expr(
                    "transform(sort_array(collect_list(struct(p, word))),"
                    " x -> x.word)"
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        w.select("doc_id", F.size("w").alias("n_words"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


CORPUS_SPAN_SCRUB_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
pos AS (
  SELECT doc_id, s.i AS i,
         ('0x' || substr(md5(s.sp), 1, 8))::BIGINT AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, GREATEST(len(w) - {SPAN_W} + 1, 0)),
             i -> struct_pack(i := i,
                              sp := array_to_string(w[i:i+{SPAN_W - 1}], ' ')))) AS s
    FROM w)
),
dup AS (
  SELECT h FROM (
    SELECT h, COUNT(DISTINCT doc_id) AS n_docs FROM pos GROUP BY h)
  WHERE n_docs >= 2
),
covered AS (
  SELECT DISTINCT p.doc_id, p.i + offs.d AS pp
  FROM pos p JOIN dup USING (h)
  CROSS JOIN (SELECT unnest(generate_series(0, {SPAN_W - 1})) AS d) offs
),
words AS (
  SELECT doc_id, s.p AS p, s.word AS word
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w)),
                                 p -> struct_pack(p := p, word := w[p]))) AS s
    FROM w)
),
kept AS (
  SELECT wd.doc_id,
         COUNT(*) AS n_kept,
         string_agg(wd.word, ' ' ORDER BY wd.p) AS clean_text
  FROM words wd
  LEFT JOIN covered c ON c.doc_id = wd.doc_id AND c.pp = wd.p
  WHERE c.doc_id IS NULL
  GROUP BY wd.doc_id
)
SELECT w.doc_id,
       CAST(len(w.w) AS BIGINT) AS n_words,
       CAST(len(w.w) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(k.clean_text, '') AS clean_text
FROM w LEFT JOIN kept k USING (doc_id)
"""


def corpus_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-rarity document score (§2.4 text analysis): the mean log2
    frequency bucket of a document's tokens against the corpus unigram
    table — the transcendental-free surprisal proxy (rare vocabulary →
    low bucket → low score; boilerplate → high). The shape of a unigram
    LM quality filter without an external model.

    log2 is computed EXACTLY as an integer: bucket(f) = len(binary(f))
    = floor(log2 f)+1 — Spark ``length(conv(f,10,2))``, DuckDB
    ``length(bin(f))`` — so the pinned mean is a ratio of exact integers
    (no libm, no rounding divergence).

    Scale plan: token fan-out is map-side; the unigram table is ONE
    partial-aggregated shuffle; the token→bucket join is keyed by term
    (Catalyst broadcasts while the vocab fits, falls back to shuffle
    join beyond — correct either way); per-doc rollup is a second keyed
    agg. NO global rank window: bucketing by raw frequency instead of
    rank keeps the vocab table embarrassingly parallel, where a
    row_number over the whole vocabulary would funnel it through one
    partition.
    """
    d = Catalog(spark, sf_dir).table("documents")
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    buckets = (
        tokens.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .select("term", F.length(F.conv(F.col("n_occ"), 10, 2)).alias("bucket"))
    )
    return (
        tokens.join(buckets, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bucket").alias("bucket_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("bucket_sum").cast("double") / F.col("n_tokens"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("rarity_score"),
        )
    )


CORPUS_RARITY_SCORE_SQL = """
WITH tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
buckets AS (
  SELECT term, LENGTH(bin(COUNT(*))) AS bucket FROM tokens GROUP BY term
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(CAST(SUM(b.bucket)::DOUBLE / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE)
         AS rarity_score
FROM tokens t JOIN buckets b USING (term)
GROUP BY t.doc_id
"""


# Tracking params stripped by canonicalization. The param name is
# anchored on its [?&] separator (an unanchored '(utm_…|ref)=' would
# corrupt names that merely END in the pattern: '?pref=1&id=2' must not
# lose 'ref=1&'). Strategy: unify '?'→'&', strip '&name=value' whole,
# restore the first '&' to '?' — each step one regex both engines share.
_TRACKING_RE = r"&(utm_[a-z]+|ref)=[^&]*"


def canonical_url(col) -> F.Column:
    """Strip tracking params from a URL column (the 3-step chain above)."""
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, r"\?", "&"), _TRACKING_RE, ""),
        r"^([^&]*)&",
        r"$1?",
    )


def corpus_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + collision rollup (§2.4 corpus ops): the
    crawl-frontier dedup step — strip tracking parameters, then group by
    canonical URL to find pages fetched under many raw variants. (The
    fixtures carry no URL column, so raw URLs derive deterministically
    from (source, lang, doc_id) — the CANONICALIZATION is the operator
    under test and both engines build identical inputs.)

    Row-local regex canonicalization (scan-bound, zero shuffles), then
    ONE keyed agg on the canonical URL. At 100 TB this is the exact
    shape of exact dedup: uniform hash-like key, no skew beyond true
    hot pages — which is the signal being measured.
    """
    d = Catalog(spark, sf_dir).table("documents")
    raw = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&utm_campaign="),
        F.col("lang"),
        F.lit("&ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&id="),
        (F.col("doc_id") % 50).cast("string"),
    )
    canonical = canonical_url(raw)
    return (
        d.select("doc_id", raw.alias("raw_url"), canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("raw_url").alias("n_raw_variants"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


CORPUS_URL_CANONICAL_SQL = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/p/' || CAST(doc_id % 50 AS VARCHAR)
         || '?utm_source=feed&utm_campaign=' || lang
         || '&ref=' || CAST(doc_id % 7 AS VARCHAR)
         || '&id=' || CAST(doc_id % 50 AS VARCHAR) AS raw_url
  FROM documents
)
SELECT regexp_replace(
         regexp_replace(regexp_replace(raw_url, '\\?', '&'),
                        '&(utm_[a-z]+|ref)=[^&]*', '', 'g'),
         '^([^&]*)&', '\\1?') AS canonical_url,
       COUNT(*) AS n_pages,
       COUNT(DISTINCT raw_url) AS n_raw_variants,
       MIN(doc_id) AS canonical_id
FROM u
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Tokenizer-training substrate: BPE pair statistics
# ---------------------------------------------------------------------------

BPE_TOPK = 20


def corpus_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-character pair frequencies across the corpus — the inner
    statistic of byte-pair-encoding tokenizer training (each BPE round
    merges the argmax of exactly this table, re-counts, repeats). Pairs
    are word-internal (split on space first), matching how BPE pre-
    tokenizes on whitespace boundaries.

    Plan: two map-side expansions (word explode, then zip_with char
    pairing — no index arithmetic on short words) → ONE partial-
    aggregated shuffle on the pair key → global top-k via TakeOrdered.
    The full training loop at scale is this plan in a driver loop with
    the current merge table broadcast — counts stay the only shuffle.
    """
    d = Catalog(spark, sf_dir).table("documents")
    word = F.explode(F.split(F.col("text"), " ")).alias("word")
    chars = F.split(F.col("word"), "")
    pairs = F.zip_with(
        F.slice(chars, 1, F.greatest(F.size(chars) - 1, F.lit(0))),
        F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
        lambda a, b: F.concat(a, b),
    )
    return (
        d.select(word)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOPK)
    )


CORPUS_BPE_PAIR_COUNTS_SQL = f"""
WITH words AS (
  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
),
chars AS (
  SELECT string_split(word, '') AS c FROM words
),
pairs AS (
  SELECT UNNEST(list_transform(range(1, LEN(c)), i -> c[i] || c[i + 1])) AS pair
  FROM chars
)
SELECT pair, COUNT(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {BPE_TOPK}
"""


# ---------------------------------------------------------------------------
# Temperature resampling (corpus balance)
# ---------------------------------------------------------------------------

RESAMPLE_BUDGET = 1000  # documents in the resampled corpus


def corpus_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual-corpus
    recipe: sample group g with probability ∝ n_g^τ so head languages
    shrink and tail languages grow). τ is pinned to 0.5 — n^0.5 is
    sqrt(), which IEEE 754 requires correctly rounded, so BOTH engines
    produce bit-identical weights with no transcendental in the pinned
    output (ln/pow carry no such guarantee — the oracle discipline).

    Plan: one tiny group-by (|languages| rows), then the share
    normalization folds the group list in lang order inside a single-row
    aggregate — group-cardinality-sized, never corpus-sized. Output per
    language: raw count, weight, normalized share, and the expected doc
    budget floor(share · budget).
    """
    d = Catalog(spark, sf_dir).table("documents")
    g = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("lang", "n", F.sqrt(F.col("n").cast("double")).alias("w"))
    )
    packed = g.agg(F.array_sort(F.collect_list(F.struct("lang", "n", "w"))).alias("s"))
    exploded = packed.select(
        F.expr("aggregate(s, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.w)").alias("dn"),
        F.explode("s").alias("x"),
    )
    share = F.col("x.w") / F.col("dn")
    return exploded.select(
        F.col("x.lang").alias("lang"),
        F.col("x.n").alias("n_docs"),
        F.col("x.w").alias("weight"),
        share.alias("sample_share"),
        F.floor(share * F.lit(float(RESAMPLE_BUDGET))).cast("long").alias("expected_docs"),
    )


CORPUS_TEMPERATURE_RESAMPLE_SQL = f"""
WITH g AS (
  SELECT lang, COUNT(*) AS n, sqrt(CAST(COUNT(*) AS DOUBLE)) AS w
  FROM documents GROUP BY lang
),
dn AS (
  SELECT list_reduce(list_prepend(0.0::DOUBLE, list(w ORDER BY lang)),
                     (a, b) -> a + b) AS dn
  FROM g
)
SELECT lang, n AS n_docs, w AS weight, w / dn AS sample_share,
       CAST(floor(w / dn * CAST({RESAMPLE_BUDGET} AS DOUBLE)) AS BIGINT) AS expected_docs
FROM g, dn
"""


N_SHARDS = 16


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle (§2.4 training assembly —
    the "shuffle the corpus" step every pretraining run needs, made
    reproducible): shard = hash(doc_id) mod {N_SHARDS}, position within
    the shard = rank by an INDEPENDENT hash (a disjoint md5 slice) — a
    content-keyed permutation that is stable under re-partitioning,
    re-runs, and engine choice, unlike rand()-based shuffles (whose
    order depends on partition layout and seed plumbing).

    Plan: hashes are row-local projections; the only exchange is the
    per-shard rank window, keyed by shard — shards are the parallel
    unit, so the sort is |corpus|/{N_SHARDS} per task and there is no
    global sort. Readers stream shard files in position order; epoch k
    re-shuffles by salting the order hash with k (same plan).
    """
    d = Catalog(spark, sf_dir).table("documents")
    shard = (md5_long("doc_id_s") % N_SHARDS).cast("int")
    order_h = F.conv(F.substring(F.md5("doc_id_s"), 9, 12), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("order_h", "doc_id")
    return (
        d.select(
            "doc_id", F.col("doc_id").cast("string").alias("doc_id_s"), "n_chars"
        )
        .select("doc_id", "n_chars", shard.alias("shard"), order_h.alias("order_h"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos", "n_chars")
    )


CORPUS_SHUFFLE_SHARDS_SQL = f"""
WITH h AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {N_SHARDS} AS INT) AS shard,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 12))::BIGINT AS order_h
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY order_h, doc_id)
            AS BIGINT) AS pos,
       n_chars
FROM h
"""


TOKEN_BUDGET = 100_000


def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix budget apportionment (§2.4 data mixing — the planner
    that turns "sample {TOKEN_BUDGET} tokens proportionally to corpus
    share" into per-language integer quotas): largest-remainder method
    (Hamilton) over per-language token counts. Floor quotas sum ≤ budget;
    the leftover seats go to the largest fractional remainders — exact
    integer arithmetic (remainders compared as cross-multiplied BIGINTs,
    no doubles), so quotas sum to the budget EXACTLY and replay
    bit-identically anywhere.

    Plan: one partial-agg shuffle to per-lang counts (≤ |langs| rows);
    the total and the remainder rank ride those aggregated rows
    (broadcast + tiny window) — nothing corpus-sized after the first
    aggregate. The output feeds corpus_stratified_sample / temperature
    resampling as the per-stratum quota input.
    """
    d = Catalog(spark, sf_dir).table("documents")
    per_lang = d.groupBy("lang").agg(
        F.sum(((F.col("n_chars") + 3) / 4).cast("long")).alias("tokens")
    )
    total = per_lang.agg(F.sum("tokens").alias("total_tokens"))
    base = per_lang.crossJoin(F.broadcast(total)).select(
        "lang",
        "tokens",
        "total_tokens",
        # `div` = exact BIGINT division (DuckDB `//` twin); a double
        # divide + cast could floor the wrong side of an exact quotient
        F.expr(f"tokens * {TOKEN_BUDGET} div total_tokens").alias("floor_quota"),
        ((F.col("tokens") * TOKEN_BUDGET) % F.col("total_tokens")).alias("rem"),
    )
    leftover = F.lit(TOKEN_BUDGET) - F.sum("floor_quota").over(
        Window.partitionBy(F.lit(1))
    )
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("rem"), F.asc("lang"))
    return base.select(
        "lang",
        "tokens",
        "floor_quota",
        "rem",
        (
            F.col("floor_quota")
            + F.when(F.row_number().over(w) <= leftover, 1).otherwise(0)
        ).alias("quota"),
    )


CORPUS_TOKEN_BUDGET_MIX_SQL = f"""
WITH per_lang AS (
  SELECT lang, CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS tokens
  FROM documents GROUP BY lang
),
base AS (
  SELECT lang, tokens,
         (SELECT SUM(tokens) FROM per_lang) AS total_tokens,
         CAST(tokens * {TOKEN_BUDGET} // (SELECT SUM(tokens) FROM per_lang)
              AS BIGINT) AS floor_quota,
         CAST(tokens * {TOKEN_BUDGET} % (SELECT SUM(tokens) FROM per_lang)
              AS BIGINT) AS rem
  FROM per_lang
)
SELECT lang, tokens, floor_quota, rem,
       CAST(floor_quota
            + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC)
                        <= {TOKEN_BUDGET} - (SELECT SUM(floor_quota) FROM base)
                   THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM base
"""


LM_TOP_SUCCESSORS = 3


def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language-model table (§2.4 corpus ops — the
    n-gram LM estimation step; KenLM's count pass): for every word, its
    top-{LM_TOP_SUCCESSORS} successors with integer-ppm conditional
    probability P(next|word) = count(w,next)·10⁶ div count(w,·). The
    word-level sibling of corpus_bpe_pair_counts (char pairs) and
    events_transition_matrix (event types) — same estimation shape,
    vocabulary-sized key space.

    Plan: adjacent-pair expansion is map-side (transform over the token
    array, no self-join); ONE keyed shuffle aggregates (w1, w2) counts;
    the per-word total and the successor rank ride the SAME w1
    partitioning (Catalyst reuses the exchange); integer div keeps the
    pinned probability transcendental- and rounding-free."""
    d = Catalog(spark, sf_dir).table("documents")
    # materialize the token array ONCE per row — inlining split() into the
    # transform lambda re-tokenizes the document per element (O(words²))
    tokd = d.select(_words().alias("t"))
    pairs = F.when(
        F.size(F.col("t")) >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    counts = (
        tokd.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("w1")
    w_rank = Window.partitionBy("w1").orderBy(F.desc("n"), F.asc("w2"))
    return (
        counts.withColumn("total", F.sum("n").over(w_tot))
        .withColumn("rk", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rk") <= LM_TOP_SUCCESSORS)
        .select(
            "w1",
            "w2",
            "n",
            "total",
            "rk",
            F.expr("n * 1000000 div total").alias("p_ppm"),
        )
    )


TEXT_BIGRAM_LM_SQL = f"""
WITH tokd AS (
  SELECT string_split(text, ' ') AS t FROM documents
),
pairs AS (
  SELECT UNNEST(list_transform(generate_series(1, GREATEST(LEN(t) - 1, 0)),
                               i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS p
  FROM tokd
),
counts AS (
  SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS n FROM pairs GROUP BY 1, 2
),
ranked AS (
  SELECT w1, w2, n,
         SUM(n) OVER (PARTITION BY w1) AS total,
         CAST(ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY n DESC, w2 ASC) AS INT) AS rk
  FROM counts
)
SELECT w1, w2, n, CAST(total AS BIGINT) AS total, rk,
       n * 1000000 // CAST(total AS BIGINT) AS p_ppm
FROM ranked WHERE rk <= {LM_TOP_SUCCESSORS}
"""


RAKE_TOP_K = 25


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (§2.4 text analysis — Rose et al. 2010):
    stopwords split each document into candidate phrases; every content
    word scores degree (Σ length of its phrases — co-occurrence mass)
    over frequency; the corpus-level top-{RAKE_TOP_K} by degree/freq
    surfaces multiword-topic carriers the plain frequency top-k misses.

    Plan: tokenize+position is map-side; the phrase id is a running
    stopword count per doc (one doc-keyed window) and the phrase length
    a second window ON THE SAME exchange; the word rollup is one keyed
    agg; TakeOrdered bounds the output. Integer score_ppm = degree·10⁶
    div freq keeps the pinned output exact."""
    d = Catalog(spark, sf_dir).table("documents")
    toks = d.select(
        "doc_id", F.posexplode(_words()).alias("pos", "w")
    ).withColumn("is_stop", F.col("w").isin(*STOPWORDS).cast("int"))
    w_doc = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    phrased = toks.withColumn("phrase_id", F.sum("is_stop").over(w_doc)).filter(
        F.col("is_stop") == 0
    )
    w_phrase = Window.partitionBy("doc_id", "phrase_id")
    scored = phrased.withColumn("phrase_len", F.count(F.lit(1)).over(w_phrase))
    words = scored.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("phrase_len").alias("degree"),
    )
    return (
        words.select(
            "w",
            "freq",
            "degree",
            F.expr("degree * 1000000 div freq").alias("score_ppm"),
        )
        .orderBy(F.desc("score_ppm"), F.asc("w"))
        .limit(RAKE_TOP_K)
    )


_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

TEXT_RAKE_KEYWORDS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS w,
         UNNEST(generate_series(1, LEN(string_split(text, ' ')))) AS pos
  FROM documents
),
marked AS (
  SELECT doc_id, pos, w,
         CASE WHEN w IN ({_STOP_LIST}) THEN 1 ELSE 0 END AS is_stop
  FROM toks
),
phrased AS (
  SELECT doc_id, w,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS phrase_id,
         is_stop
  FROM marked
),
content AS (
  SELECT doc_id, w, phrase_id FROM phrased WHERE is_stop = 0
),
scored AS (
  SELECT doc_id, w,
         COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
  FROM content
)
SELECT w, COUNT(*) AS freq,
       CAST(SUM(phrase_len) AS BIGINT) AS degree,
       CAST(SUM(phrase_len) AS BIGINT) * 1000000 // COUNT(*) AS score_ppm
FROM scored
GROUP BY w
ORDER BY score_ppm DESC, w ASC
LIMIT {RAKE_TOP_K}
"""


N_FOLDS = 5


def corpus_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (§2.4 training
    assembly — the CV-split step): fold = hash(doc_id) mod {N_FOLDS},
    reported as per-(fold, lang) counts with each fold's train-side
    complement size. Content-keyed like corpus_deterministic_sample, so
    folds are stable under re-partitioning, re-runs, and engine choice
    — the reproducibility contract an eval harness needs (a rand()-based
    split silently reshuffles between runs).

    Plan: the fold id is a row-local projection; ONE partial-aggregated
    shuffle to the (fold × lang) grain; the complement count rides the
    aggregated rows via a broadcast of the per-fold totals. Nothing
    corpus-sized after the first aggregate."""
    d = Catalog(spark, sf_dir).table("documents")
    fold = (md5_long(F.col("doc_id").cast("string")) % N_FOLDS).cast("int")
    per = d.select(fold.alias("fold"), "lang").groupBy("fold", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = per.groupBy("fold").agg(F.sum("n_docs").alias("fold_total"))
    grand = per.agg(F.sum("n_docs").alias("grand"))
    return (
        per.join(F.broadcast(totals), "fold")
        .crossJoin(F.broadcast(grand))
        .select(
            "fold",
            "lang",
            "n_docs",
            "fold_total",
            (F.col("grand") - F.col("fold_total")).alias("train_complement"),
        )
    )


CORPUS_KFOLD_SPLIT_SQL = f"""
WITH per AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % {N_FOLDS} AS INT) AS fold,
         lang, COUNT(*) AS n_docs
  FROM documents GROUP BY 1, 2
),
totals AS (SELECT fold, SUM(n_docs) AS fold_total FROM per GROUP BY fold),
grand AS (SELECT SUM(n_docs) AS grand FROM per)
SELECT p.fold, p.lang, p.n_docs,
       CAST(t.fold_total AS BIGINT) AS fold_total,
       CAST(g.grand - t.fold_total AS BIGINT) AS train_complement
FROM per p JOIN totals t ON t.fold = p.fold CROSS JOIN grand g
"""


def corpus_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (§2.4 text analysis meta-tooling —
    the evaluation of the engine's own text_langid operator): labeled
    lang × predicted lang counts with per-label recall share in ppm.
    The eval every classifier-driven curation gate needs before its
    predictions route documents (the same grid shape audits any
    model-vs-label column pair at corpus scale).

    Plan: text_langid is zero-shuffle row-local scoring; the confusion
    grid is ONE partial-aggregated shuffle over ≤ |langs|² keys; recall
    shares ride a per-label window on the aggregated grid."""
    pred = text_langid(spark, sf_dir)
    grid = pred.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang")
    return grid.select(
        "lang",
        "predicted",
        "n",
        F.expr("n * 1000000 div sum(n) over (partition by lang)").alias(
            "share_ppm"
        ),
        (F.col("lang") == F.col("predicted")).alias("correct"),
    )


CORPUS_LANGID_CONFUSION_SQL = (
    "WITH pred AS (" + TEXT_LANGID_SQL + ")\n"
    """SELECT lang, predicted, COUNT(*) AS n,
       CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER (PARTITION BY lang)
            AS BIGINT) AS share_ppm,
       lang = predicted AS correct
FROM pred
GROUP BY lang, predicted"""
)


BURST_TOP_K = 20


def corpus_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness profile (§2.4 corpus stats — Church & Gale's
    observation that content words CLUMP): for the {BURST_TOP_K}
    highest-df terms, the Fano factor (variance-to-mean ratio of
    per-document counts over documents CONTAINING the term) in ppm.
    Function words sit near Poisson (factor ≈ 1e6 ppm); topical terms
    burst far above — the signal separating content terms from glue for
    keyword weighting and boilerplate screens.

    Plan: one (term, doc) aggregate from the map-side token fan-out;
    per-term exact integer moment sums ride a second keyed agg;
    TakeOrdered bounds the report to the df top-{BURST_TOP_K}. The
    variance uses the population form over occurrence docs — exact
    integers until one pinned IEEE division."""
    d = Catalog(spark, sf_dir).table("documents")
    td = (
        d.select("doc_id", F.explode(_words()).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_term = td.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    n = F.col("df").cast("double")
    sc = F.col("sc").cast("double")
    scc = F.col("scc").cast("double")
    mean = sc / n
    var = (scc - (sc * sc) / n) / n
    return (
        per_term.select(
            "w",
            "df",
            F.col("sc").alias("total_occurrences"),
            F.expr(
                "cast(cast((((cast(scc as double) - (cast(sc as double) * cast(sc as double)) / cast(df as double)) / cast(df as double)) / (cast(sc as double) / cast(df as double))) * 1000000 as decimal(18,0)) as bigint)"
            ).alias("fano_ppm"),
        )
        .orderBy(F.desc("df"), F.asc("w"))
        .limit(BURST_TOP_K)
    )


CORPUS_TERM_BURSTINESS_SQL = f"""
WITH td AS (
  SELECT w, doc_id, COUNT(*) AS c FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
  ) GROUP BY 1, 2
),
per_term AS (
  SELECT w, COUNT(*) AS df,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(c*c) AS BIGINT) AS scc
  FROM td GROUP BY w
)
SELECT w, df, sc AS total_occurrences,
       CAST(CAST((((CAST(scc AS DOUBLE) - (CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                    / CAST(df AS DOUBLE)) / CAST(df AS DOUBLE))
                  / (CAST(sc AS DOUBLE) / CAST(df AS DOUBLE))) * 1000000
            AS DECIMAL(18,0)) AS BIGINT) AS fano_ppm
FROM per_term
ORDER BY df DESC, w ASC
LIMIT {BURST_TOP_K}
"""


# ─── Readability (Coleman–Liau, integer-exact) ─────────────────────────────

# Coleman–Liau index = 0.0588·L − 0.296·S − 15.8 where L = letters per 100
# words and S = sentences per 100 words. Chosen over Flesch BECAUSE it is
# log- and syllable-free: pure rational arithmetic in counts, so both
# engines replay it exactly in milli-units.
_CLI_OFFSET = 1_000_000  # shifts the numerator positive so int division = floor


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability (§2.4 text analysis): the quality-scoring
    signal that length/stopword ratios miss — a grade-level estimate.
    Training-data curricula bucket documents by reading level; this is
    the standard first-pass scorer when a model-based one is too costly
    for a full-corpus sweep.

    Integer-exact: cli_milli = floor(1000·CLI) computed as
    ((5880·letters − 29600·sentences − 15800·words) + OFFSET·words)
    div words − OFFSET. The additive OFFSET·words keeps the numerator
    positive, so truncating integer division IS floor in both engines
    (Spark `div` truncates, DuckDB `//` floors — they only agree on
    non-negatives; the ROADMAP floor-vs-truncate invariant).

    Plan: one scan, zero shuffles, all codegen'd built-ins — letter count
    via regexp_replace strip, sentence count via regexp_extract_all on
    terminal-punctuation runs."""
    d = Catalog(spark, sf_dir).table("documents")
    letters = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("bigint")
    words = F.greatest(F.size(_words()), F.lit(1)).cast("bigint")
    sentences = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    ).cast("bigint")
    return (
        d.select(
            "doc_id",
            "lang",
            letters.alias("n_letters"),
            words.alias("n_words"),
            sentences.alias("n_sentences"),
        )
        .withColumn(
            "cli_milli",
            F.expr(
                f"((5880 * n_letters - 29600 * n_sentences - 15800 * n_words"
                f" + {_CLI_OFFSET} * n_words) div n_words) - {_CLI_OFFSET}"
            ),
        )
        .withColumn(
            "grade_band",
            F.when(F.col("cli_milli") < 6000, "elementary")
            .when(F.col("cli_milli") < 9000, "middle_school")
            .when(F.col("cli_milli") < 13000, "high_school")
            .otherwise("college"),
        )
    )


TEXT_READABILITY_SQL = f"""
WITH c AS (
  SELECT doc_id, lang,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
           AS n_letters,
         CAST(GREATEST(len(string_split(text, ' ')), 1) AS BIGINT) AS n_words,
         CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences
  FROM documents
),
s AS (
  SELECT *,
         ((5880 * n_letters - 29600 * n_sentences - 15800 * n_words
           + {_CLI_OFFSET} * n_words) // n_words) - {_CLI_OFFSET} AS cli_milli
  FROM c
)
SELECT doc_id, lang, n_letters, n_words, n_sentences, cli_milli,
       CASE WHEN cli_milli < 6000 THEN 'elementary'
            WHEN cli_milli < 9000 THEN 'middle_school'
            WHEN cli_milli < 13000 THEN 'high_school'
            ELSE 'college' END AS grade_band
FROM s
"""


# ─── Winnowing fingerprints (MOSS-style local fingerprinting) ──────────────

WINNOW_K = 8        # char k-gram length
WINNOW_W = 4        # winnowing window (guarantee: any match ≥ k+w-1 chars shows)
WINNOW_MIN_SHARED = 5  # absolute floor on shared fingerprints
# relative gate: 2·n_shared ≥ min(n_fp) — ≥ 50% of the smaller doc's
# fingerprints shared (integer comparison, no float threshold). The
# absolute floor alone is far too permissive on a shared-vocabulary
# corpus (measured: ≥5 shared passes 79k of 125k possible pairs at
# sf0.01; the 50% gate passes 26).


def corpus_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints + cross-doc overlap (§2.4 dedup/
    text — Schleimer, Wilkerson & Aiken, SIGMOD'03, the MOSS algorithm;
    public): hash every char {WINNOW_K}-gram, slide a {WINNOW_W}-wide
    window, keep each window's RIGHTMOST-minimal hash — the selected
    set is a position-robust fingerprint with the guarantee that any
    shared substring of length ≥ k+w−1 contributes at least one common
    fingerprint. Pairs sharing ≥ {WINNOW_MIN_SHARED} fingerprints are
    plagiarism/boilerplate-overlap candidates that token-set measures
    (Jaccard on bigrams) report much more diffusely.

    The rightmost-min selection is ONE integer expression, no struct
    fold (the DuckDB struct-accumulator hazard, ROADMAP): encode each
    in-window gram as hash·w + (w−1−offset); the MINIMUM encodes the
    minimal hash with ties to the LARGEST offset, and div w recovers the
    hash. 40-bit md5-derived gram hashes keep every encode < 2^42.

    Plan: fingerprint extraction is scan-bound per-doc array work (zero
    shuffles); the pair stage is the standard inverted-index equi-join
    on the fingerprint hash — selected fingerprints are ~2/(w+1) of
    grams, so the index is ~2.5× smaller than the raw shingle index the
    Jaccard build joins. Same skew valve applies at 100 TB (df-cap hot
    fingerprints before the join — oracle-checked in
    ``corpus_winnowing_capped``)."""
    return _winnow_pairs(spark, sf_dir, max_df=None)


# Floor for the ADAPTIVE fingerprint-df cap (r7 verdict directive #1).
# The r7 finding: a constant absolute cap (df ≤ 16) collapses to the
# EMPTY SET on a vocabulary-saturated corpus (sf1 uniform fixture:
# every fingerprint's df > 16 → 0 output rows exactly at the scale the
# valve exists for). The scale-aware replacement below derives the cap
# from the corpus's own df histogram under an explicit WORK BUDGET.
WINNOW_MAX_DF = 16

# Inverted-index join-output budget, per document: the adaptive cap is
# the LARGEST df value c such that Σ_{fingerprints with df ≤ c} df²
# (= the exact pair-join output row count) stays ≤ budget · n_docs —
# linear in corpus size BY CONSTRUCTION, which is the valve's actual
# 100 TB contract (a df cap was only ever a proxy for it). Floored at
# WINNOW_MAX_DF so a tiny/rare-term corpus keeps the old behavior.
# Measured (r8 probe, budget 2000/doc):
#   corpus      n_docs  cap   Σdf²     out rows   (fixed cap 16)
#   sf0.01         500   39   1.0M     25 of 26   (23 of 26)
#   sf0.1         5000  194   10.0M    285
#   Zipf skew     5000  497   9.9M     395
#   sf1 uniform  50000  273   92.7M    47,289     (0 — the r7 bug)
WINNOW_PAIR_BUDGET_PER_DOC = 2000

# Sentinel for `_winnow_fingerprints`: resolve the cap adaptively.
WINNOW_ADAPTIVE = "adaptive"


class ExactMeasureBoundError(RuntimeError):
    """The EXACT pair measure's join output (Σdf², computed from the df
    table before any pair is generated) exceeds the configured budget —
    refusing to run is the honest behavior at scale: the r7 sf1 gate
    showed the unguarded exact shuffle filling the host's disk after
    1123 s. The error names the oracle-checked scale twin to run
    instead; raise ``SPARK_GRAFT_EXACT_PAIR_BUDGET`` on hosts/clusters
    with the disk for the exact measure."""


def corpus_winnowing_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing overlap with the ADAPTIVE fingerprint-df valve ON —
    the plan that survives a boilerplate-heavy corpus at 100 TB, as an
    oracle-checked registry entry rather than a comment (r7 verdict
    directive #1: the constant cap went semantically empty at sf1).

    The cap is computed from the fingerprint df histogram: largest c
    with cumulative Σdf² ≤ ``WINNOW_PAIR_BUDGET_PER_DOC`` · n_docs,
    floored at ``WINNOW_MAX_DF``. Sizes and the containment denominator
    are computed over the CAPPED fingerprint sets; the oracle replays
    the identical histogram walk, so the adaptive valve — not a frozen
    constant — is what the hash gate checks. Semantic recall vs the
    exact measure is a MEASURED registry entry
    (``corpus_winnowing_cap_eval``), not an assertion."""
    return _winnow_pairs(spark, sf_dir, max_df=WINNOW_ADAPTIVE)


def _winnow_pairs_array_verify(
    spark: SparkSession, sf_dir: str, max_df: int | None
) -> DataFrame:
    """The r5-REJECTED array-verify plan, kept as a measurable variant
    (r6 directive #1 asks for measurement, not memory): smaller-side
    prefix probe against full postings, one sorted-array intersection
    per candidate, no groupBy-count. Exact — for a pair (x, y) with
    (n_x, x) < (n_y, y) lexicographic, overlap ≥ α_x =
    max(MIN_SHARED, ceil(n_x/2)) forces one of x's first
    n_x − α_x + 1 fingerprints into y, so probing x's prefix finds
    every qualifying pair. Same output rows as `_winnow_pairs`
    (asserted when measured); default stays the count-agg plan per the
    r5 AND r6 measurements (PLANS.md)."""
    width = max(4 * int(spark.conf.get("spark.sql.shuffle.partitions")), 128)
    fp = _winnow_fingerprints(spark, sf_dir, max_df)
    sets = (
        fp.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("fp")).alias("fps"),
            F.count(F.lit(1)).alias("n_fp"),
        )
        # A doc with < MIN_SHARED fingerprints can never reach
        # n_shared >= MIN_SHARED, and keeping it would make the prefix
        # slice length n_fp - alpha + 1 NEGATIVE (alpha floors at
        # MIN_SHARED; Spark's slice() throws on negative length).
        .filter(F.col("n_fp") >= WINNOW_MIN_SHARED)
        .persist()
    )
    sets.count()  # eager fill: three consumers below
    alpha = F.greatest(
        F.lit(WINNOW_MIN_SHARED), F.ceil(F.col("n_fp") / 2)
    ).cast("int")
    probes = sets.select(
        F.col("doc_id").alias("doc_s"),
        F.col("n_fp").alias("n_s"),
        F.explode(
            F.slice("fps", 1, (F.col("n_fp") - alpha + 1).cast("int"))
        ).alias("fp"),
    )
    postings = sets.select(
        F.col("doc_id").alias("doc_l"),
        F.col("n_fp").alias("n_l"),
        F.explode("fps").alias("fp"),
    )
    smaller = (F.col("n_s") < F.col("n_l")) | (
        (F.col("n_s") == F.col("n_l")) & (F.col("doc_s") < F.col("doc_l"))
    )
    cand = (
        probes.repartition(width, "fp")
        .join(postings.repartition(width, "fp"), "fp")
        .filter(smaller)
        .select("doc_s", "doc_l", "n_s", "n_l")
        .distinct()
    )
    ss = sets.select(F.col("doc_id").alias("doc_s"), F.col("fps").alias("fps_s"))
    sl = sets.select(F.col("doc_id").alias("doc_l"), F.col("fps").alias("fps_l"))
    return (
        cand.join(ss, "doc_s")
        .join(sl, "doc_l")
        .withColumn(
            "n_shared", F.size(F.array_intersect("fps_s", "fps_l")).cast("long")
        )
        .filter(
            (F.col("n_shared") >= WINNOW_MIN_SHARED)
            & (2 * F.col("n_shared") >= F.least("n_s", "n_l"))
        )
        .select(
            F.least("doc_s", "doc_l").alias("doc_a"),
            F.greatest("doc_s", "doc_l").alias("doc_b"),
            "n_shared",
            F.when(F.col("doc_s") < F.col("doc_l"), F.col("n_s"))
            .otherwise(F.col("n_l"))
            .alias("n_fp_a"),
            F.when(F.col("doc_s") < F.col("doc_l"), F.col("n_l"))
            .otherwise(F.col("n_s"))
            .alias("n_fp_b"),
            (F.col("n_shared") / F.least("n_s", "n_l"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("containment_est"),
        )
    )


def _winnow_adaptive_cap(dfs: DataFrame, n_docs: int) -> int:
    """Resolve the adaptive df cap from the fingerprint df table
    (``dfs`` = one (fp, df) row per distinct fingerprint, built ONCE by
    the caller and reused for the keep-filter): the largest df value c
    whose cumulative Σdf² (ascending by df) stays within
    ``WINNOW_PAIR_BUDGET_PER_DOC · n_docs``, floored at
    ``WINNOW_MAX_DF``.

    Plan shape: the df table collapses to the df HISTOGRAM (rows =
    distinct df VALUES — hundreds even on pathological corpora), and
    the cumulative walk is a window over that histogram (the
    unpartitioned window is bounded by the histogram size, not the
    corpus). The returned value is a driver SCALAR from a 1-row
    aggregate — the bounded-collect discipline (VERDICT r5), same as
    the order-probe at dedup.py:199."""
    budget = WINNOW_PAIR_BUDGET_PER_DOC * n_docs
    hist = dfs.groupBy("df").agg(F.sum(F.col("df") * F.col("df")).alias("s2"))
    w = Window.orderBy("df").rowsBetween(Window.unboundedPreceding, 0)
    row = (
        hist.withColumn("cum", F.sum("s2").over(w))
        .filter(F.col("cum") <= budget)
        .agg(F.max("df").alias("c"))
        .first()
    )
    return max(WINNOW_MAX_DF, int(row["c"] or 0))


# Memoized base fingerprint table per (applicationId, sf_dir): the
# md5-per-kgram extraction is the dominant shared stage (6.8 s of the
# 15 s capped build at sf0.1) and THREE registry entries consume it
# (exact, capped, cap_eval — the shared_jaccard_pair_build discipline).
# Value is (persisted fp frame, n_docs).
_WINNOW_FP_CACHE: dict[tuple[str, str], tuple[DataFrame, int]] = {}

# Memoized FINAL pair frames per (applicationId, sf_dir, max_df
# sentinel): outputs are tiny (26–285 rows at the gate SFs) and
# cap_eval re-reads both the exact and capped sets — localCheckpoint
# truncates the 190M-pair lineage so the eval costs two joins over
# output-sized frames, not two full rebuilds.
_WINNOW_PAIRS_CACHE: dict[tuple[str, str, object], DataFrame] = {}


def _winnow_base_fingerprints(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    """The UNCAPPED (doc_id, fp) table + the fingerprinted doc count,
    built once per (application, corpus) and persisted."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _WINNOW_FP_CACHE.get(key)
    if cached is not None:
        return cached
    width = max(4 * int(spark.conf.get("spark.sql.shuffle.partitions")), 128)
    d = (
        Catalog(spark, sf_dir)
        .table("documents")
        .filter(F.length("text") >= WINNOW_K)
        .repartition(width // 4)
    )
    k, w = WINNOW_K, WINNOW_W
    grams = F.expr(
        f"""
        transform(sequence(0, length(text) - {k}),
          i -> cast(conv(substring(md5(substring(text, i + 1, {k})), 1, 10),
                         16, 10) AS BIGINT))
        """
    )
    fps = F.expr(
        f"""
        array_distinct(transform(
          sequence(0, greatest(size(g) - {w}, 0)),
          j -> aggregate(
                 sequence(j, least(j + {w} - 1, size(g) - 1)),
                 cast(9223372036854775807 as bigint),
                 (acc, u) -> least(acc, g[u] * {w} + ({w} - 1 - (u - j)))
               ) div {w}))
        """
    )
    fp = (
        d.select("doc_id", grams.alias("g"))
        .select("doc_id", F.explode(fps).alias("fp"))
        .persist()
    )
    fp.count()  # eager fill: every consumer below reads the cache
    out = (fp, d.count())
    _WINNOW_FP_CACHE[key] = out
    return out


def _winnow_fingerprints(
    spark: SparkSession, sf_dir: str, max_df: int | None | str
) -> DataFrame:
    """Shared fingerprint extraction (doc_id, fp) with the optional
    df-cap applied — split out so the count-agg plan and the measurable
    array-verify variant provably consume identical inputs.
    ``max_df=WINNOW_ADAPTIVE`` resolves the cap from the df histogram
    (see ``_winnow_adaptive_cap``)."""
    fp, n_docs = _winnow_base_fingerprints(spark, sf_dir)
    if max_df is not None:
        # df table built ONCE (vocab-sized, map-side-combinable) and
        # persisted: the adaptive probe's histogram AND the keep-filter
        # both read it — without the persist the probe doubles the
        # heaviest aggregation.
        dfs = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).persist()
        if max_df == WINNOW_ADAPTIVE:
            max_df = _winnow_adaptive_cap(dfs, n_docs)
        keep = dfs.filter(F.col("df") <= max_df).select("fp")
        capped = fp.join(keep, "fp").select("doc_id", "fp").persist()
        capped.count()
        dfs.unpersist()
        fp = capped
    return fp


def _winnow_pairs(
    spark: SparkSession, sf_dir: str, max_df: int | None | str
) -> DataFrame:
    # Memoized per (application, corpus, cap sentinel): the output is
    # output-sized (tens to hundreds of rows at gate SFs) and cap_eval
    # re-reads both the exact and the capped pair sets — the eager
    # localCheckpoint below truncates the pair-join lineage so reuse
    # costs a cached-frame read, not a rebuild.
    key = (spark.sparkContext.applicationId, sf_dir, max_df)
    cached = _WINNOW_PAIRS_CACHE.get(key)
    if cached is not None:
        return cached
    # Fingerprint extraction shared with the array-verify variant
    # (round-robin pre-split + persist + optional df-cap all live in
    # `_winnow_fingerprints` — the one-file-scan lesson and the r4
    # unpersist ADVICE are documented there).
    width = max(4 * int(spark.conf.get("spark.sql.shuffle.partitions")), 128)
    fp = _winnow_fingerprints(spark, sf_dir, max_df)
    if max_df is None:
        # Pre-flight the EXACT measure: Σdf² IS the pair-join output
        # row count; computing it from the (persisted) fp table costs
        # one vocab-sized agg, vs. filling local disk mid-shuffle when
        # the measure is infeasible (r7 sf1 gate: ~1.9G pair rows vs
        # ~79 GB scratch). Both sf1 fixtures exceed the default budget
        # (uniform 1.9G, Zipf 1.33G; sf0.1 is 190M — well under).
        from ..functions.admission import exact_pair_budget

        budget = exact_pair_budget(scale=0.25)
        s2 = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(F.sum(F.expr("df * df")).alias("s2"))
            .first()["s2"]
            or 0
        )
        if s2 > budget:
            raise ExactMeasureBoundError(
                f"corpus_winnowing exact measure needs {s2:,} pair-join "
                f"rows > budget {budget:,}; run the oracle-checked scale "
                "twin corpus_winnowing_capped instead, or raise "
                "SPARK_GRAFT_EXACT_PAIR_BUDGET on a host with the disk"
            )
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    # explicit width: AQE coalesces this join's partitions by INPUT bytes
    # (a few MB) but the self-join's OUTPUT is Σdf² (190M pair rows at
    # sf0.1) — see corpus_containment for the measured numbers (48 s on
    # AQE's single coalesced task → ~14 s at 128-way)
    width = max(4 * int(spark.conf.get("spark.sql.shuffle.partitions")), 128)
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp").repartition(width, "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp").repartition(width, "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b"))
    out = (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(2 * F.col("n_shared") >= F.least("n_fp_a", "n_fp_b"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            (F.col("n_shared") / F.least("n_fp_a", "n_fp_b"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("containment_est"),
        )
        .localCheckpoint(eager=True)
    )
    _WINNOW_PAIRS_CACHE[key] = out
    return out


CORPUS_WINNOWING_SQL = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= {WINNOW_K}
),
g AS (
  SELECT doc_id,
         list_transform(generate_series(0, length(text) - {WINNOW_K}),
           i -> CAST(('0x' || substr(md5(substring(text, i + 1, {WINNOW_K})), 1, 10))
                     AS BIGINT)) AS g
  FROM d
),
fp AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(0, GREATEST(len(g) - {WINNOW_W}, 0)),
             j -> list_min(list_transform(
                    generate_series(j, LEAST(j + {WINNOW_W} - 1, len(g) - 1)),
                    u -> g[u + 1] * {WINNOW_W} + ({WINNOW_W} - 1 - (u - j))))
                  // {WINNOW_W}))) AS fp
    FROM g)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM fp a JOIN fp b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
)
SELECT doc_a, doc_b, n_shared, sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
       CAST(CAST(n_shared / LEAST(sa.n_fp, sb.n_fp) AS DECIMAL(18,6)) AS DOUBLE)
         AS containment_est
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 2 * n_shared >= LEAST(sa.n_fp, sb.n_fp)
"""


# Replays the ADAPTIVE fingerprint-df cap exactly: both engines walk the
# df histogram's cumulative Σdf² to the same integer cap (largest df
# with cum ≤ budget·n_docs, floored at WINNOW_MAX_DF), drop fingerprints
# above it before the pair join, and compute sizes/containment over the
# capped sets — the scale-safe ADAPTIVE plan is the oracle-checked one
# (r7 verdict directive #1).
CORPUS_WINNOWING_CAPPED_SQL = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= {WINNOW_K}
),
g AS (
  SELECT doc_id,
         list_transform(generate_series(0, length(text) - {WINNOW_K}),
           i -> CAST(('0x' || substr(md5(substring(text, i + 1, {WINNOW_K})), 1, 10))
                     AS BIGINT)) AS g
  FROM d
),
fp0 AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(0, GREATEST(len(g) - {WINNOW_W}, 0)),
             j -> list_min(list_transform(
                    generate_series(j, LEAST(j + {WINNOW_W} - 1, len(g) - 1)),
                    u -> g[u + 1] * {WINNOW_W} + ({WINNOW_W} - 1 - (u - j))))
                  // {WINNOW_W}))) AS fp
    FROM g)
),
dfs AS MATERIALIZED (SELECT fp, COUNT(*) AS df FROM fp0 GROUP BY fp),
hist AS (SELECT df, SUM(df * df) AS s2 FROM dfs GROUP BY df),
cap AS (
  SELECT GREATEST({WINNOW_MAX_DF},
           COALESCE(MAX(df) FILTER (WHERE cum <=
             {WINNOW_PAIR_BUDGET_PER_DOC} * (SELECT COUNT(*) FROM d)), 0)) AS c
  FROM (SELECT df, SUM(s2) OVER (ORDER BY df) AS cum FROM hist)
),
keep AS (
  SELECT fp FROM dfs WHERE df <= (SELECT c FROM cap)
),
fp AS (SELECT fp0.doc_id, fp0.fp FROM fp0 JOIN keep USING (fp)),
sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM fp a JOIN fp b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
)
SELECT doc_a, doc_b, n_shared, sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
       CAST(CAST(n_shared / LEAST(sa.n_fp, sb.n_fp) AS DECIMAL(18,6)) AS DOUBLE)
         AS containment_est
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE 2 * n_shared >= LEAST(sa.n_fp, sb.n_fp)
"""


def corpus_winnowing_cap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured semantic cost of the ADAPTIVE winnowing df-cap (r7
    verdict directive #1 "done" condition — the
    ``corpus_containment_cap_eval`` discipline applied to winnowing):
    the EXACT winnowing pair set is truth; the adaptive-capped plan is
    the system; one row reports |truth|, |capped|, their overlap, and
    precision/recall in ppm. Recall at the gate SF is thereby a
    MEASURED number (25/26 at sf0.01, vs the old constant cap's 23/26),
    not an assertion.

    Plan: both pair sets are the bounded inverted-index builds above;
    the comparison is two tiny joins on (doc_a, doc_b) over
    output-sized frames. localCheckpoint: each pair frame feeds two
    counting actions — without it every count re-executes the full
    fingerprint build."""
    exact = (
        _winnow_pairs(spark, sf_dir, max_df=None)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    capped = (
        _winnow_pairs(spark, sf_dir, max_df=WINNOW_ADAPTIVE)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    hit = exact.join(capped, ["doc_a", "doc_b"], "left_semi")
    n_truth = exact.count()
    n_capped = capped.count()
    n_hit = hit.count()
    return spark.createDataFrame(
        [(n_truth, n_capped, n_hit)],
        "n_truth long, n_capped long, n_hit long",
    ).select(
        "n_truth",
        "n_capped",
        "n_hit",
        F.expr("n_hit * 1000000L div greatest(n_capped, 1)").alias(
            "precision_ppm"
        ),
        F.expr("n_hit * 1000000L div greatest(n_truth, 1)").alias("recall_ppm"),
    )


# Truth = the exact winnowing pair set; system = the adaptive-capped
# build (identical histogram walk as CORPUS_WINNOWING_CAPPED_SQL).
# Every multiply-referenced CTE is MATERIALIZED — DuckDB inlines plain
# CTEs at each reference site, and the fingerprint build is the
# expensive subtree here.
CORPUS_WINNOWING_CAP_EVAL_SQL = f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= {WINNOW_K}
),
g AS (
  SELECT doc_id,
         list_transform(generate_series(0, length(text) - {WINNOW_K}),
           i -> CAST(('0x' || substr(md5(substring(text, i + 1, {WINNOW_K})), 1, 10))
                     AS BIGINT)) AS g
  FROM d
),
fp0 AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(0, GREATEST(len(g) - {WINNOW_W}, 0)),
             j -> list_min(list_transform(
                    generate_series(j, LEAST(j + {WINNOW_W} - 1, len(g) - 1)),
                    u -> g[u + 1] * {WINNOW_W} + ({WINNOW_W} - 1 - (u - j))))
                  // {WINNOW_W}))) AS fp
    FROM g)
),
sz0 AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp0 GROUP BY doc_id),
sh0 AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM fp0 a JOIN fp0 b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
),
truth AS MATERIALIZED (
  SELECT doc_a, doc_b FROM sh0
  JOIN sz0 sa ON sa.doc_id = doc_a JOIN sz0 sb ON sb.doc_id = doc_b
  WHERE 2 * n_shared >= LEAST(sa.n_fp, sb.n_fp)
),
dfs AS MATERIALIZED (SELECT fp, COUNT(*) AS df FROM fp0 GROUP BY fp),
hist AS (SELECT df, SUM(df * df) AS s2 FROM dfs GROUP BY df),
cap AS (
  SELECT GREATEST({WINNOW_MAX_DF},
           COALESCE(MAX(df) FILTER (WHERE cum <=
             {WINNOW_PAIR_BUDGET_PER_DOC} * (SELECT COUNT(*) FROM d)), 0)) AS c
  FROM (SELECT df, SUM(s2) OVER (ORDER BY df) AS cum FROM hist)
),
fp1 AS MATERIALIZED (
  SELECT fp0.doc_id, fp0.fp FROM fp0
  JOIN dfs USING (fp) WHERE dfs.df <= (SELECT c FROM cap)
),
sz1 AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp1 GROUP BY doc_id),
sh1 AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM fp1 a JOIN fp1 b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
),
capped AS MATERIALIZED (
  SELECT doc_a, doc_b FROM sh1
  JOIN sz1 sa ON sa.doc_id = doc_a JOIN sz1 sb ON sb.doc_id = doc_b
  WHERE 2 * n_shared >= LEAST(sa.n_fp, sb.n_fp)
),
hit AS (SELECT doc_a, doc_b FROM truth INTERSECT SELECT doc_a, doc_b FROM capped)
SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT)  AS n_truth,
       CAST((SELECT COUNT(*) FROM capped) AS BIGINT) AS n_capped,
       CAST((SELECT COUNT(*) FROM hit) AS BIGINT)    AS n_hit,
       (SELECT COUNT(*) FROM hit) * 1000000
         // GREATEST((SELECT COUNT(*) FROM capped), 1) AS precision_ppm,
       (SELECT COUNT(*) FROM hit) * 1000000
         // GREATEST((SELECT COUNT(*) FROM truth), 1)  AS recall_ppm
"""


def text_lm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty against the corpus bigram LM (§2.4 quality
    scoring — the LM-based filter step of a curation pipeline, with the
    count table standing in for a trained LM so the score stays
    integer-exact): a document's novelty is the share of its bigram
    occurrences that are corpus hapax (total corpus count = 1, i.e. the
    bigram exists nowhere else). High-novelty docs are either original
    or garbage; both are exactly what the curation reviewer samples.

    Plan: adjacent-pair expansion is map-side (same transform as
    ``text_bigram_lm``); ONE keyed agg builds the corpus (w1,w2) counts;
    doc-pairs re-join those counts keyed by the bigram (vocabulary²-
    bounded table — at 100 TB this is the shuffle that matters and it is
    keyed, no broadcast of a corpus-sized side); final doc-keyed agg.
    novelty_ppm = hapax·10⁶ div n_bigrams is integer-exact.
    """
    d = Catalog(spark, sf_dir).table("documents")
    tokd = d.select("doc_id", _words().alias("t"))
    pairs_expr = F.when(
        F.size(F.col("t")) >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    doc_pairs = tokd.select("doc_id", F.explode(pairs_expr).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    # doc_pairs feeds the corpus count AND the per-doc join — one
    # tokenization, two consumers
    doc_pairs = doc_pairs.persist()
    counts = doc_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cn"))
    return (
        doc_pairs.join(counts, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("cn") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .filter(F.col("n_bigrams") > 0)
        .select(
            "doc_id",
            "n_bigrams",
            "n_hapax",
            F.expr("n_hapax * 1000000 div n_bigrams").alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


TEXT_LM_NOVELTY_SQL = """
WITH tokd AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
doc_pairs AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, GREATEST(LEN(t) - 1, 0)),
                               i -> {'w1': t[i], 'w2': t[i + 1]})) AS p
  FROM tokd
),
flat AS (
  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM doc_pairs
),
counts AS (
  SELECT w1, w2, COUNT(*) AS cn FROM flat GROUP BY 1, 2
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CASE WHEN cn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(SUM(CASE WHEN cn = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         // COUNT(*) AS novelty_ppm
FROM flat JOIN counts USING (w1, w2)
GROUP BY doc_id
HAVING COUNT(*) > 0
ORDER BY doc_id
"""


COLLOC_MIN_COUNT = 5
COLLOC_TOP_K = 50


def text_collocations_dice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by Dice coefficient (§2.4 text analysis — the
    phrase-table / tokenizer-merge candidate pass): for bigrams seen at
    least {COLLOC_MIN_COUNT} times, dice = 2·c(xy)/(c(x)+c(y)), the
    log-free association score (PMI needs ln; Dice ranks the same
    "these words belong together" signal with one integer division, so
    the pinned output stays transcendental-free).

    Plan: ONE pair-keyed agg for bigram counts (map-side expansion, the
    text_bigram_lm shape), ONE word-keyed agg for unigram counts, two
    keyed joins to attach c(x)/c(y) — the unigram table is
    vocabulary-sized so at 100 TB the joins stay bounded; TakeOrdered
    bounds the output.
    """
    d = Catalog(spark, sf_dir).table("documents")
    tokd = d.select(_words().alias("t"))
    pairs_expr = F.when(
        F.size(F.col("t")) >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    tokd = tokd.persist()
    bi = (
        tokd.select(F.explode(pairs_expr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= COLLOC_MIN_COUNT)
    )
    uni = (
        tokd.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("cx"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("cy"))
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            "cxy",
            "cx",
            "cy",
            F.expr("2 * cxy * 1000000 div (cx + cy)").alias("dice_ppm"),
        )
        .orderBy(F.desc("dice_ppm"), F.desc("cxy"), "w1", "w2")
        .limit(COLLOC_TOP_K)
    )


TEXT_COLLOCATIONS_DICE_SQL = f"""
WITH tokd AS (
  SELECT string_split(text, ' ') AS t FROM documents
),
flat AS (
  SELECT p.w1 AS w1, p.w2 AS w2 FROM (
    SELECT UNNEST(list_transform(generate_series(1, GREATEST(LEN(t) - 1, 0)),
                                 i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS p
    FROM tokd
  )
),
bi AS (
  SELECT w1, w2, COUNT(*) AS cxy FROM flat GROUP BY 1, 2
  HAVING COUNT(*) >= {COLLOC_MIN_COUNT}
),
uni AS (
  SELECT w, COUNT(*) AS cw FROM (
    SELECT UNNEST(t) AS w FROM tokd
  ) GROUP BY w
)
SELECT w1, w2, cxy, u1.cw AS cx, u2.cw AS cy,
       2 * cxy * 1000000 // (u1.cw + u2.cw) AS dice_ppm
FROM bi
JOIN uni u1 ON w1 = u1.w
JOIN uni u2 ON w2 = u2.w
ORDER BY dice_ppm DESC, cxy DESC, w1, w2
LIMIT {COLLOC_TOP_K}
"""


VOCAB_GROWTH_BUCKET = 50


def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve (§2.4 corpus ops — the "is more
    data still adding vocabulary?" collection-planning readout): docs are
    consumed in doc_id order in buckets of {VOCAB_GROWTH_BUCKET}; each
    word is credited to the bucket of its FIRST occurrence; the curve is
    cumulative vocabulary vs cumulative tokens per bucket.

    Plan: one word-keyed agg computes each word's first doc (MIN
    doc_id) — the corpus-sized shuffle; bucket rollups are
    bucket-count-sized, and the cumulative window runs over the BUCKET
    table (corpus/50 rows, not corpus rows), so the unpartitioned
    running sum — the usual Heaps-curve scale killer — only ever sees
    curve points.
    """
    d = Catalog(spark, sf_dir).table("documents")
    words = d.select("doc_id", F.explode(_words()).alias("w"))
    bucket = (F.col("doc_id") / F.lit(VOCAB_GROWTH_BUCKET)).cast("bigint")
    first = (
        words.groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy((F.col("first_doc") / F.lit(VOCAB_GROWTH_BUCKET)).cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    toks = words.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        toks.join(first, "bucket", "left")
        .fillna({"new_words": 0})
        .select(
            "bucket",
            "n_tokens",
            "new_words",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.sum("new_words").over(w).alias("cum_vocab"),
        )
        .orderBy("bucket")
    )


CORPUS_VOCAB_GROWTH_SQL = f"""
WITH words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
),
firstdoc AS (
  SELECT w, MIN(doc_id) AS fd FROM words GROUP BY w
),
first AS (
  SELECT fd // {VOCAB_GROWTH_BUCKET} AS bucket, COUNT(*) AS new_words
  FROM firstdoc GROUP BY fd // {VOCAB_GROWTH_BUCKET}
),
toks AS (
  SELECT doc_id // {VOCAB_GROWTH_BUCKET} AS bucket, COUNT(*) AS n_tokens
  FROM words GROUP BY 1
)
SELECT toks.bucket AS bucket, n_tokens,
       COALESCE(new_words, 0) AS new_words,
       CAST(SUM(n_tokens) OVER (ORDER BY toks.bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(new_words, 0)) OVER (ORDER BY toks.bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
FROM toks LEFT JOIN first ON toks.bucket = first.bucket
ORDER BY bucket
"""


OOV_VOCAB_SIZE = 1000


def corpus_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-
    {OOV_VOCAB_SIZE} vocabulary (§2.4 quality scoring — the tokenizer-
    coverage screen: docs that a fixed vocab can't cover become UNK
    storms downstream, and this flags them before training does).

    Vocabulary = top words by (count DESC, word ASC) — total order, so
    both engines pick the identical vocab even at count ties.

    Plan: word counts are ONE keyed agg; the vocab is rank-truncated
    (vocabulary-sized window, not corpus-sized); doc-words LEFT JOIN the
    vocab — at production vocab sizes this join side is broadcast-small
    by construction; per-doc rollup is the second keyed agg.
    oov_ppm = oov·10⁶ div tokens stays integer-exact.
    """
    d = Catalog(spark, sf_dir).table("documents")
    words = d.select("doc_id", F.explode(_words()).alias("w"))
    words = words.persist()
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    wrk = Window.orderBy(F.desc("cw"), F.asc("w"))
    vocab = (
        counts.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= OOV_VOCAB_SIZE)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("n_oov * 1000000 div n_tokens").alias("oov_ppm"),
        )
        .orderBy("doc_id")
    )


CORPUS_OOV_RATE_SQL = f"""
WITH words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
),
counts AS (
  SELECT w, COUNT(*) AS cw FROM words GROUP BY w
),
vocab AS (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY cw DESC, w ASC) AS rk FROM counts
  ) WHERE rk <= {OOV_VOCAB_SIZE}
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         * 1000000 // COUNT(*) AS oov_ppm
FROM words LEFT JOIN vocab ON words.w = vocab.w
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Epoch-based source upsampling (data-mixing plan)
# ---------------------------------------------------------------------------

def corpus_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repeat upsampling plan (§2.4 data mixing — the "repeat the
    small high-quality source N times" step of every pretraining mix):
    bring every source up to the LARGEST source's token count via
    full_epochs = max_tokens div tokens integer repeats plus a residual
    set of docs chosen deterministically by content hash — a greedy
    hash-ordered prefix whose cumulative tokens fit the residual budget.
    The output is the per-source plan (epochs, residual picks, final
    token count and its shortfall) that the shard writer executes.

    Plan: one per-source agg (≤|sources| rows) + a 1-row max broadcast
    decides epochs; the residual pick is ONE window pass per source
    (cumulative sum over hash order — corpus-sized but partitioned by
    source, no global sort) and collapses straight back to per-source
    rows. Pure integer arithmetic end-to-end: div/cumulative BIGINT
    sums, so the plan replays bit-identically.
    """
    d = Catalog(spark, sf_dir).table("documents")
    toks = ((F.col("n_chars") + 3) / 4).cast("long")
    docs = d.select(
        "doc_id",
        "source",
        toks.alias("tokens"),
        md5_long(F.col("doc_id").cast("string")).alias("h"),
    )
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tokens").alias("src_tokens")
    )
    mx = per_src.agg(F.max("src_tokens").alias("max_tokens"))
    plan = per_src.crossJoin(F.broadcast(mx)).select(
        "source",
        "n_docs",
        "src_tokens",
        F.expr("max_tokens div src_tokens").alias("full_epochs"),
        (F.col("max_tokens") % F.col("src_tokens")).alias("residual_budget"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        docs.withColumn("cum", F.sum("tokens").over(w))
        .join(F.broadcast(plan.select("source", "residual_budget")), "source")
        .filter(F.col("cum") <= F.col("residual_budget"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("residual_docs"),
            F.sum("tokens").alias("residual_tokens"),
        )
    )
    return (
        plan.join(picked, "source", "left")
        .select(
            "source",
            "n_docs",
            "src_tokens",
            "full_epochs",
            "residual_budget",
            F.coalesce(F.col("residual_docs"), F.lit(0)).cast("long").alias("residual_docs"),
            F.coalesce(F.col("residual_tokens"), F.lit(0)).cast("long").alias("residual_tokens"),
            (
                F.col("full_epochs") * F.col("src_tokens")
                + F.coalesce(F.col("residual_tokens"), F.lit(0))
            ).alias("planned_tokens"),
        )
        .orderBy("source")
    )


CORPUS_EPOCH_UPSAMPLE_SQL = """
WITH docs AS (
  SELECT doc_id, source, (n_chars + 3) // 4 AS tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM documents
),
per_src AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS src_tokens
  FROM docs GROUP BY source
),
plan AS (
  SELECT source, n_docs, src_tokens,
         CAST((SELECT MAX(src_tokens) FROM per_src) // src_tokens AS BIGINT)
           AS full_epochs,
         CAST((SELECT MAX(src_tokens) FROM per_src) % src_tokens AS BIGINT)
           AS residual_budget
  FROM per_src
),
cum AS (
  SELECT source, tokens,
         SUM(tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM docs
),
picked AS (
  SELECT c.source, COUNT(*) AS residual_docs, SUM(c.tokens) AS residual_tokens
  FROM cum c JOIN plan p ON c.source = p.source
  WHERE c.cum <= p.residual_budget
  GROUP BY c.source
)
SELECT p.source, p.n_docs, p.src_tokens, p.full_epochs, p.residual_budget,
       CAST(COALESCE(residual_docs, 0) AS BIGINT) AS residual_docs,
       CAST(COALESCE(residual_tokens, 0) AS BIGINT) AS residual_tokens,
       CAST(p.full_epochs * p.src_tokens + COALESCE(residual_tokens, 0)
            AS BIGINT) AS planned_tokens
FROM plan p LEFT JOIN picked ON p.source = picked.source
ORDER BY p.source
"""


# ---------------------------------------------------------------------------
# Linear quality-classifier scoring (model-based filtering, integer logit)
# ---------------------------------------------------------------------------

QUALITY_LOGIT_THRESHOLD_MILLI = 0


def corpus_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (§2.4 corpus ops — the fasttext-style
    linear classifier gate of CCNet/C4-descendant pipelines, expressed
    as its feature→weight dot product): a per-doc integer logit over
    interpretable features (length band, stopword density, lexical
    diversity, repetition), thresholded into keep/drop. The weights are
    fixed integers standing in for trained coefficients — the OPERATOR
    is the scan-side scoring plan; swapping in learned weights changes
    constants, not the plan.

    Exactness: every feature is an integer (counts, or milli-ratios via
    BIGINT cross-multiplied division), the logit is a BIGINT dot
    product, and the keep decision is an integer compare — zero float
    ops, so the gate replays bit-identically on any engine. Zero
    shuffles: pure per-row projection (the 100 TB cost is the scan).
    """
    d = Catalog(spark, sf_dir).table("documents")
    w = _words()
    n_words = F.size(w).cast("long")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("long")
    n_distinct = F.size(F.array_distinct(w)).cast("long")
    # milli-ratios: integer division AFTER the ×1000 (exact, replayable)
    stop_milli = F.expr("n_stop * 1000 div n_words")
    distinct_milli = F.expr("n_distinct * 1000 div n_words")
    scored = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_stop.alias("n_stop"),
        n_distinct.alias("n_distinct"),
    ).select(
        "doc_id",
        "n_words",
        stop_milli.alias("stop_milli"),
        distinct_milli.alias("distinct_milli"),
        ((F.col("n_words") >= 20) & (F.col("n_words") <= 1000)).alias("len_ok"),
    )
    logit = (
        F.when(F.col("len_ok"), F.lit(500)).otherwise(F.lit(-1500))
        + (F.col("stop_milli") - 100) * 3
        + (F.col("distinct_milli") - 400) * 2
    ).cast("bigint")
    return scored.select(
        "doc_id",
        "n_words",
        "stop_milli",
        "distinct_milli",
        logit.alias("logit_milli"),
        (logit >= QUALITY_LOGIT_THRESHOLD_MILLI).alias("keep"),
    )


CORPUS_QUALITY_LOGIT_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(LEN(list_filter(string_split(text, ' '),
                  x -> x IN ({_STOP_LIST}))) AS BIGINT) AS n_stop,
         CAST(LEN(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
  FROM documents
),
scored AS (
  SELECT doc_id, n_words,
         n_stop * 1000 // n_words AS stop_milli,
         n_distinct * 1000 // n_words AS distinct_milli,
         n_words >= 20 AND n_words <= 1000 AS len_ok
  FROM feats
)
SELECT doc_id, n_words, stop_milli, distinct_milli,
       CAST(CASE WHEN len_ok THEN 500 ELSE -1500 END
            + (stop_milli - 100) * 3
            + (distinct_milli - 400) * 2 AS BIGINT) AS logit_milli,
       CASE WHEN len_ok THEN 500 ELSE -1500 END
            + (stop_milli - 100) * 3
            + (distinct_milli - 400) * 2 >= {QUALITY_LOGIT_THRESHOLD_MILLI} AS keep
FROM scored
"""


# ---------------------------------------------------------------------------
# DSIR-style hashed-ngram importance scoring (domain affinity)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TOPK = 50


def corpus_dsir_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-n-gram importance scoring for targeted data selection —
    the DSIR shape (Xie et al. 2023, public: score documents by how
    their hashed-bigram distribution compares to a target domain's) with
    an integer-exact scoring rule: bucket every word bigram into
    {DSIR_BUCKETS} hash buckets, estimate each bucket's frequency in
    ppm for the TARGET corpus (source 'src0', the same held-out split
    the contamination screen uses) and the RAW corpus (everything else),
    and score each raw document by the mean per-bigram ppm advantage
    (Σ (target_ppm − raw_ppm)) div n_bigrams. Positive = looks like the
    target domain; the top-{DSIR_TOPK} are what an importance-resampled
    training mix pulls forward. (True DSIR uses log-likelihood ratios —
    a transcendental the oracle cannot pin; the ppm-difference score
    preserves the hashed-ngram plumbing and the ranking's integer
    replayability.)

    Plan: one bigram explode (map-side), ONE bucket-grain agg per corpus
    ({DSIR_BUCKETS} rows — the "model" is a broadcast-sized table,
    exactly DSIR's hashed parameterization), then scoring re-joins the
    doc bigram stream to the tiny bucket table. Nothing corpus-sized
    shuffles twice.
    """
    d = Catalog(spark, sf_dir).table("documents")
    toks = _words()
    n_big = F.size(toks) - 1
    bigrams = F.when(
        n_big >= 1,
        F.transform(
            F.sequence(F.lit(1), n_big),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # round-robin pre-split: the documents table is one parquet file at
    # bench SF, and without the split the corpus-wide explode+md5 runs
    # on a single task (the one-file-scan lesson)
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    posts = (
        d.repartition(width)
        .select("doc_id", "source", F.explode(bigrams).alias("bg"))
        .select(
            "doc_id", "source", (md5_long("bg") % DSIR_BUCKETS).alias("bucket")
        )
        # persist: FIVE consumers read the exploded+hashed bigram stream
        # (two totals, two bucket aggs, the scoring join) — without it
        # the corpus-wide explode+md5 re-ran per consumer (measured ~5×
        # the scan work; bench clearCache frees it between queries)
        .persist()
    )
    target = posts.filter(F.col("source") == BENCHMARK_SOURCE)
    raw = posts.filter(F.col("source") != BENCHMARK_SOURCE)
    # both corpus totals in ONE pass over the persisted stream (two
    # bounded scalars on the driver, not two corpus jobs)
    tot_rows = {
        r.is_t: r["count"]
        for r in posts.groupBy(
            (F.col("source") == BENCHMARK_SOURCE).alias("is_t")
        )
        .count()
        .collect()
    }
    t_tot = tot_rows.get(True, 0)
    r_tot = tot_rows.get(False, 0)
    t_ppm = target.groupBy("bucket").agg(
        F.expr(f"count(1) * 1000000 div {t_tot}").alias("t_ppm")
    )
    r_ppm = raw.groupBy("bucket").agg(
        F.expr(f"count(1) * 1000000 div {r_tot}").alias("r_ppm")
    )
    model = (
        t_ppm.join(r_ppm, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("t_ppm", F.lit(0)).alias("t_ppm"),
            F.coalesce("r_ppm", F.lit(0)).alias("r_ppm"),
        )
    )
    scored = (
        raw.join(model, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("t_ppm") - F.col("r_ppm")).alias("adv_sum"),
        )
    )
    # adv_sum can be NEGATIVE: integer div/// semantics differ across
    # engines on negatives (truncate vs floor), so the mean uses an
    # explicit IEEE divide + floor — exact here (|adv_sum| < 2^53)
    return scored.select(
        "doc_id",
        F.col("n_bigrams").cast("int").alias("n_bigrams"),
        F.floor(F.col("adv_sum") / F.col("n_bigrams")).cast("bigint").alias("affinity_ppm"),
    ).orderBy(F.desc("affinity_ppm"), "doc_id").limit(DSIR_TOPK)


CORPUS_DSIR_AFFINITY_SQL = f"""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
posts AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(bg), 1, 8))::BIGINT % {DSIR_BUCKETS} AS BIGINT) AS bucket
  FROM (SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(w)-1),
                      i -> w[i] || ' ' || w[i+1])) AS bg
        FROM toks WHERE len(w) >= 2)
),
t AS (SELECT bucket, COUNT(*) AS c FROM posts WHERE source = '{BENCHMARK_SOURCE}' GROUP BY bucket),
r AS (SELECT bucket, COUNT(*) AS c FROM posts WHERE source <> '{BENCHMARK_SOURCE}' GROUP BY bucket),
tot AS (
  SELECT (SELECT SUM(c) FROM t) AS t_tot, (SELECT SUM(c) FROM r) AS r_tot
),
model AS (
  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
         COALESCE(t.c, 0) * 1000000 // t_tot AS t_ppm,
         COALESCE(r.c, 0) * 1000000 // r_tot AS r_ppm
  FROM t FULL JOIN r ON t.bucket = r.bucket, tot
),
scored AS (
  SELECT p.doc_id, COUNT(*) AS n_bigrams,
         SUM(m.t_ppm - m.r_ppm) AS adv_sum
  FROM posts p JOIN model m USING (bucket)
  WHERE p.source <> '{BENCHMARK_SOURCE}'
  GROUP BY p.doc_id
)
SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams,
       CAST(FLOOR(CAST(adv_sum AS DOUBLE) / n_bigrams) AS BIGINT) AS affinity_ppm
FROM scored
ORDER BY affinity_ppm DESC, doc_id
LIMIT {DSIR_TOPK}
"""


def text_dup_ngram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-n-gram fractions (Rae et al. 2021 §A1.1):
    the share of token n-gram OCCURRENCES that are repeats of an n-gram
    already seen in the same document, for n=2 and n=3 — the repetition
    signal that catches decoding loops and boilerplate that single-token
    diversity (``text_repetition``) misses (a looping model repeats
    PHRASES with a diverse vocabulary).

    ppm-quantized integer ratios (``(occ - distinct) * 1e6 div occ``) so
    the DuckDB oracle hash-matches bit-for-bit. Row-local array
    expressions only — zero shuffles, scan-bound, linear at 100 TB.
    ``sequence(1, n)`` is guarded by a CASE (Spark's sequence DESCENDS
    for stop < start — the empty-document branch must never build it).

    Reference scope: quality filtering generalizes the reference's
    row-conversion stage (fetch.go:219-232) to corpus curation.
    """
    d = Catalog(spark, sf_dir).table("documents")
    d = d.select("doc_id", F.split("text", " ").alias("w"))
    gram = (
        "CASE WHEN size(w) >= {n} THEN transform(sequence(1, size(w) - {k}), "
        "i -> concat({parts})) ELSE array() END"
    )
    g2 = gram.format(
        n=2, k=1, parts="element_at(w, i), ' ', element_at(w, i+1)"
    )
    g3 = gram.format(
        n=3,
        k=2,
        parts="element_at(w, i), ' ', element_at(w, i+1), ' ', element_at(w, i+2)",
    )
    dup = (
        "CASE WHEN size({g}) = 0 THEN 0L ELSE "
        "CAST(size({g}) - size(array_distinct({g})) AS BIGINT) * 1000000 "
        "div size({g}) END"
    )
    return d.select(
        "doc_id", F.expr(g2).alias("g2"), F.expr(g3).alias("g3")
    ).select(
        "doc_id",
        F.size("g2").alias("n_grams2"),
        F.expr(dup.format(g="g2")).alias("dup2_ppm"),
        F.size("g3").alias("n_grams3"),
        F.expr(dup.format(g="g3")).alias("dup3_ppm"),
    )


TEXT_DUP_NGRAM_FRAC_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w, LEN(string_split(text, ' ')) AS nw
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN nw >= 2
              THEN list_transform(range(1, nw), i -> w[i] || ' ' || w[i+1])
              ELSE [] END AS g2,
         CASE WHEN nw >= 3
              THEN list_transform(range(1, nw - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              ELSE [] END AS g3
  FROM toks
)
SELECT doc_id,
       CAST(LEN(g2) AS INT) AS n_grams2,
       CAST(CASE WHEN LEN(g2) = 0 THEN 0
            ELSE (LEN(g2) - LEN(list_distinct(g2))) * 1000000
                 // CAST(LEN(g2) AS BIGINT) END AS BIGINT) AS dup2_ppm,
       CAST(LEN(g3) AS INT) AS n_grams3,
       CAST(CASE WHEN LEN(g3) = 0 THEN 0
            ELSE (LEN(g3) - LEN(list_distinct(g3))) * 1000000
                 // CAST(LEN(g3) AS BIGINT) END AS BIGINT) AS dup3_ppm
FROM grams
"""


def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding merge ROUND applied to the corpus — the
    tokenizer-side twin of ``corpus_bpe_pair_counts`` (which is the
    training statistic): real BPE merges exactly ONE pair per round (the
    argmax of the pair table), and this operator applies that merge and
    reports, per document, the base-token (character) count, how many
    merges landed, and the resulting token count. Iterating this op with
    the re-counted table IS tokenizer training.

    Single-pair insight that kills the sequential fold: greedy
    left-to-right non-overlapping application of one 2-char pair is
    exactly what literal ``replace`` computes in every engine, so
    merges per word = (len(w) − len(replace(w, pair, ''))) div 2 —
    row-local, integer, identical cross-engine (including the aa-in-aaa
    overlap case: replace is non-overlapping left-to-right in both).

    Plan: the argmax pair is ONE partial-aggregated count + TakeOrdered
    (count desc, pair asc tie-break) broadcast as a 1-row side; the
    apply pass is a zero-shuffle scan with an integer array fold per
    document. At 100 TB each training round costs one pair-count
    shuffle + one map-only apply — the standard distributed-BPE shape.

    Reference scope: extends the reference's row-conversion stage
    (fetch.go:219-232) toward tokenizer construction.
    """
    d = Catalog(spark, sf_dir).table("documents")
    word = F.explode(F.split(F.col("text"), " ")).alias("word")
    chars = F.split(F.col("word"), "")
    pairs = F.zip_with(
        F.slice(chars, 1, F.greatest(F.size(chars) - 1, F.lit(0))),
        F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
        lambda a, b: F.concat(a, b),
    )
    top1 = (
        d.select(word)
        .select(F.explode(pairs).alias("merge_pair"))
        .groupBy("merge_pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("merge_pair"))
        .limit(1)
        .select("merge_pair")
    )
    docs = d.select("doc_id", F.split("text", " ").alias("ws"))
    return docs.crossJoin(F.broadcast(top1)).select(
        "doc_id",
        "merge_pair",
        F.expr("aggregate(ws, 0, (acc, w) -> acc + length(w))").alias(
            "n_base_tokens"
        ),
        F.expr(
            "CAST(aggregate(ws, 0L, (acc, w) -> acc + "
            "(length(w) - length(replace(w, merge_pair, ''))) div 2) AS INT)"
        ).alias("n_merges"),
    ).withColumn(
        "n_tokens_after", (F.col("n_base_tokens") - F.col("n_merges")).cast("int")
    )


TEXT_BPE_MERGE_STEP_SQL = """
WITH words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
),
prs AS (
  SELECT UNNEST(list_transform(range(1, LEN(c)), i -> c[i] || c[i + 1]))
           AS merge_pair
  FROM (SELECT string_split(w, '') AS c FROM words)
),
top1 AS (
  SELECT merge_pair FROM (
    SELECT merge_pair, COUNT(*) AS n FROM prs GROUP BY merge_pair
  ) ORDER BY n DESC, merge_pair ASC LIMIT 1
)
SELECT d.doc_id, t.merge_pair,
       CAST(SUM(LEN(wd.w)) AS INT) AS n_base_tokens,
       CAST(SUM((LEN(wd.w) - LEN(replace(wd.w, t.merge_pair, ''))) // 2)
            AS INT) AS n_merges,
       CAST(SUM(LEN(wd.w)) - SUM((LEN(wd.w) - LEN(replace(wd.w, t.merge_pair, ''))) // 2)
            AS INT) AS n_tokens_after
FROM documents d
CROSS JOIN top1 t
LEFT JOIN words wd ON wd.doc_id = d.doc_id
GROUP BY d.doc_id, t.merge_pair
"""


KN_DISCOUNT_NUM = 3  # D = 3/4 — dyadic, exact in binary floating point
KN_TOP = 50          # report the top-K bigrams by raw count


def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities — the smoothing that
    made n-gram LMs competitive (Kneser & Ney 1995; KenLM's default)
    and the quality bar for LM-data pipelines that score corpora with
    count-based models. Unlike the MLE table (``text_bigram_lm``), KN
    (a) subtracts a fixed discount D from every observed bigram and
    (b) backs off to the CONTINUATION unigram — how many distinct left
    contexts a word follows — which fixes the "San Francisco" problem
    (high count(francisco) but only one context).

        p_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
                      + D·N1+(w1,•)/c(w1) · N1+(•,w2)/N1+(•,•)

    Exactness: D = 3/4 is dyadic, every other term is an integer count,
    and the whole expression is ONE fixed IEEE tree (+,·,/ only) —
    bit-stable across engines; emitted both as raw double and
    ppb-floored integer. Probabilities sum to 1 over the vocabulary per
    context (the interpolation's defining invariant — pinned in tests).

    Plan: one (w1,w2) keyed agg builds the bigram table; unigram
    totals, left-context fanouts N1+(w1,•), and continuation counts
    N1+(•,w2) are three aggregated-grain rollups of THAT table (no
    second corpus scan); the global N1+(•,•) broadcasts as one row.
    Vocabulary-sized keys throughout — the KenLM count-pass shape.
    """
    d = Catalog(spark, sf_dir).table("documents")
    tokd = d.select(_words().alias("t"))
    pairs = F.when(
        F.size(F.col("t")) >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    big = (
        tokd.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .persist()
    )
    left = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("fanout")
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("ncont"))
    tot = big.agg(F.count(F.lit(1)).alias("nbigrams"))
    kn = (
        "greatest(CAST(c12 AS DOUBLE) - 0.75D, 0D) / CAST(c1 AS DOUBLE)"
        " + 0.75D * CAST(fanout AS DOUBLE) / CAST(c1 AS DOUBLE)"
        "   * CAST(ncont AS DOUBLE) / CAST(nbigrams AS DOUBLE)"
    )
    return (
        big.join(left, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr(kn).alias("kn_prob"),
            F.expr(f"CAST(floor(({kn}) * 1000000000D) AS BIGINT)").alias(
                "kn_ppb"
            ),
        )
        .orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
        .limit(KN_TOP)
    )


TEXT_KNESER_NEY_BIGRAM_SQL = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
),
big AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM (
    SELECT UNNEST(list_transform(range(1, LEN(t)), i -> t[i])) AS w1,
           UNNEST(list_transform(range(1, LEN(t)), i -> t[i + 1])) AS w2
    FROM toks WHERE LEN(t) >= 2
  ) GROUP BY w1, w2
),
lft AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS fanout
  FROM big GROUP BY w1
),
cont AS (SELECT w2, COUNT(*) AS ncont FROM big GROUP BY w2),
tot AS (SELECT COUNT(*) AS nbigrams FROM big)
SELECT b.w1, b.w2, b.c12,
       GREATEST(CAST(b.c12 AS DOUBLE) - 0.75, 0.0) / CAST(l.c1 AS DOUBLE)
         + 0.75 * CAST(l.fanout AS DOUBLE) / CAST(l.c1 AS DOUBLE)
           * CAST(c.ncont AS DOUBLE) / CAST(t.nbigrams AS DOUBLE) AS kn_prob,
       CAST(FLOOR((GREATEST(CAST(b.c12 AS DOUBLE) - 0.75, 0.0)
                     / CAST(l.c1 AS DOUBLE)
                   + 0.75 * CAST(l.fanout AS DOUBLE) / CAST(l.c1 AS DOUBLE)
                     * CAST(c.ncont AS DOUBLE) / CAST(t.nbigrams AS DOUBLE))
                  * 1000000000) AS BIGINT) AS kn_ppb
FROM big b JOIN lft l USING (w1) JOIN cont c USING (w2) CROSS JOIN tot t
ORDER BY b.c12 DESC, b.w1 ASC, b.w2 ASC
LIMIT {KN_TOP}
"""


# Sequenced gate variant (large-SF gates only; the driver keeps the
# one-shot string above). On the 1M-bigram sf1-Zipf vocabulary DuckDB's
# join-order optimizer pairs the two keyless aggregates first —
# lft × cont is an 8.8-BILLION-row cross product (reproduced solo:
# 70+ GB spill, disk death; big ⋈ lft alone runs in 1.3 s). The steps
# materialize `big` once and force one equi-join per statement, so no
# plan shape can cross the aggregates. Same expressions, same ORDER BY,
# same LIMIT; parity pinned by
# tests/test_round8_ops.py::test_kn_gate_oracle_parity.
TEXT_KNESER_NEY_BIGRAM_SQL_STEPS = [
    """CREATE OR REPLACE TEMP TABLE _gate_kn_big AS
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
)
SELECT w1, w2, COUNT(*) AS c12 FROM (
  SELECT UNNEST(list_transform(range(1, LEN(t)), i -> t[i])) AS w1,
         UNNEST(list_transform(range(1, LEN(t)), i -> t[i + 1])) AS w2
  FROM toks WHERE LEN(t) >= 2
) GROUP BY w1, w2""",
    """CREATE OR REPLACE TEMP TABLE _gate_kn_joined AS
SELECT b.w1, b.w2, b.c12, l.c1, l.fanout
FROM _gate_kn_big b
JOIN (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS fanout
      FROM _gate_kn_big GROUP BY w1) l USING (w1)""",
    f"""
WITH cont AS (SELECT w2, COUNT(*) AS ncont FROM _gate_kn_big GROUP BY w2),
tot AS (SELECT COUNT(*) AS nbigrams FROM _gate_kn_big)
SELECT b.w1, b.w2, b.c12,
       GREATEST(CAST(b.c12 AS DOUBLE) - 0.75, 0.0) / CAST(b.c1 AS DOUBLE)
         + 0.75 * CAST(b.fanout AS DOUBLE) / CAST(b.c1 AS DOUBLE)
           * CAST(c.ncont AS DOUBLE) / CAST(t.nbigrams AS DOUBLE) AS kn_prob,
       CAST(FLOOR((GREATEST(CAST(b.c12 AS DOUBLE) - 0.75, 0.0)
                     / CAST(b.c1 AS DOUBLE)
                   + 0.75 * CAST(b.fanout AS DOUBLE) / CAST(b.c1 AS DOUBLE)
                     * CAST(c.ncont AS DOUBLE) / CAST(t.nbigrams AS DOUBLE))
                  * 1000000000) AS BIGINT) AS kn_ppb
FROM _gate_kn_joined b JOIN cont c USING (w2) CROSS JOIN tot t
ORDER BY b.c12 DESC, b.w1 ASC, b.w2 ASC
LIMIT {KN_TOP}
""",
]


def corpus_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language source diversity as the inverse Simpson index —
    the "effective number of sources" (n²/Σc²) a language's documents
    actually draw from, the concentration metric curation dashboards
    track to catch a language silently collapsing onto one crawl
    domain. Unlike Shannon entropy this needs NO logarithm: the index
    is a ratio of integer sums, so the ppm output is exact (the
    transcendental-free diversity measure, same reason the Gini and
    Rényi-2 families pin cleanly).

    Plan: one (lang, source) agg, one lang rollup — both bounded by
    the label domains, zero corpus rescans.
    """
    d = Catalog(spark, sf_dir).table("documents")
    per = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy("lang")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count(F.lit(1)).alias("n_sources"),
            F.sum(F.col("c") * F.col("c")).alias("sumsq"),
        )
        .select(
            "lang",
            "n_docs",
            "n_sources",
            F.expr("n_docs * n_docs * 1000000L div sumsq").alias(
                "eff_sources_ppm"
            ),
        )
    )


CORPUS_SOURCE_DIVERSITY_SQL = """
WITH per AS (
  SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY lang, source
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       COUNT(*) AS n_sources,
       CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT) * 1000000
         // CAST(SUM(c * c) AS BIGINT) AS eff_sources_ppm
FROM per
GROUP BY lang
"""
