"""Deduplication operators over the ``documents`` table (SURVEY.md §2.4).

The standard dedup ladder, all expressed with built-in DataFrame ops
(whole-stage codegen; no Python in the hot path):

- exact              content-hash groupBy
- n-gram Jaccard     prefix-filtered (AllPairs/PPJoin) shingle self-join
- MinHash + LSH      signature → band → bucket-join candidate pairs
- SimHash            32-bit weighted-bit signature (near-dup banding ready)
- embedding cosine   hashed-BoW vectors, sign-pattern LSH blocking
- connected comps    transitive groups over the Jaccard edge set (iterative)

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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..functions.hashing import MERSENNE_P, md5_long
from ..functions.vectors import dot, norm

# MinHash configuration: 16 permutations in 4 bands of 4 rows. Band-match
# probability ~ 1-(1-j^4)^4 — the classic S-curve centered near j≈0.7.
NUM_PERMS = 16
BAND_SIZE = 4


def _shingles(docs: DataFrame, max_df: int | None = None) -> DataFrame:
    """Distinct word-bigram shingles per document.

    Word bigrams (not char n-grams) keep the shingle vocabulary large
    relative to the corpus so the inverted index discriminates; the
    ``array_distinct`` gives set semantics for Jaccard.

    ``max_df`` is the dense-corpus skew valve: drop shingles appearing in
    more than ``max_df`` documents BEFORE any pair generation. Stop-shingle
    removal is the standard mitigation when ultra-frequent n-grams
    ("of the") would otherwise fan the inverted index out quadratically —
    at 100 TB this single filter bounds the hottest join key. OFF by
    default because it changes Jaccard semantics (the oracle-checked
    queries compute the exact unfiltered measure); turn it on when recall
    on boilerplate-heavy corpora is worth trading for bounded skew.
    """
    # round-robin pre-split: the documents table is ONE parquet file at
    # bench SF, so without it the corpus-wide shingle explode (and the
    # md5 per shingle every consumer computes next) runs on a single
    # task — the one-file-scan lesson (ROADMAP), applied at the shared
    # root so every shingle consumer (Jaccard build, MinHash, spans,
    # incremental) parallelizes its fan-out stage
    width = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    w = (
        docs.repartition(width)
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
    )
    sh = w.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")
            )
        ).alias("shingle"),
    )
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle").select("doc_id", "shingle")
    return sh


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


JACCARD_THRESHOLD = 0.5


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-bigram Jaccard ≥ 0.5.

    AllPairs/PPJoin-style prefix filtering (Bayardo et al., WWW'07 — public
    algorithm): a pair with ``J ≥ t`` must share ≥ ⌈t·|A|⌉ shingles, so
    under a global canonical shingle order (document frequency asc, hash
    asc) it must share at least one shingle in each side's first
    ``|A| − ⌈t·|A|⌉ + 1`` shingles. Candidates therefore come from an
    equi-join on PREFIX shingles only; each candidate is verified exactly
    with a set intersection of the two docs' full shingle-hash arrays.

    Why this shape at 100 TB: the naive inverted-index join + per-pair
    count shuffles O(Σ df²) pair rows twice; here the only large dataset is
    the prefix-join output, which flows straight into per-row verification
    (full shingle arrays attached via keyed joins on doc_id) without
    re-keying the pair stream more than once per side. Frequency-ascending
    prefixes make hot shingles land in the *suffix*, which is exactly the
    skew mitigation a uniform corpus needs. ~4× fewer intermediate rows and
    one fewer 10⁷-row exchange at sf0.1.

    Admission-guarded (r8 verdict directive #2): the prefix join's exact
    fan-out Σ_h cnt_prefix(h)² is pre-flighted from the persisted prefix
    table (one vocab-sized agg) and an over-budget corpus refuses with
    ``ExactMeasureBoundError`` naming ``dedup_ngram_jaccard_capped``,
    instead of dying mid-shuffle. The guard is scoped to THIS entry (the
    registered exact measure): composite consumers of the shared pair
    build (connected components, the LSH quality eval) carry their own
    green large-SF evidence and keep the unguarded path — their refusal
    story is r10 work if a gate ever shows them over-budget first.

    Result is memoized per (application, sf_dir) as an eager checkpoint:
    three registry queries (this one + both connected-components entries)
    consume the identical pair set, and the similarity join dominates all
    three — one build, |dup pairs| rows retained."""
    return _verified_jaccard_pairs(spark, sf_dir, admission_guard=True)


# Document-frequency cap for the scale-safe capped variant. An ABSOLUTE
# cap (not a corpus fraction) is what bounds the inverted-index join at
# scale: with df ≤ c every shingle contributes ≤ c² candidate pairs, so
# Σdf² ≤ |shingles|·c² — LINEAR in corpus size. A fractional cap
# (df ≤ f·N) would leave Σdf² growing as N², which is the quadratic
# blow-up the cap exists to kill.
JACCARD_MAX_DF = 30

# Admission budget for the EXACT prefix-join measures (r8 verdict
# directive #2 — extend the winnowing Σ-fan-out pre-flight to the whole
# exact-measure family). The guarded quantity is the prefix/index join's
# raw match volume (Σ_h cnt_a(h)·cnt_b(h)) — the number of pair rows the
# shuffle must absorb BEFORE any verify filter, i.e. exactly what filled
# the host's disk in the unguarded r7 sf1 winnowing run. Since r10 the
# default is DERIVED from the host (free spill disk / available RAM —
# functions/admission.py; r9 verdict directive #6 replaced the tuned
# 2e9 constant); SPARK_GRAFT_EXACT_PAIR_BUDGET stays the absolute
# override shared by the whole exact-measure family.


def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-bigram Jaccard with the document-frequency
    skew valve ON (``_shingles(max_df=JACCARD_MAX_DF)``) — the plan that
    survives a boilerplate-heavy corpus at 100 TB.

    Semantics: shingles appearing in more than ``JACCARD_MAX_DF``
    documents are dropped BEFORE pair generation (standard stop-shingle
    mitigation), and Jaccard is computed over the CAPPED shingle sets.
    The oracle replays the identical cap, so the scale-safe plan is the
    oracle-checked one — the r3 verdict's "default-off valve" gap.

    Same AllPairs/PPJoin prefix-filter + exact-verify shape as
    ``dedup_ngram_jaccard``; the cap only shrinks the shingle table the
    prefix join is built from (one extra groupBy + semi-join, keyed on
    the shingle — no new skew surface).

    Fixture caveat (honest): the synthetic corpus draws from a FIXED
    ~40-word vocabulary, so every shingle's df grows linearly with
    corpus size and the absolute cap empties the index at sf0.1 (it
    binds meaningfully at the sf0.01 gate, where the hash check runs).
    A real corpus grows vocabulary with size (Heaps' law), keeping the
    sub-cap shingle mass roughly proportional — the absolute cap is
    still the right production form because it is what bounds
    Σdf² ≤ |shingles|·cap² linearly."""
    return _verified_jaccard_pairs(spark, sf_dir, max_df=JACCARD_MAX_DF)


# Checkpointed verified near-dup pairs, keyed per (application, sf_dir).
# Keyed on sparkContext.applicationId (stable for a session's lifetime),
# NOT id(spark) — CPython reuses ids after GC, which could hand a
# checkpointed DataFrame bound to a stopped SparkContext to a new session.
_PAIRS_CACHE: dict[tuple[str, str, int | None], DataFrame] = {}

# Corpus-adaptive prefix order (r6 verdict directive #2). The r6 2×2
# matrix proved the best global prefix order FLIPS with df skew:
# df-ascending wins 30–34% on the Zipfian fixture (head shingles never
# enter a prefix) but loses 9–19% on the saturated near-uniform fixture
# (every df equal → the df join-back is pure overhead). `order="auto"`
# turns the constant into a rule: build the df table (vocab-sized,
# map-side-combinable groupBy), probe max(df)/p99(df) with one tiny
# aggregate over it, and pick df-ascending iff the ratio crosses
# DF_SKEW_ORDER_RATIO. Measured ratios: sf0.01 → 1.10, sf0.1 → 1.04,
# Zipf fixture → 194 — two orders of magnitude of margin either side
# of the threshold. On a skewed corpus the probed df table is REUSED
# by the df path (zero waste); on a flat corpus the probe pays only
# the df groupBy, not the join-back that made hash order win.
DF_SKEW_ORDER_RATIO = 8
_ORDER_PROBE_CACHE: dict[tuple, str] = {}


def _prefix_order_sets(spark, sh, probe_key, order):
    """Build the doc → (globally-ordered shingle-hash array, size) table
    both pair builds share, resolving ``order="auto"`` via the df-skew
    probe. Returns ``(resolved_order, sets, df_tab)`` — ``df_tab`` is a
    persisted frame the CALLER must unpersist after materializing
    ``sets`` (None when the hash path ran or the probe was cached)."""
    df_tab = None
    if order == "auto":
        cached = _ORDER_PROBE_CACHE.get(probe_key)
        if cached is not None:
            order = cached
        else:
            df_tab = sh.groupBy("h").agg(F.count(F.lit(1)).alias("dfc")).persist()
            stats = df_tab.agg(
                F.max("dfc").alias("mx"),
                F.percentile_approx("dfc", F.lit(0.99), F.lit(10000)).alias("p99"),
            ).first()
            p99 = max(int(stats["p99"] or 1), 1)
            # mx is None on an EMPTY shingle table (every doc shorter
            # than the shingle width) — `None >= int` raises TypeError.
            # Default to hash order: there is nothing to skew (r7 ADVICE).
            mx = int(stats["mx"] or 0)
            order = "df" if mx >= DF_SKEW_ORDER_RATIO * p99 else "hash"
            _ORDER_PROBE_CACHE[probe_key] = order
            if order != "df":
                df_tab.unpersist()
                df_tab = None
    if order == "df":
        # df-ascending global order (canonical AllPairs/PPJoin): prefixes
        # carry the rarest shingles; (df, h) is a global total order so
        # the prefix + positional lemmas hold unchanged.
        tab = df_tab
        if tab is None:
            tab = sh.groupBy("h").agg(F.count(F.lit(1)).alias("dfc"))
        sets = (
            sh.join(tab, "h")
            .select("doc_id", F.struct("dfc", "h").alias("kh"))
            .groupBy("doc_id")
            .agg(
                F.expr("transform(sort_array(collect_list(kh)), x -> x.h)").alias(
                    "hs"
                ),
                F.count(F.lit(1)).alias("n"),
            )
            .persist()
        )
    else:
        sets = (
            sh.groupBy("doc_id")
            .agg(
                F.sort_array(F.collect_list("h")).alias("hs"),
                F.count(F.lit(1)).alias("n"),
            )
            .persist()
        )
    return order, sets, df_tab


def _verified_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_df: int | None = None,
    order: str = "auto",
    admission_guard: bool = False,
) -> DataFrame:
    # the guard never changes the RESULT, so it is not part of the memo
    # key — a cached frame (built by any consumer) serves guarded callers
    key = (spark.sparkContext.applicationId, sf_dir, max_df, order)
    cached = _PAIRS_CACHE.get(key)
    if cached is not None:
        return cached
    d = Catalog(spark, sf_dir).table("documents")
    # 64-bit xxhash64 shingle identity — PURELY INTERNAL key (the oracle
    # recomputes Jaccard from shingle STRINGS; results agree absent
    # 2^-64 collision events, the same exposure the previous 60-bit
    # md5-substring key carried). xxhash64 is ~1.6× faster than
    # md5+conv on the warm sets build (1.12 s → 0.70 s at sf0.1) and
    # this stage is the suite's heaviest shared line. Hashes that an
    # ORACLE replays in SQL (minhash perms, simhash, KMV) stay md5 —
    # DuckDB has no xxhash64.
    # Prefix order: "auto" since r7 — the df-skew probe picks
    # df-ascending on Zipfian corpora (30–34% faster, r6 matrix) and
    # hash order on flat ones (no wasted join-back); both orders are
    # proven row-identical (any fixed global total order satisfies the
    # prefix + positional lemmas). See _prefix_order_sets.
    sh = _shingles(d, max_df=max_df).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    # doc → (ordered shingle-hash set, set size): |docs| rows (~2 MB at
    # sf0.1) with bounded arrays. Persisted (MEMORY_AND_DISK) because FOUR
    # consumers read it — both prefix join sides and both verification
    # joins — and without the persist each consumer re-runs the whole
    # shingle aggregation (measured 20× slower). Unpersisted below once the
    # checkpoint materializes.
    resolved, sets, probe_tab = _prefix_order_sets(
        spark, sh, (spark.sparkContext.applicationId, sf_dir, max_df), order
    )
    # Eager materialization (scalar count, no driver data): the plan below
    # consumes `sets` from FOUR subtrees. A lazy persist is populated by
    # whichever stage runs first — and concurrently-scheduled stages that
    # all see an unfilled cache each recompute the full shingle aggregation
    # (measured: the one-job formulation ran ~35 s at sf0.1 vs ~15 s with
    # the two persists filled up front).
    sets.count()
    if probe_tab is not None:
        probe_tab.unpersist()
    # prefix length p = n - ceil(t·n) + 1; with t=0.5: floor(n/2)+1.
    # posexplode keeps the in-set position for the PPJoin positional filter.
    prefixes = sets.select(
        "doc_id",
        "n",
        F.posexplode(
            F.slice(
                "hs",
                F.lit(1),
                (F.col("n") - F.ceil(F.col("n") * F.lit(JACCARD_THRESHOLD)) + 1).cast(
                    "int"
                ),
            )
        ).alias("pos", "h"),
    )
    if admission_guard:
        # Pre-flight the EXACT measure (r8 verdict directive #2): the
        # prefix self-join's raw match volume is Σ_h cnt_prefix(h)² —
        # one vocab-sized agg over the (persisted-sets-derived) prefix
        # stream, vs filling local disk mid-shuffle when infeasible.
        from ..functions.admission import exact_pair_budget
        from .text import ExactMeasureBoundError

        budget = exact_pair_budget()
        s2 = (
            prefixes.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.expr("c * c")).alias("s2"))
            .first()["s2"]
            or 0
        )
        if s2 > budget:
            sets.unpersist()
            raise ExactMeasureBoundError(
                f"dedup_ngram_jaccard exact measure needs {s2:,} prefix-"
                f"join rows > budget {budget:,}; run the oracle-checked "
                "scale twin dedup_ngram_jaccard_capped instead, or raise "
                "SPARK_GRAFT_EXACT_PAIR_BUDGET on a host with the disk"
            )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    # PPJoin pruning BEFORE the candidate-distinct shuffle:
    # - length filter: J ≥ t forces t·|A| ≤ |B| ≤ |A|/t;
    # - positional filter: a match at (0-based) positions (pa, pb) bounds
    #   the overlap by min(na−pa, nb−pb), which must reach the equivalent
    #   overlap threshold α = ⌈t/(1+t)·(na+nb)⌉.
    # Together they halve candidate pairs on the fixture corpus (8.1M →
    # 3.8M at sf0.1) — pruning applied map-side, pre-shuffle.
    alpha = F.ceil(
        (F.col("a.n") + F.col("b.n"))
        * F.lit(JACCARD_THRESHOLD / (1 + JACCARD_THRESHOLD))
    )
    cand = (
        a.join(b, "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            (F.col("b.n") >= F.col("a.n") * JACCARD_THRESHOLD)
            & (F.col("b.n") <= F.col("a.n") / JACCARD_THRESHOLD)
        )
        .filter(
            F.least(
                F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
            )
            >= alpha
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()  # verify each candidate pair once
        # persisted: the verification below consumes the candidate set in a
        # multi-join plan, and re-deriving the prefix join + distinct inside
        # it measured ~10× the cost of the candidate build itself (26.9 s vs
        # 2.6 s at sf0.1). |pairs|×16-byte rows, MEMORY_AND_DISK — spills,
        # never OOMs, and is freed right after the checkpoint materializes.
        .persist()
    )
    cand.count()  # same eager-fill rationale as `sets` above
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("na")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("nb")
    )
    # Verification joins are PLAIN keyed joins on doc_id, deliberately not
    # broadcast: the doc→shingle-set table is corpus-sized, and a broadcast
    # must fit on the driver and every executor — fine at sf0.1 (~2 MB),
    # fatal at 100 TB. Shuffling the candidate stream by doc_a then doc_b
    # against the persisted sets is the scale-safe physical plan (AQE still
    # elects a broadcast on its own when the ACTUAL size is tiny).
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .localCheckpoint(eager=True)
    )
    sets.unpersist()
    cand.unpersist()
    _PAIRS_CACHE[key] = pairs
    # an "auto" build and an explicit call for the order it resolved to
    # are the same frame — share the checkpoint under both keys
    _PAIRS_CACHE[key[:3] + (resolved,)] = pairs
    return pairs


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


# Replays the df-cap exactly: shingles in > JACCARD_MAX_DF docs are
# dropped before pair generation and Jaccard runs over the capped sets —
# the oracle checks the scale-safe plan, not the unfiltered measure.
DEDUP_NGRAM_JACCARD_CAPPED_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w)-1),
                                 i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
keep AS (
  SELECT shingle FROM sh0 GROUP BY shingle
  HAVING COUNT(*) <= {JACCARD_MAX_DF}
),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
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


def _minhash_bands(d: DataFrame) -> DataFrame:
    """(doc_id, band, sig) MinHash band signatures for a document set.

    One aggregation with NUM_PERMS MIN columns (not a 16× row fan-out):
    the shuffle moves |shingle| rows once, keyed by doc_id, and map-side
    partial MINs compress it to |docs| rows per partition; the band
    unpivot is a map-side stack."""
    sh = _shingles(d).withColumn("h", md5_long("shingle"))
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(2 * i + 1) * F.col("h") + F.lit(104729 * i + 12345)) % MERSENNE_P)
            .alias(f"mh{i}")
            for i in range(NUM_PERMS)
        ]
    )
    band_cols = [
        F.concat_ws(
            ",", *[F.col(f"mh{i}").cast("string") for i in range(b0, b0 + BAND_SIZE)]
        ).alias(f"band{b0 // BAND_SIZE}")
        for b0 in range(0, NUM_PERMS, BAND_SIZE)
    ]
    sigs = mins.select("doc_id", *band_cols)
    stack_args = ", ".join(f"{i}, band{i}" for i in range(NUM_PERMS // BAND_SIZE))
    return sigs.selectExpr(
        "doc_id",
        f"stack({NUM_PERMS // BAND_SIZE}, {stack_args}) AS (band, sig)",
    )


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
    bands = _minhash_bands(d)
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
    path, same shape as MinHash-LSH.

    Physical form: ONE per-row expression (higher-order fold over the word
    array carrying 32 accumulators) — a pure map with no explode and no
    shuffle, so at 100 TB this is scan-bound. An earlier explode-32-bits
    formulation shuffled |words|×32 rows and was ~40× slower at sf0.1."""
    # r11: parallel scan — the per-word md5 fold is pure scan-side
    # compute, and the single-row-group fixture files make that ONE
    # task without it (see Catalog.table_parallel; no-op at scale)
    d = Catalog(spark, sf_dir).table_parallel("documents")
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
    return d.select("doc_id", simhash.alias("simhash"))


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


# Embedding-cosine near-dup: hashed bag-of-words featurization (the
# container has no embedding model, so the "embedding" is a deterministic
# 16-dim signed-hash projection — the standard hashing trick — computable
# bit-identically in any engine).
EMB_DIM = 16
COSINE_DUP_THRESHOLD = 0.97


def _bow_vectors(docs: DataFrame) -> DataFrame:
    """doc_id → 16-dim signed hashed-BoW vector (the hashing trick).

    Per word: 60-bit md5 value h; dimension h % 16; sign from bit 4.

    Physical form: explode words → ONE hash aggregate with 16 conditional
    sums — md5 computed once per word, everything whole-stage-codegen'd,
    map-side partial aggregation collapses the shuffle to |docs| rows.
    (An earlier per-row higher-order-function fold was 10× slower at
    sf0.1: HOFs are interpreted and the array accumulator allocated a new
    16-element array per word.) Sums of ±1.0 are exact integers in double,
    so aggregation order cannot change the result."""
    h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    hw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).select("doc_id", h.alias("h"))
    sign = F.when(F.expr("(h >> 4) % 2") == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
    sums = [
        F.sum(
            F.when(F.col("h") % EMB_DIM == d, sign).otherwise(F.lit(0.0))
        ).alias(f"v{d}")
        for d in range(EMB_DIM)
    ]
    return (
        hw.groupBy("doc_id")
        .agg(*sums)
        .select(
            "doc_id", F.array(*[f"v{d}" for d in range(EMB_DIM)]).alias("v")
        )
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup groups: (member doc, canonical doc, degree).

    Blocking key = the vector's 16-bit sign pattern (a 1-plane-per-dim LSH:
    near-identical docs almost always agree on every component sign), so
    candidate pairs come from an equi-join on `bucket` — never O(n²). Exact
    cosine ≥ 0.97 verifies each candidate; each dup-pair member is assigned
    the least doc_id among itself and its partners (star dedup — the
    single-pass approximation of connected components; the iterative
    large-star/small-star rounds are the documented scale-up when chains
    matter). Zero-vector docs are excluded before pairing (cosine
    undefined; also dodges Spark's NaN-comparison semantics, which differ
    from IEEE in predicates).

    The registry entry runs with the bucket valve OFF (exact oracle
    semantics); production corpora with lumpy sign distributions cap
    per-bucket population via ``_embedding_cosine_dups(max_bucket=...)``
    — the blocking-side twin of ``_shingles(max_df=...)``."""
    return _embedding_cosine_dups(spark, sf_dir)


def _embedding_cosine_dups(
    spark: SparkSession, sf_dir: str, max_bucket: int | None = None
) -> DataFrame:
    """Parameterized core of ``dedup_embedding_cosine``.

    ``max_bucket`` is the skew valve: the within-bucket join is
    O(bucket²), so ONE pathological sign pattern (boilerplate corpora,
    near-constant embeddings) can go quadratic at 100 TB. With the cap,
    buckets over ``max_bucket`` members are excluded from pair generation
    BEFORE the self-join — bounded cost (≤ max_bucket² per bucket) for a
    documented recall trade, exactly like dropping ultra-frequent shingles
    with ``_shingles(max_df=...)``. OFF by default because it changes
    result semantics (the oracle computes the uncapped measure)."""
    d = Catalog(spark, sf_dir).table("documents")
    vec = _bow_vectors(d)
    bucketed = (
        vec.withColumn(
            "bucket",
            F.expr(
                f"aggregate(sequence(0, {EMB_DIM - 1}), 0,"
                " (acc, i) -> acc + IF(v[i] > CAST(0.0 AS DOUBLE),"
                " shiftleft(1, i), 0))"
            ),
        )
        .withColumn("nrm", norm(F.col("v")))
        .filter(F.col("nrm") > 0)
    )
    if max_bucket is not None:
        keep = (
            bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") <= max_bucket)
            .select("bucket")
        )
        bucketed = bucketed.join(keep, "bucket")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "cos", dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
        )
        .filter(F.col("cos") >= COSINE_DUP_THRESHOLD)
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("nb"))
    )
    edges = pairs.union(
        pairs.select(F.col("nb").alias("doc_id"), F.col("doc_id").alias("nb"))
    )
    return edges.groupBy("doc_id").agg(
        F.least(F.min("nb"), F.col("doc_id").cast("long")).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


DEDUP_EMBEDDING_COSINE_SQL = f"""
WITH w AS (
  SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
),
comp AS (
  SELECT doc_id, h % {EMB_DIM} AS d,
         SUM(CASE WHEN (h >> 4) % 2 = 1 THEN 1.0 ELSE -1.0 END)::DOUBLE AS val
  FROM w GROUP BY 1, 2
),
grid AS (
  SELECT doc_id, d
  FROM (SELECT DISTINCT doc_id FROM documents)
  CROSS JOIN generate_series(0, {EMB_DIM - 1}) t(d)
),
vec AS (
  SELECT g.doc_id, list(COALESCE(c.val, 0.0)::DOUBLE ORDER BY g.d) AS v
  FROM grid g LEFT JOIN comp c ON c.doc_id = g.doc_id AND c.d = g.d
  GROUP BY g.doc_id
),
bucketed AS (
  SELECT doc_id, v,
         list_reduce(list_prepend(0, list_transform(generate_series(1, {EMB_DIM}),
             i -> CASE WHEN v[i] > 0.0 THEN (1 << (i - 1)) ELSE 0 END)),
           (a, b) -> a + b) AS bucket,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(generate_series(1, {EMB_DIM}), i -> v[i] * v[i])),
           (a, b) -> a + b)) AS nrm
  FROM vec
),
pairs AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS nb
  FROM (SELECT * FROM bucketed WHERE nrm > 0) a
  JOIN (SELECT * FROM bucketed WHERE nrm > 0) b
    ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(generate_series(1, {EMB_DIM}), i -> a.v[i] * b.v[i])),
          (x, y) -> x + y) / (a.nrm * b.nrm) >= {COSINE_DUP_THRESHOLD}
),
edges AS (
  SELECT doc_id, nb FROM pairs
  UNION ALL
  SELECT nb AS doc_id, doc_id AS nb FROM pairs
)
SELECT doc_id,
       LEAST(MIN(nb), doc_id) AS canonical_id,
       COUNT(*) AS n_dups
FROM edges
GROUP BY doc_id
"""


MAX_CC_ITERATIONS = 50


def _jaccard_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric, distinct (doc_a, doc_b) edges at J ≥ 0.5.

    Builds on the memoized verified-pair checkpoint (_PAIRS_CACHE), so
    the expensive similarity join runs once per (application, sf_dir) no
    matter how many of the three consuming queries execute; symmetrizing
    |dup pairs| checkpointed rows is noise."""
    pairs = _verified_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return (
        pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .distinct()
    )


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup groups: connected components over the n-gram
    Jaccard ≥ 0.5 edge set, by iterative min-label propagation.

    Star dedup (dedup_embedding_cosine) mislabels chains (A~B~C with
    A≁C); components give every doc the least doc_id of its full group —
    the correct canonical for chained near-dups. The loop is Spark's
    standard iterative-algorithm shape: labels ⟕ edges → min per node,
    repeat until a no-change fixpoint (≤ diameter rounds; the
    large-star/small-star variant cuts that to O(log n) rounds at
    billion-edge scale). Each round eagerly ``localCheckpoint``s its
    frontier: checkpointing TRUNCATES LINEAGE, which is load-bearing —
    a persist/unpersist round cycle was measured 4× slower because every
    unpersisted intermediate stays in the downstream plan and recomputes
    the whole history once its blocks are dropped. Frontier blocks are
    label tables (bytes per dup-pair member), so the retained footprint
    is negligible. The driver touches only the convergence scalar, never
    data.

    Oracle: exact, via a DuckDB recursive CTE computing reachability and
    aggregating min/count outside the recursion.

    The loop runs at a reduced shuffle-partition count (restored after):
    the frontier is |dup-pair members| rows — orders of magnitude smaller
    than the corpus that produced the edges — and each round is 2
    sequential jobs, so per-partition scheduling overhead dominates at
    full width. Like the streaming state knob, frontier partitioning
    follows FRONTIER volume, not core count."""
    edges = _jaccard_edges(spark, sf_dir)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _label_propagation(spark, edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _label_propagation(spark: SparkSession, edges: DataFrame) -> DataFrame:
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint(eager=True)
    )

    for _ in range(MAX_CC_ITERATIONS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_a, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter(F.col("changed")).count()  # convergence scalar
        labels = updated.select("doc_id", "label")
        if n_changed == 0:
            break

    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("component_id"),
        F.col("n_members").cast("int").alias("n_reachable"),
    )


DEDUP_CONNECTED_COMPONENTS_SQL = """
WITH RECURSIVE
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
edges AS (
  SELECT doc_a AS s, doc_b AS t FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(doc, r) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.doc = e.t
)
SELECT doc AS doc_id, MIN(r) AS component_id, CAST(COUNT(*) AS INT) AS n_reachable
FROM reach GROUP BY doc
"""


def dedup_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond" —
    public algorithm): same output contract as
    ``dedup_connected_components`` (shared oracle), different round
    complexity — O(log² n) rounds on ANY graph vs O(diameter) for plain
    label propagation, which is what matters when near-dup chains are
    long (crawl mirrors, template families).

    large-star: every node points its LARGER neighbors at its current
    minimum; small-star: re-points the smaller-or-equal ones. Both are one
    groupBy + one keyed re-emit — two shuffles per round, no driver data.
    Fixpoint when a round leaves the edge multiset unchanged; the final
    graph is a star per component centered on its minimum doc_id."""
    edges = _jaccard_edges(spark, sf_dir).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _star_contraction(spark, edges)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _sym(e: DataFrame) -> DataFrame:
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    m = edges.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("m")
    )
    side = edges.filter(F.col("v") > F.col("u")) if large else edges.filter(
        F.col("v") <= F.col("u")
    )
    emitted = side.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    if not large:
        # small-star also links u ITSELF to its minimum (the paper's
        # N(u) ∪ {u} term) — without it a two-node component's only edge
        # degenerates to a self-loop and the component vanishes
        emitted = emitted.union(m.select(F.col("u"), F.col("m").alias("v")))
    return _sym(emitted)


def _edge_signature(e: DataFrame):
    """(count, xxhash64 sum) of an edge set — one narrow aggregate job
    (map-side partials, scalar reduce; no data-row shuffle)."""
    row = e.select(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: a long sum of 64-bit hashes overflows under
        # ANSI mode; decimal(38,0) holds ~1e19 such terms exactly
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("sig"),
    ).first()
    return row["n"], row["sig"]


def _star_contraction(spark: SparkSession, edges: DataFrame) -> DataFrame:
    # Convergence probe: per round compare a cheap set signature
    # (count + order-insensitive hash sum) instead of a full exceptAll —
    # the exceptAll probe cost an extra full shuffle EVERY round. The
    # signature only matches near the fixpoint, so the deterministic
    # exceptAll confirm below runs ~once per query, not per round.
    sig = _edge_signature(edges)
    for _ in range(MAX_CC_ITERATIONS):
        after = _star_round(_star_round(edges, large=True), large=False)
        after = after.localCheckpoint(eager=True)
        after_sig = _edge_signature(after)
        same = after_sig == sig and (
            after.exceptAll(edges).limit(1).count() == 0
        )
        edges, sig = after, after_sig
        if same:
            break

    # converged: each component is a star around its min; label(u) =
    # min(neighbors ∪ u)
    labels = edges.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("label")
    )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return labels.join(sizes, "label").select(
        F.col("u").alias("doc_id"),
        F.col("label").alias("component_id"),
        F.col("n_members").cast("int").alias("n_reachable"),
    )


# Edit-distance near-dup parameters: block on (lang, first EDIT_BLOCK_CHARS
# chars), verify on the first EDIT_PREFIX_CHARS chars, keep distance ≤ MAX.
EDIT_BLOCK_CHARS = 8
EDIT_PREFIX_CHARS = 64
EDIT_MAX_DISTANCE = 8


def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup pairs (§2.4 near-dup, character-level): the
    edit-distance complement of the token-level Jaccard/MinHash family —
    catches single-character mutations that shift every word bigram.

    Blocked self-join: candidates must share (lang, first 8 chars), then
    the verifier computes levenshtein over the first 64 chars JVM-side
    (built-in ``F.levenshtein`` — identical DP semantics to DuckDB's
    ``levenshtein``, integer-exact). Scale: the block key bounds each
    bucket (prefix diversity grows with corpus size); a skewed block
    (boilerplate prefixes) gets the same max-df valve as ``_shingles`` —
    count block sizes first and drop blocks above the cap before pairing.
    No broadcast: both sides shuffle on the block key.

    Reference parity: the reference has no near-dup surface; this extends
    the §2.4 charter family (SURVEY §2.4)."""
    d = Catalog(spark, sf_dir).table("documents")
    side = d.select(
        "doc_id",
        "lang",
        F.substring("text", 1, EDIT_BLOCK_CHARS).alias("blk"),
        F.substring("text", 1, EDIT_PREFIX_CHARS).alias("pfx"),
    )
    a = side.alias("a")
    b = side.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.lang") == F.col("b.lang"),
            F.col("a.blk") == F.col("b.blk"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        ],
    )
    # r11 (guide §1.2 per-task work): the bounded form — Spark's
    # levenshtein(l, r, threshold) runs the banded DP (O(len·k) cells,
    # early exit) and returns -1 past the bound, vs the full O(len²)
    # table. For every kept row (distance ≤ EDIT_MAX_DISTANCE) the
    # banded DP returns the exact distance, so `dist >= 0` selects the
    # identical pair set with identical values as `dist <= max` did.
    dist = F.levenshtein(F.col("a.pfx"), F.col("b.pfx"), EDIT_MAX_DISTANCE)
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("int").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
    )


DEDUP_EDIT_DISTANCE_SQL = f"""
SELECT a.doc_id AS doc_a,
       b.doc_id AS doc_b,
       CAST(levenshtein(substr(a.text, 1, {EDIT_PREFIX_CHARS}),
                        substr(b.text, 1, {EDIT_PREFIX_CHARS})) AS INT)
         AS edit_distance
FROM documents a
JOIN documents b
  ON a.lang = b.lang
 AND substr(a.text, 1, {EDIT_BLOCK_CHARS}) = substr(b.text, 1, {EDIT_BLOCK_CHARS})
 AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, {EDIT_PREFIX_CHARS}),
                  substr(b.text, 1, {EDIT_PREFIX_CHARS})) <= {EDIT_MAX_DISTANCE}
"""


INCREMENTAL_BATCH_MOD = 10  # incoming batch = doc_id % 10 == 0


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup screen (§2.4): an incoming batch
    (every 10th doc, standing in for "today's crawl") is checked against
    the existing corpus by MinHash band collision — the gate that keeps
    near-dups of already-ingested content out WITHOUT re-deduplicating
    the whole corpus.

    This is the production shape for continuous ingestion: corpus band
    signatures are precomputed once and stored bucketed by (band, sig)
    at rest; each day's batch computes its own signatures (map-only over
    the batch) and probes with a keyed join where ONLY the batch side
    moves. Contrast dedup_minhash_lsh, which self-joins the full corpus —
    O(corpus) shuffle per run vs O(batch) here.

    Output: every batch doc with its distinct-corpus-collision count and
    the keep/drop verdict.
    """
    d = Catalog(spark, sf_dir).table("documents")
    bands = _minhash_bands(d)
    is_batch = F.col("doc_id") % INCREMENTAL_BATCH_MOD == 0
    batch_bands = bands.filter(is_batch)
    corpus_bands = bands.filter(~is_batch)
    hits = (
        batch_bands.alias("q")
        .join(corpus_bands.alias("c"), ["band", "sig"])
        .select(F.col("q.doc_id").alias("doc_id"), F.col("c.doc_id").alias("corpus_id"))
        .groupBy("doc_id")
        .agg(F.countDistinct("corpus_id").alias("n_corpus_matches"))
    )
    return (
        d.filter(is_batch)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_corpus_matches"), F.lit(0))
            .cast("int")
            .alias("n_corpus_matches"),
            (F.coalesce(F.col("n_corpus_matches"), F.lit(0)) == 0).alias("keep"),
        )
    )


DEDUP_INCREMENTAL_SQL = f"""
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
),
hits AS (
  SELECT q.doc_id, COUNT(DISTINCT c.doc_id) AS n_corpus_matches
  FROM bands q
  JOIN bands c ON q.band = c.band AND q.sig = c.sig
  WHERE q.doc_id % {INCREMENTAL_BATCH_MOD} = 0
    AND c.doc_id % {INCREMENTAL_BATCH_MOD} != 0
  GROUP BY q.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_corpus_matches, 0) AS INT) AS n_corpus_matches,
       COALESCE(h.n_corpus_matches, 0) = 0 AS keep
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {INCREMENTAL_BATCH_MOD} = 0
"""


HAMMING_MAX = 3  # ≤3 bit flips: 4-byte banding then has an intact band (pigeonhole)

# Checkpointed verified Hamming-≤3 pair stream, keyed per
# (application, sf_dir) — the _PAIRS_CACHE discipline applied to the
# SimHash family (r10 verdict directive #1). THREE registry entries
# consume substantially the same 78.8 M-pair result at sf1-Zipf
# (dedup_simhash_hamming, its content-hash adjudicator, and the
# quality eval's candidate side); before this memo each re-derived the
# full banding join (~943 s of the 3,111 s sf1-Zipf Spark-side bar).
# One build, one eager localCheckpoint, three readers.
_SIMHASH_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _verified_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized verified SimHash pair stream: (doc_a, doc_b, hamming)
    with hamming ≤ HAMMING_MAX, doc_a < doc_b, pairs DISTINCT by
    construction (the candidate build dedups before the radius filter,
    so consumers may drop their own .distinct() and ride this one).

    Plan: banding explode is map-side ×4; the candidate join is keyed
    by (band, byte value) — 1024 distinct keys whose sizes are the
    collision classes; verification is row-local bit_count(XOR). The
    checkpoint stores |pairs|×24-byte rows (~1.9 GB at sf1-Zipf's
    78.8 M pairs) on executor storage — never the driver.

    r11 build rework (guide §2.4 remove shuffles outright): the former
    cross-band dedup was a ``.distinct()`` — one full Exchange + two
    HashAggregates over the 100 M+-row candidate stream. But which
    OTHER bands also match is row-locally computable from the two
    signatures already on the row: band b is intact iff
    ((sig_a XOR sig_b) >> 8b) & 255 = 0. Keeping a candidate only when
    its join band is the SMALLEST intact band emits every pair exactly
    once (pigeonhole guarantees ≥1 intact band for every true pair, so
    nothing is lost) with zero wide shuffle — the join's own 1024-key
    exchange is the only one left. The probe side is also the
    parallel documents scan now (Catalog.table_parallel): before r11
    the broadcast-join probe ran on the single-row-group scan's ONE
    task, serializing the entire pair production.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SIMHASH_PAIRS_CACHE.get(key)
    if cached is not None:
        return cached
    # persist: the signature build (tokenize + per-word md5 + fold over
    # the whole corpus) feeds BOTH sides of the self-join; without it
    # Spark computes the subtree twice (measured 2× at sf0.1).
    # Unpersisted once the checkpoint materializes.
    sigs = dedup_simhash(spark, sf_dir).persist()
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * i)
                        .bitwiseAND(255)
                        .alias("byte"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.byte").alias("byte"))
    a = bands.alias("a")
    b = bands.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    # smallest intact band of the pair: row-locally computable from the
    # two signatures already on the row (band i intact ⟺ byte i of the
    # XOR is zero). The join band is intact by construction, so this
    # CASE always hits one of its arms for a joined row.
    min_intact = F.when(xor.bitwiseAND(F.lit(255)) == 0, F.lit(0))
    for i in range(1, 4):
        min_intact = min_intact.when(
            F.shiftright(xor, 8 * i).bitwiseAND(F.lit(255)) == 0, F.lit(i)
        )
    cand = (
        a.join(b, ["band", "byte"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        # emit each pair from its SMALLEST intact band only: exactly-once
        # without the former 100 M+-row .distinct() Exchange
        .filter(F.col("band") == min_intact)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(xor).alias("hamming"),
        )
    )
    pairs = (
        cand.filter(F.col("hamming") <= HAMMING_MAX)
        .localCheckpoint(eager=True)
    )
    sigs.unpersist()
    _SIMHASH_PAIRS_CACHE[key] = pairs
    return pairs


def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS within Hamming distance ≤ 3 — the banded
    scale path the signature operator (dedup_simhash) documents: split
    the 32-bit signature into 4 bytes; any pair within 3 bit flips has
    ≥ 1 intact byte (pigeonhole), so candidates come from an equi-join
    on (band, byte) — LOSSLESS for the ≤3 radius, never all-pairs — and
    each candidate is verified with one bit_count(XOR).

    Since r11 the verified pair stream is the memoized per-(application,
    sf_dir) checkpoint `_verified_simhash_pairs` shared with the
    content-hash adjudicator and the quality eval — see that function
    for the physical plan. The oracle states the equivalent semantic
    form directly (all pairs at Hamming ≤ 3 — equal BY the pigeonhole
    guarantee, which this query therefore pins).
    """
    return _verified_simhash_pairs(spark, sf_dir)


DEDUP_SIMHASH_HAMMING_SQL = f"""
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
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
"""


def dedup_simhash_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine CONTENT adjudication of the output-explosive simhash
    pair set (r8 verdict directive #4): the order-insensitive 60-bit
    row-hash aggregate of dedup_simhash_hamming, computed distributively
    on BOTH engines — no row ever reaches a driver, so the 62.5 M-row
    sf1-Zipf result that previously degraded to count parity is now
    adjudicated by content (n_rows + exact integer SUM + BIT_XOR of
    canonical row hashes; see functions/content_hash.py for the
    canonicalization and its driver-verdict parity pins).

    Plan: since r11 the pair stream is the memoized per-(application,
    sf_dir) checkpoint `_verified_simhash_pairs` — adjudication costs
    one map-side md5 projection and ONE 1-row aggregate over rows the
    engine already materialized, instead of re-deriving the full
    banding join (measured 250.6 s of re-derivation at sf1-Zipf)."""
    from ..functions.content_hash import content_fingerprint

    return content_fingerprint(_verified_simhash_pairs(spark, sf_dir))


def _dedup_simhash_content_hash_sql() -> str:
    from ..functions.content_hash import content_fingerprint_sql

    return content_fingerprint_sql(
        DEDUP_SIMHASH_HAMMING_SQL,
        [("doc_a", "BIGINT"), ("doc_b", "BIGINT"), ("hamming", "BIGINT")],
    )


DEDUP_SIMHASH_CONTENT_HASH_SQL = _dedup_simhash_content_hash_sql()


def dedup_lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit (§2.4 dedup meta-tooling): precision and
    recall of the MinHash-LSH candidate generator against the EXACT
    Jaccard ≥ 0.5 pair set — the evaluation every production dedup
    deployment runs before trusting a banding configuration, expressed
    as a query over the engine's own operators.

    Candidates come from the band equi-join (dedup_minhash_lsh);
    ground truth is the memoized verified pair set (the expensive exact
    build, shared with the Jaccard/CC/PageRank queries). Both sides are
    canonical (doc_a < doc_b) pair sets, so precision/recall reduce to
    two keyed anti/semi joins and exact integer counts; the ratios pin
    as one division each.
    """
    cand = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    truth = _verified_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    hit = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    # three scalar counts folded through ONE tagged union + conditional
    # agg — no 1-row joins (dedup.py carries a no-broadcast-hint pin, and
    # an unhinted 1-row join degenerates to a cartesian node)
    tagged = (
        cand.select(F.lit("cand").alias("k"))
        .unionAll(truth.select(F.lit("truth").alias("k")))
        .unionAll(hit.select(F.lit("hit").alias("k")))
    )
    counts = tagged.groupBy().agg(
        F.sum((F.col("k") == "cand").cast("long")).alias("n_candidates"),
        F.sum((F.col("k") == "truth").cast("long")).alias("n_true_pairs"),
        F.sum((F.col("k") == "hit").cast("long")).alias("n_hits"),
    )

    def ratio(num: str, den: str) -> F.Column:
        return (
            (F.col(num).cast("double") / F.col(den))
            .cast("decimal(18,6)")
            .cast("double")
        )

    return counts.select(
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        ratio("n_hits", "n_candidates").alias("precision"),
        ratio("n_hits", "n_true_pairs").alias("recall"),
    )


# Oracle: candidate CTE = DEDUP_MINHASH_LSH_SQL's band join; truth CTE =
# DEDUP_NGRAM_JACCARD_SQL's exact pairs; scalar subqueries count the
# overlap. The string is assembled from the fragments below so the
# SEQUENCED gate variant (DEDUP_LSH_QUALITY_EVAL_SQL_STEPS) is equal to
# the one-shot oracle BY CONSTRUCTION: the r7 sf1 gate showed that
# running the quadratic truth build and the minhash pipeline as ONE
# DuckDB query spills both pipelines' state concurrently and fills the
# host disk, while each half alone fits the budget (dedup_ngram_jaccard
# green at sf1 in 383 s; dedup_minhash_lsh green). The steps run the
# halves sequentially into temp tables — peak spill is one pipeline's.
_LSH_EVAL_SH_CTES = """w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w)-1),
                                 i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
)"""

_LSH_EVAL_CAND_CTES = """h AS (
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
bands AS MATERIALIZED (
  SELECT doc_id, perm // 4 AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm) AS sig
  FROM mh GROUP BY 1, 2
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""

_LSH_EVAL_TRUTH_CTES = """sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
)"""

_LSH_EVAL_SELECT = """SELECT (SELECT COUNT(*) FROM cand)  AS n_candidates,
       (SELECT COUNT(*) FROM truth) AS n_true_pairs,
       (SELECT COUNT(*) FROM hit)   AS n_hits,
       CAST(CAST((SELECT COUNT(*) FROM hit)::DOUBLE
                 / (SELECT COUNT(*) FROM cand) AS DECIMAL(18,6)) AS DOUBLE)
         AS precision,
       CAST(CAST((SELECT COUNT(*) FROM hit)::DOUBLE
                 / (SELECT COUNT(*) FROM truth) AS DECIMAL(18,6)) AS DOUBLE)
         AS recall"""

DEDUP_LSH_QUALITY_EVAL_SQL = f"""
WITH {_LSH_EVAL_SH_CTES},
{_LSH_EVAL_CAND_CTES},
{_LSH_EVAL_TRUTH_CTES},
hit AS MATERIALIZED (SELECT doc_a, doc_b FROM cand INTERSECT SELECT doc_a, doc_b FROM truth)
{_LSH_EVAL_SELECT}
"""

# Sequenced gate variant (r7 verdict directive #3): same fragments, two
# CREATE TEMP TABLE steps then the identical final SELECT reading them.
# tools/check_queries.py runs this under SPARK_GRAFT_ORACLE_SEQ=1 (the
# sharded large-SF gate); the driver's sf0.01 gate still gets the
# one-shot string above. Equality is pinned by
# tests/test_round8_ops.py::test_lsh_eval_sequenced_oracle_equals_oneshot.
DEDUP_LSH_QUALITY_EVAL_SQL_STEPS = [
    "CREATE OR REPLACE TEMP TABLE _gate_lsh_cand AS WITH "
    + _LSH_EVAL_SH_CTES
    + ",\n"
    + _LSH_EVAL_CAND_CTES
    + "\nSELECT doc_a, doc_b FROM cand",
    "CREATE OR REPLACE TEMP TABLE _gate_lsh_truth AS WITH "
    + _LSH_EVAL_SH_CTES
    + ",\n"
    + _LSH_EVAL_TRUTH_CTES
    + "\nSELECT doc_a, doc_b FROM truth",
    """WITH cand AS (SELECT * FROM _gate_lsh_cand),
truth AS (SELECT * FROM _gate_lsh_truth),
hit AS (SELECT doc_a, doc_b FROM cand INTERSECT SELECT doc_a, doc_b FROM truth)
"""
    + _LSH_EVAL_SELECT,
]


# ─── Containment (near-superset) detection ─────────────────────────────────

# C(A→B) = |A∩B| / |A| ≥ 4/5, tested as 5·|A∩B| ≥ 4·|A| — pure integer
# comparison, no float threshold to disagree on.
CONTAIN_NUM = 4
CONTAIN_DEN = 5


def corpus_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-superset detection (§2.4 dedup family): ordered
    pairs (A→B) where the CONTAINMENT |A∩B|/|A| ≥ 4/5 — the measure
    Jaccard dedup is blind to. A quote-heavy aggregator page B that
    swallows a short article A has J(A,B) ≈ |A|/|B| (tiny, never trips a
    Jaccard gate) but C(A→B) ≈ 1. Standard corpus-curation use: drop the
    contained doc, keep the superset — the complement of the J ≥ 0.5
    near-dup pass.

    Plan: one inverted-index equi-join on the 60-bit shingle hash (8-byte
    wire keys — the md5_long60 discipline) → per-ordered-pair
    intersection counts in ONE map-side-combining agg → set sizes attach
    via two keyed joins → integer threshold filter. No broadcast, no
    driver data. At 100 TB the hot-shingle skew valve is
    ``_shingles(max_df=…)`` (stop-shingle removal BEFORE the index join
    bounds the hottest key); the PPJoin prefix trick does not apply to
    containment's A-side-only denominator, so df-capping IS the scale
    lever — same tradeoff as the Jaccard build, documented there. The
    valve is oracle-checked in :func:`corpus_containment_capped`."""
    return _containment_pairs(spark, sf_dir, max_df=None)


def corpus_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment detection with the document-frequency skew valve ON
    (``_shingles(max_df=JACCARD_MAX_DF)``) — the plan to run at 100 TB.

    Semantics: shingles appearing in more than ``JACCARD_MAX_DF``
    documents are dropped BEFORE the inverted-index join, and
    containment C(A→B) = |A∩B|/|A| is computed over the CAPPED shingle
    sets (both numerator and denominator — size attaches post-cap, so
    the ratio stays a true containment of the filtered sets). The
    oracle replays the identical cap, so the scale-safe plan is the
    oracle-checked one — the last Σdf²-family member to get its capped
    twin (r4 verdict directive #1).

    Why this bounds the blow-up: the inverted-index self-join emits
    Σ_shingle df² pair rows; capping df ≤ c bounds that by
    |distinct shingles|·c² — linear in corpus size instead of quadratic
    on saturated keys. Same valve, same constant, same oracle pattern as
    :func:`dedup_ngram_jaccard_capped`."""
    return _containment_pairs(spark, sf_dir, max_df=JACCARD_MAX_DF)


# Memoized per (application, sf_dir, max_df, order) like _PAIRS_CACHE:
# three registry entries (exact, capped, cap-eval) consume these builds,
# and the cap-eval consumes BOTH — without the memo the suite runs the
# inverted-index build up to twice per variant (r6: ~9 s duplicate work
# per bench run). Output is pair-volume-sized; localCheckpoint truncates
# the lineage and frees the internal `sets` persist.
_CONTAIN_CACHE: dict[tuple, DataFrame] = {}


def _containment_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_df: int | None = None,
    order: str = "auto",
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, max_df, order)
    cached = _CONTAIN_CACHE.get(key)
    if cached is not None:
        return cached
    d = Catalog(spark, sf_dir).table("documents")
    # Asymmetric prefix filter (SSJoin overlap/containment variant —
    # exact, no recall loss): for C(A→B) = |A∩B|/|A| ≥ t, an A that
    # misses B on ALL of its first ⌊n_a·(1-t)⌋+1 shingles (any fixed
    # global total order; hash-ascending here) has |A∩B| ≤ ⌈t·n_a⌉-1 <
    # required. So the probe side joins only A-PREFIX postings against
    # B's full postings: fan-out drops from Σdf² to Σ df_prefix·df —
    # ~(1-t)× = 5× fewer index-join rows at t=4/5. Prefix ORDER
    # re-adjudicated in r6 on a Zipfian fixture (tools/skew_fixture.py
    # --variants, PLANS.md r6): df-ascending (the canonical AllPairs
    # order) wins 30% on the Zipf corpus (4.10 vs 5.84 s) because head
    # shingles never enter a prefix, and loses only ~9% on the
    # saturated near-uniform test fixture (5.93 vs 5.45 s) where every
    # df is equal and the df groupBy is pure overhead — since r7 the
    # default is the df-skew PROBE ("auto") that picks per corpus;
    # explicit order="df"/"hash" keeps both variants measurable.
    # Replaces the round-4
    # full df² self-join (18-33 s → 7.5 s best-of-3 on this host).
    # xxhash64: internal-only key, same rationale as the Jaccard build.
    # Order "auto" since r7: the df-skew probe picks df-ascending on
    # Zipfian corpora (head terms never enter a prefix — 30% faster on
    # the Zipf fixture) and hash order on flat ones (skips the
    # join-back that made hash win 9% there); see _prefix_order_sets.
    sh = _shingles(d, max_df=max_df).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    resolved, sets, probe_tab = _prefix_order_sets(
        spark, sh, (spark.sparkContext.applicationId, sf_dir, max_df), order
    )
    # Eager fill: `sets` feeds three subtrees (prefix probes, full
    # postings, verify arrays) — concurrently-scheduled consumers of a
    # lazy persist would each recompute the shingle aggregation.
    sets.count()
    if probe_tab is not None:
        probe_tab.unpersist()
    # prefix length ⌊n/5⌋+1 at t=4/5 = n - ceil(t·n) + 1. Sizes ride
    # along on the exploded streams so the SIZE bound — C(A→B) ≥ t needs
    # |B| ≥ t·|A| because n_inter ≤ min — prunes candidate rows INSIDE
    # the index join, before any downstream work.
    probes = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("n_a"),
        F.explode(
            F.slice("hs", 1, (F.floor(F.col("n") / CONTAIN_DEN) + 1).cast("int"))
        ).alias("h"),
    )
    postings = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("n_b"),
        F.explode("hs").alias("h"),
    )
    if max_df is None:
        # Pre-flight the EXACT measure (r8 verdict directive #2): the
        # asymmetric index join's raw match volume is
        # Σ_h cnt_probe(h)·cnt_posting(h) — two vocab-sized aggs and a
        # vocab-keyed join over frames derived from the persisted sets.
        # BOTH registered consumers (corpus_containment and its cap
        # eval) are tagged exact_measure with the capped twin, so the
        # builder-level guard mirrors the winnowing family exactly.
        from ..functions.admission import exact_pair_budget
        from .text import ExactMeasureBoundError

        budget = exact_pair_budget()
        pc = probes.groupBy("h").agg(F.count(F.lit(1)).alias("ca"))
        qc = postings.groupBy("h").agg(F.count(F.lit(1)).alias("cb"))
        fanout = (
            pc.join(qc, "h")
            .agg(F.sum(F.col("ca") * F.col("cb")).alias("s"))
            .first()["s"]
            or 0
        )
        if fanout > budget:
            sets.unpersist()
            raise ExactMeasureBoundError(
                f"corpus_containment exact measure needs {fanout:,} "
                f"index-join rows > budget {budget:,}; run the oracle-"
                "checked scale twin corpus_containment_capped instead, or "
                "raise SPARK_GRAFT_EXACT_PAIR_BUDGET on a host with the disk"
            )
    # Explicit width on the index join: AQE sizes post-shuffle partitions
    # by INPUT bytes, but an inverted-index join's OUTPUT is Σ df_a·df_b —
    # far larger; pre-sizing the stage for its output volume is the same
    # fan-out blind-spot fix the winnowing join carries (PLANS.md).
    width = max(4 * int(spark.conf.get("spark.sql.shuffle.partitions")), 128)
    cand = (
        probes.repartition(width, "h")
        .join(postings.repartition(width, "h"), "h")
        .filter(
            (F.col("doc_a") != F.col("doc_b"))
            & (F.col("n_b") * CONTAIN_DEN >= F.col("n_a") * CONTAIN_NUM)
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
    )
    # Verify candidates with ONE sorted-array intersection per row (JVM
    # codegen, O(n_a+n_b)) against the doc→array map (|docs| rows of
    # bounded arrays — ~2 MB at sf0.1, so AQE picks broadcast here; at
    # cluster scale it grows with the corpus and AQE falls back to a
    # keyed join — deliberately NO F.broadcast hint, which would pin a
    # corpus-sized build side). Also deliberately NO pre-verify
    # distinct: measured at sf0.1 the candidate stream barely dedups
    # (15.4 M → 10.6 M) so the distinct was a pure 6.6 s shuffle; raw
    # rows flow straight through the verify and the distinct runs on
    # the ~10³× smaller VERIFIED output instead.
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a")
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b")
    )
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("hs_a", "hs_b")).cast("long")
        )
        .filter(
            F.col("n_inter") * CONTAIN_DEN >= F.col("n_a") * CONTAIN_NUM
        )
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_a",
            "n_b",
            (F.col("n_inter") / F.col("n_a"))
            .cast("decimal(18,6)")
            .cast("double")
            .alias("containment"),
            (F.col("n_inter") == F.col("n_a")).alias("is_subset"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sets.unpersist()
    _CONTAIN_CACHE[key] = out
    _CONTAIN_CACHE[key[:3] + (resolved,)] = out
    return out


CORPUS_CONTAINMENT_SQL = f"""
WITH
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
       CAST(CAST(n_inter / sa.n AS DECIMAL(18,6)) AS DOUBLE) AS containment,
       n_inter = sa.n AS is_subset
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE n_inter * {CONTAIN_DEN} >= sa.n * {CONTAIN_NUM}
"""


# Oracle for the df-capped twin: identical shape, with the stop-shingle
# drop (df ≤ JACCARD_MAX_DF) replayed BEFORE sizes and the index join —
# the same place the engine applies it (_shingles(max_df=…)).
CORPUS_CONTAINMENT_CAPPED_SQL = f"""
WITH
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
keep AS (
  SELECT shingle FROM sh0 GROUP BY shingle
  HAVING COUNT(*) <= {JACCARD_MAX_DF}
),
sh AS (SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_inter, sa.n AS n_a, sb.n AS n_b,
       CAST(CAST(n_inter / sa.n AS DECIMAL(18,6)) AS DOUBLE) AS containment,
       n_inter = sa.n AS is_subset
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE n_inter * {CONTAIN_DEN} >= sa.n * {CONTAIN_NUM}
"""


SOURCE_OVERLAP_TOP_K = 25


def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (§2.4 corpus provenance — "which
    sources copy from each other?"): for every source pair, the count of
    distinct word-bigram shingles they share and the overlap coefficient
    shared / min(|A|, |B|) in ppm. The source-granular rollup of the
    doc-granular near-dup passes — run FIRST at 100 TB, because dropping
    or down-weighting one mirror-heavy source pair is cheaper than
    pairwise doc dedup across the full corpus.

    Plan: distinct (source, shingle-hash) — shingles narrow to 60-bit
    md5 wire keys (md5_long60 discipline) — then a self-equi-join keyed
    by shingle and a pair-keyed count; per-source set sizes attach by
    two broadcast-sized joins (one row per source). The shingle join is
    df-skew-prone like every inverted index; `_shingles(max_df=...)` is
    the valve when boilerplate shingles dominate (off here — the oracle
    replays the exact measure). Top-K pairs by overlap keeps the output
    bounded.
    """
    from ..functions.hashing import md5_long60

    d = Catalog(spark, sf_dir).table("documents")
    sh = (
        _shingles(d)
        .join(d.select("doc_id", "source"), "doc_id")
        .select("source", md5_long60("shingle").alias("h"))
        .distinct()
    )
    sh = sh.persist()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
    return (
        pairs.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            "sz_a",
            "sz_b",
            F.expr("shared * 1000000 div least(sz_a, sz_b)").alias("overlap_ppm"),
        )
        .orderBy(F.desc("overlap_ppm"), F.desc("shared"), "src_a", "src_b")
        .limit(SOURCE_OVERLAP_TOP_K)
    )


CORPUS_SOURCE_OVERLAP_SQL = f"""
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
  WHERE LEN(string_split(text, ' ')) >= 2
),
sh AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(w[i] || ' ' || w[i + 1]), 1, 15))::BIGINT AS h
  FROM w, UNNEST(generate_series(1, LEN(w) - 1)) AS g(i)
),
sizes AS (
  SELECT source, COUNT(*) AS sz FROM sh GROUP BY source
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, shared, sa.sz AS sz_a, sb.sz AS sz_b,
       shared * 1000000 // LEAST(sa.sz, sb.sz) AS overlap_ppm
FROM pairs
JOIN sizes sa ON src_a = sa.source
JOIN sizes sb ON src_b = sb.source
ORDER BY overlap_ppm DESC, shared DESC, src_a, src_b
LIMIT {SOURCE_OVERLAP_TOP_K}
"""


def dedup_simhash_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit for the SIMHASH family (§2.4 dedup
    meta-tooling — the Hamming-banding twin of dedup_lsh_quality_eval):
    precision and recall of the Hamming ≤ 3 SimHash pair generator
    against the exact Jaccard ≥ 0.5 ground truth. MinHash estimates
    Jaccard directly, so its eval reads as calibration; SimHash
    measures a DIFFERENT similarity (cosine-of-frequency-vectors), so
    this readout is the one that decides whether the cheaper
    signature family is good enough for a given corpus — exactly the
    trade a 100 TB dedup deployment prices before choosing.

    Same shape as the LSH eval: canonical pair sets, one semi join, a
    tagged-union conditional count (no 1-row joins — dedup.py's
    no-broadcast-hint pin), integer counts, two pinned ratios.
    """
    # r11: candidate side reads the memoized checkpoint, which is
    # DISTINCT by construction (the candidate build dedups before the
    # radius filter — pinned by test_simhash_pairs_distinct), so the
    # former defensive .distinct() over the 78.8 M-pair stream is
    # dropped: it re-shuffled the full pair set for zero row change.
    cand = _verified_simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    truth = (
        _verified_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").distinct()
    )
    hit = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    tagged = (
        cand.select(F.lit("cand").alias("k"))
        .unionAll(truth.select(F.lit("truth").alias("k")))
        .unionAll(hit.select(F.lit("hit").alias("k")))
    )
    counts = tagged.groupBy().agg(
        F.sum((F.col("k") == "cand").cast("long")).alias("n_candidates"),
        F.sum((F.col("k") == "truth").cast("long")).alias("n_true_pairs"),
        F.sum((F.col("k") == "hit").cast("long")).alias("n_hits"),
    )

    def ratio(num: str, den: str) -> F.Column:
        return (
            (F.col(num).cast("double") / F.col(den))
            .cast("decimal(18,6)")
            .cast("double")
        )

    return counts.select(
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        ratio("n_hits", "n_candidates").alias("precision"),
        ratio("n_hits", "n_true_pairs").alias("recall"),
    )


DEDUP_SIMHASH_QUALITY_EVAL_SQL = f"""
WITH cand0 AS ({DEDUP_SIMHASH_HAMMING_SQL}),
cand AS (SELECT DISTINCT doc_a, doc_b FROM cand0),
w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh2 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w2 WHERE len(w) >= 2)
),
sz2 AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
inter2 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
truth AS (
  SELECT DISTINCT doc_a, doc_b FROM inter2
  JOIN sz2 sa ON sa.doc_id = doc_a JOIN sz2 sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
hit AS (SELECT doc_a, doc_b FROM cand INTERSECT SELECT doc_a, doc_b FROM truth),
counts AS (
  SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM truth) AS n_true_pairs,
         (SELECT COUNT(*) FROM hit) AS n_hits
)
SELECT n_candidates, n_true_pairs, n_hits,
       CAST(CAST(CAST(n_hits AS DOUBLE) / n_candidates AS DECIMAL(18,6)) AS DOUBLE) AS precision,
       CAST(CAST(CAST(n_hits AS DOUBLE) / n_true_pairs AS DECIMAL(18,6)) AS DOUBLE) AS recall
FROM counts
"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (SNM blocking — Hernandez & Stolfo 1995)
# ---------------------------------------------------------------------------

SNM_WINDOW = 4  # candidate pairs within W-1 positions of the sorted order


def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup detection: the third blocking
    paradigm next to LSH banding (`dedup_minhash_lsh`) and prefix
    filtering (`dedup_ngram_jaccard`) — sort the corpus by a
    content-derived key, slide a W-row window, verify only
    sort-adjacent pairs. Candidate volume is EXACTLY (W-1)·n regardless
    of key skew — the one blocking method whose worst case is linear by
    construction (LSH needs a bucket valve, prefix filtering a df cap).
    The trade: recall depends on near-dups sorting near each other, so
    production runs multiple passes with different keys; this is the
    canonical first pass (lexicographic minimum of the token set).

    Sort key: first 3 tokens of the sorted distinct-token set — shared
    token sets sort adjacently no matter how edits reordered the text.

    The global rank is NOT a single-partition ``row_number`` (the plan
    every naive SNM uses and the plan audit forbids): ranks are
    per-bucket ``row_number`` (bucket = first key char, bounded domain)
    plus bucket-count prefix offsets — an aggregated-grain window over
    ≤|alphabet| rows — so rank assignment parallelizes by bucket while
    reproducing the exact global ordinal. Candidates join on
    ``rank div W`` blocks (same + adjacent), a plain equi-join.

    Reference scope: extends the reference's DISTINCT/select surface
    (select_point_to_point_links.sql) to corpus-scale record linkage.
    """
    cand = _snm_candidates(spark, sf_dir)
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    return (
        cand.withColumn("n_inter", inter)
        .withColumn(
            "jac_ppm",
            F.expr("CAST(n_inter AS BIGINT) * 1000000 div (na + nb - n_inter)"),
        )
        .filter(
            F.col("jac_ppm") >= int(JACCARD_THRESHOLD * 1_000_000)
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("rb") - F.col("ra")).cast("int").alias("rank_gap"),
            "jac_ppm",
        )
    )


# Multi-pass SNM sort keys (r6 verdict directive #5): production SNM
# runs SEVERAL passes on independent keys and unions candidates, because
# one key misses pairs whose edits disturb that key's prefix. Each key
# is content-derived and DuckDB-replayable; `head` is the original
# single-pass key.
_SNM_TOKS = "array_sort(array_distinct(split(text, ' ')))"
SNM_PASS_KEYS: dict[str, str] = {
    # first 3 tokens of the sorted distinct-token set
    "head": f"array_join(slice({_SNM_TOKS}, 1, 3), ' ')",
    # last 3 tokens, descending — immune to edits at the set's head
    "tail": f"array_join(slice(reverse({_SNM_TOKS}), 1, 3), ' ')",
    # first 3 under the REVERSED-string order — groups shared suffixes
    "suffix": (
        "array_join(slice(array_sort(transform("
        "array_distinct(split(text, ' ')), t -> reverse(t))), 1, 3), ' ')"
    ),
}


def _snm_candidates(
    spark: SparkSession, sf_dir: str, key_sql: str | None = None
) -> DataFrame:
    """Sort-adjacent candidate pairs (rank gap 1..W-1 in the global
    SNM order for the given sort key) with each side's distinct-token
    set attached. ``key_sql`` defaults to the ``head`` pass key."""
    d = Catalog(spark, sf_dir).table("documents")
    toks = F.array_sort(F.array_distinct(F.split("text", " ")))
    keyed = d.select(
        "doc_id",
        F.expr(key_sql or SNM_PASS_KEYS["head"]).alias("snm_key"),
        toks.alias("hs"),
        F.size(toks).alias("n"),
    ).withColumn("bucket", F.substring("snm_key", 1, 1))
    counts = keyed.groupBy("bucket").agg(F.count("*").alias("c"))
    offsets = counts.select(
        "bucket",
        (
            F.sum("c").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("c")
        ).alias("off"),
    )
    # no broadcast hint — dedup carries none by contract
    # (test_no_corpus_sized_broadcast_hints); offsets is a ≤|alphabet|-row
    # aggregate, so AQE elects the broadcast on its own.
    ranked = (
        keyed.join(offsets, "bucket")
        .withColumn(
            "r",
            F.col("off")
            + F.row_number().over(
                Window.partitionBy("bucket").orderBy("snm_key", "doc_id")
            ),
        )
        .select("doc_id", "hs", "n", "r")
        .withColumn("blk", F.expr(f"r div {SNM_WINDOW}"))
    )
    # Probe-side rows are DOUBLED (own block + successor block) so the
    # block-adjacency condition becomes a single EQUI-join key — the
    # `blk_b IN (blk_a, blk_a+1)` formulation has no equality Catalyst
    # can hash on and planned as BroadcastNestedLoopJoin, the quadratic
    # shape this operator exists to avoid. 2× probe rows buys a shuffle
    # hash join; rank-distance stays as the residual filter.
    a = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("hs_a"),
        F.col("n").alias("na"),
        F.col("r").alias("ra"),
        F.explode(F.array(F.col("blk"), F.col("blk") + 1)).alias("blk_probe"),
    )
    b = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("hs_b"),
        F.col("n").alias("nb"),
        F.col("r").alias("rb"),
        F.col("blk").alias("blk_probe"),
    )
    return (
        a.join(b, "blk_probe")
        .filter(
            (F.col("rb") > F.col("ra")) & (F.col("rb") - F.col("ra") < SNM_WINDOW)
        )
        .drop("blk_probe")
    )


def dedup_snm_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of ONE sorted-neighborhood pass against the
    exact shingle-Jaccard ≥ 0.5 truth set — the "is a single sort key
    enough?" audit that decides how many SNM passes a deployment runs
    (production SNM is multi-pass precisely because one key misses
    pairs whose edits disturb the sort prefix; this query MEASURES that
    miss rate instead of guessing it).

    Candidates are the raw sort-adjacent pairs (BEFORE token-Jaccard
    verification — the eval scores the blocking step, not the verifier),
    canonicalized to (min, max) doc ids to align with the truth set's
    ordering. Same tagged-union count shape as the LSH/SimHash evals;
    truth is the memoized verified pair build shared suite-wide.
    """
    raw = _snm_candidates(spark, sf_dir)
    cand = raw.select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
    ).distinct()
    truth = (
        _verified_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").distinct()
    )
    hit = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    tagged = (
        cand.select(F.lit("cand").alias("k"))
        .unionAll(truth.select(F.lit("truth").alias("k")))
        .unionAll(hit.select(F.lit("hit").alias("k")))
    )
    counts = tagged.groupBy().agg(
        F.sum((F.col("k") == "cand").cast("long")).alias("n_candidates"),
        F.sum((F.col("k") == "truth").cast("long")).alias("n_true_pairs"),
        F.sum((F.col("k") == "hit").cast("long")).alias("n_hits"),
    )

    def ratio(num: str, den: str) -> F.Column:
        return (
            (F.col(num).cast("double") / F.col(den))
            .cast("decimal(18,6)")
            .cast("double")
        )

    return counts.select(
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        ratio("n_hits", "n_candidates").alias("precision"),
        ratio("n_hits", "n_true_pairs").alias("recall"),
    )


DEDUP_SORTED_NEIGHBORHOOD_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ' ')
           AS snm_key,
         list_sort(list_distinct(string_split(text, ' '))) AS hs,
         LEN(list_distinct(string_split(text, ' '))) AS n
  FROM documents
),
ranked AS (
  SELECT doc_id, hs, n,
         ROW_NUMBER() OVER (ORDER BY snm_key, doc_id) AS r
  FROM keyed
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.hs AS hs_a, b.hs AS hs_b, a.n AS na, b.n AS nb,
         b.r - a.r AS rank_gap
  FROM ranked a JOIN ranked b
    ON b.r > a.r AND b.r - a.r < {SNM_WINDOW}
),
verified AS (
  SELECT doc_a, doc_b, CAST(rank_gap AS INT) AS rank_gap,
         CAST(LEN(list_intersect(hs_a, hs_b)) AS BIGINT) * 1000000
           // CAST(na + nb - LEN(list_intersect(hs_a, hs_b)) AS BIGINT) AS jac_ppm
  FROM cand
)
SELECT doc_a, doc_b, rank_gap, jac_ppm
FROM verified
WHERE jac_ppm >= {int(JACCARD_THRESHOLD * 1_000_000)}
"""


DEDUP_SNM_QUALITY_EVAL_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ' ')
           AS snm_key
  FROM documents
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY snm_key, doc_id) AS r
  FROM keyed
),
cand AS (
  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
                  GREATEST(a.doc_id, b.doc_id) AS doc_b
  FROM ranked a JOIN ranked b
    ON b.r > a.r AND b.r - a.r < {SNM_WINDOW}
),
w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh2 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w2 WHERE len(w) >= 2)
),
sz2 AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
inter2 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
truth AS (
  SELECT DISTINCT doc_a, doc_b FROM inter2
  JOIN sz2 sa ON sa.doc_id = doc_a JOIN sz2 sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
hit AS (SELECT doc_a, doc_b FROM cand INTERSECT SELECT doc_a, doc_b FROM truth),
counts AS (
  SELECT (SELECT COUNT(*) FROM cand)  AS n_candidates,
         (SELECT COUNT(*) FROM truth) AS n_true_pairs,
         (SELECT COUNT(*) FROM hit)   AS n_hits
)
SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(CAST(CAST(n_hits AS DOUBLE) / n_candidates AS DECIMAL(18,6)) AS DOUBLE)
         AS precision,
       CAST(CAST(CAST(n_hits AS DOUBLE) / n_true_pairs AS DECIMAL(18,6)) AS DOUBLE)
         AS recall
FROM counts
"""


# DuckDB replicas of SNM_PASS_KEYS (same global orders)
_SNM_TOKS_SQL = "list_sort(list_distinct(string_split(text, ' ')))"
SNM_PASS_KEYS_SQL: dict[str, str] = {
    "head": f"array_to_string({_SNM_TOKS_SQL}[1:3], ' ')",
    "tail": f"array_to_string(list_reverse({_SNM_TOKS_SQL})[1:3], ' ')",
    "suffix": (
        "array_to_string(list_sort(list_transform("
        "list_distinct(string_split(text, ' ')), t -> reverse(t)))[1:3], ' ')"
    ),
}


def dedup_snm_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood dedup (r6 verdict directive #5):
    three passes on independent content-derived keys (head / tail /
    suffix of the token-set order), candidates UNIONED, each distinct
    pair verified ONCE by token-set Jaccard. This is how production SNM
    recovers the recall a single sort key leaves behind
    (``dedup_snm_quality_eval`` measured one-pass recall at 0.24) while
    keeping the blocking volume EXACTLY (W-1)·n·passes — still linear
    by construction, still skew-immune (no bucket valve needed).

    Output carries ``n_passes`` (how many passes surfaced the pair) —
    the redundancy profile that tells a deployment which keys earn
    their pass.

    Scale: each pass is the same per-bucket rank + block equi-join as
    the single-pass operator; the union is map-side; verification joins
    the token-set table per distinct candidate pair (candidate-volume-
    sized, ≤3(W-1)·n rows). No quadratic stage anywhere."""
    d = Catalog(spark, sf_dir).table("documents")
    toks = F.array_sort(F.array_distinct(F.split("text", " ")))
    tok_tab = d.select("doc_id", toks.alias("hs"), F.size(toks).alias("n"))
    cand = None
    for name, key_sql in SNM_PASS_KEYS.items():
        c = _snm_candidates(spark, sf_dir, key_sql=key_sql).select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            F.lit(name).alias("pass_name"),
        )
        cand = c if cand is None else cand.unionByName(c)
    per_pair = (
        cand.distinct()  # a pass can emit a pair once; distinct per (pair, pass)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_passes"))
    )
    ta = tok_tab.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("na")
    )
    tb = tok_tab.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    return (
        per_pair.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("n_inter", inter)
        .withColumn(
            "jac_ppm",
            F.expr("CAST(n_inter AS BIGINT) * 1000000 div (na + nb - n_inter)"),
        )
        .filter(F.col("jac_ppm") >= int(JACCARD_THRESHOLD * 1_000_000))
        .select("doc_a", "doc_b", "n_passes", "jac_ppm")
    )


def _snm_multipass_cand_sql() -> str:
    """Shared candidate-union CTE body for the multipass oracles."""
    passes = []
    for name, key in SNM_PASS_KEYS_SQL.items():
        passes.append(
            f"""
  SELECT '{name}' AS pass_name,
         LEAST(a.doc_id, b.doc_id) AS doc_a,
         GREATEST(a.doc_id, b.doc_id) AS doc_b
  FROM (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY {key}, doc_id) AS r
        FROM documents) a
  JOIN (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY {key}, doc_id) AS r
        FROM documents) b
    ON b.r > a.r AND b.r - a.r < {SNM_WINDOW}"""
        )
    return " UNION ALL ".join(passes)


DEDUP_SNM_MULTIPASS_SQL = f"""
WITH cand AS (
  SELECT DISTINCT pass_name, doc_a, doc_b FROM ({_snm_multipass_cand_sql()})
),
per_pair AS (
  SELECT doc_a, doc_b, CAST(COUNT(*) AS INT) AS n_passes
  FROM cand GROUP BY 1, 2
),
tok AS (
  SELECT doc_id, {_SNM_TOKS_SQL} AS hs,
         LEN(list_distinct(string_split(text, ' '))) AS n
  FROM documents
)
SELECT doc_a, doc_b, n_passes,
       CAST(LEN(list_intersect(ta.hs, tb.hs)) AS BIGINT) * 1000000
         // CAST(ta.n + tb.n - LEN(list_intersect(ta.hs, tb.hs)) AS BIGINT)
         AS jac_ppm
FROM per_pair
JOIN tok ta ON ta.doc_id = doc_a
JOIN tok tb ON tb.doc_id = doc_b
WHERE CAST(LEN(list_intersect(ta.hs, tb.hs)) AS BIGINT) * 1000000
        // CAST(ta.n + tb.n - LEN(list_intersect(ta.hs, tb.hs)) AS BIGINT)
      >= {int(JACCARD_THRESHOLD * 1_000_000)}
"""


def dedup_snm_multipass_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pass AND union recall/precision of multi-pass SNM blocking
    against the exact Jaccard ≥ 0.5 truth set — extends
    ``dedup_snm_quality_eval`` to the multipass design question: what
    does each extra key BUY? One output row per pass plus a ``union``
    row; the union row's recall is the operative number (directive #5's
    done-bar: ≫ the 0.24 single-pass figure) at a candidate volume that
    stays (W-1)·n·passes."""
    truth = (
        _verified_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").distinct()
    )
    frames = []
    union_cand = None
    for name, key_sql in SNM_PASS_KEYS.items():
        # persisted: each pass's candidate set feeds its own stats row,
        # its hit semi-join, AND the union row — without the persist the
        # rank+block join subtree evaluates ~4× inside the one plan
        # (measured 34.6 s → the per-pass cost once, id-pair-sized cache)
        c = (
            _snm_candidates(spark, sf_dir, key_sql=key_sql)
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .distinct()
            .persist()
        )
        frames.append((name, c))
        union_cand = c if union_cand is None else union_cand.unionByName(c)
    frames.append(("union", union_cand.distinct()))
    out = None
    for name, c in frames:
        hit = c.join(truth, ["doc_a", "doc_b"], "left_semi")
        tagged = (
            c.select(F.lit("cand").alias("k"))
            .unionAll(truth.select(F.lit("truth").alias("k")))
            .unionAll(hit.select(F.lit("hit").alias("k")))
        )
        row = tagged.groupBy().agg(
            F.lit(name).alias("pass_name"),
            F.sum((F.col("k") == "cand").cast("long")).alias("n_candidates"),
            F.sum((F.col("k") == "truth").cast("long")).alias("n_true_pairs"),
            F.sum((F.col("k") == "hit").cast("long")).alias("n_hits"),
        )
        out = row if out is None else out.unionByName(row)

    def ratio(num: str, den: str) -> F.Column:
        return (
            (F.col(num).cast("double") / F.col(den))
            .cast("decimal(18,6)")
            .cast("double")
        )

    result = out.select(
        "pass_name",
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        ratio("n_hits", "n_candidates").alias("precision"),
        ratio("n_hits", "n_true_pairs").alias("recall"),
    ).localCheckpoint(eager=True)  # stats-sized (one row per pass + union)
    # release the three per-pass candidate persists now that the stats
    # are materialized — they otherwise leak executor storage until the
    # caller's clearCache() (r6 ADVICE)
    for _name, c in frames:
        if _name != "union":
            c.unpersist()
    return result


DEDUP_SNM_MULTIPASS_EVAL_SQL = f"""
WITH cand AS (
  SELECT DISTINCT pass_name, doc_a, doc_b FROM ({_snm_multipass_cand_sql()})
),
all_cand AS (
  SELECT 'union' AS pass_name, doc_a, doc_b
  FROM (SELECT DISTINCT doc_a, doc_b FROM cand)
  UNION ALL
  SELECT pass_name, doc_a, doc_b FROM cand
),
w2 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh2 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w2 WHERE len(w) >= 2)
),
sz2 AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
inter2 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh2 a JOIN sh2 b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
truth AS (
  SELECT DISTINCT doc_a, doc_b FROM inter2
  JOIN sz2 sa ON sa.doc_id = doc_a JOIN sz2 sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
),
stats AS (
  SELECT c.pass_name,
         COUNT(*) AS n_candidates,
         (SELECT COUNT(*) FROM truth) AS n_true_pairs,
         COUNT(*) FILTER (WHERE t.doc_a IS NOT NULL) AS n_hits
  FROM all_cand c
  LEFT JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
  GROUP BY 1
)
SELECT pass_name,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(CAST(CAST(n_hits AS DOUBLE) / n_candidates AS DECIMAL(18,6)) AS DOUBLE)
         AS precision,
       CAST(CAST(CAST(n_hits AS DOUBLE) / n_true_pairs AS DECIMAL(18,6)) AS DOUBLE)
         AS recall
FROM stats
"""


def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING duplicates, every document
    gets a sampling weight 1/|cluster| (ppm-quantized) so a training run
    sees each unique content with equal expected mass — the
    SlimPajama-style alternative to hard removal that preserves corpus
    statistics and lets the sampler, not the filter, make the final
    call. Composes with any clustering; here clusters are exact
    md5(content) groups (the ``dedup_exact`` key).

    Plan: ONE exchange keyed by the uniform 128-bit content hash; the
    cluster size is an unordered whole-partition window count on that
    key (per-key state = one counter, skew bounded by the largest
    duplicate cluster — the valve would be a count cap, same knob as
    everywhere else). Integer ppm output; no join, no second scan.
    """
    d = Catalog(spark, sf_dir).table("documents")
    w = Window.partitionBy(F.md5("text"))
    return d.select(
        "doc_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    ).select(
        "doc_id",
        "cluster_size",
        F.expr("1000000L div cluster_size").alias("weight_ppm"),
    )


DEDUP_SOFT_WEIGHTS_SQL = """
SELECT doc_id,
       COUNT(*) OVER (PARTITION BY md5(text)) AS cluster_size,
       1000000 // COUNT(*) OVER (PARTITION BY md5(text)) AS weight_ppm
FROM documents
"""


def corpus_containment_cap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured semantic cost of the containment df-cap (the
    dedup_snm_quality_eval discipline applied to round 5's valve): the
    EXACT containment pair set is truth; the capped plan is the system;
    one row reports |truth|, |capped|, their overlap, and precision /
    recall in ppm. The number a 100 TB user needs before flipping to
    `corpus_containment_capped` — "bounded fan-out costs THIS much
    recall on THIS corpus", measured, not asserted.

    Plan: both pair sets are the bounded prefix-filtered builds above;
    the comparison is two tiny joins on (doc_a, doc_b) over
    output-sized frames."""
    # localCheckpoint: each pair frame is OUTPUT-sized (tens of rows at
    # the gate SF) but feeds two counting actions each — without the
    # checkpoint every count re-executes the full inverted-index build
    # (measured 17.4 s → ~6 s at sf0.01)
    exact = (
        _containment_pairs(spark, sf_dir, max_df=None)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    capped = (
        _containment_pairs(spark, sf_dir, max_df=JACCARD_MAX_DF)
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


CORPUS_CONTAINMENT_CAP_EVAL_SQL = f"""
WITH
w AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh0 AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
                          i -> w[i] || ' ' || w[i+1])) AS shingle
    FROM w WHERE len(w) >= 2)
),
sz0 AS (SELECT doc_id, COUNT(*) AS n FROM sh0 GROUP BY doc_id),
inter0 AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh0 a JOIN sh0 b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
truth AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter0
  JOIN sz0 sa ON sa.doc_id = doc_a JOIN sz0 sb ON sb.doc_id = doc_b
  WHERE n_inter * {CONTAIN_DEN} >= sa.n * {CONTAIN_NUM}
),
keep AS (
  SELECT shingle FROM sh0 GROUP BY shingle
  HAVING COUNT(*) <= {JACCARD_MAX_DF}
),
sh1 AS MATERIALIZED (
  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)),
sz1 AS (SELECT doc_id, COUNT(*) AS n FROM sh1 GROUP BY doc_id),
inter1 AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh1 a JOIN sh1 b USING (shingle)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
),
capped AS MATERIALIZED (
  SELECT doc_a, doc_b FROM inter1
  JOIN sz1 sa ON sa.doc_id = doc_a JOIN sz1 sb ON sb.doc_id = doc_b
  WHERE n_inter * {CONTAIN_DEN} >= sa.n * {CONTAIN_NUM}
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
