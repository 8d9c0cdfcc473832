"""Semantic pins for text_collocations_dice / corpus_vocab_growth /
corpus_oov_rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.catalog import Catalog
from nzwirelessmap_fetch_spark.operators.text import (
    COLLOC_MIN_COUNT,
    OOV_VOCAB_SIZE,
    corpus_oov_rate,
    corpus_vocab_growth,
    text_collocations_dice,
)
from tests.conftest import SF_SMOKE


def test_dice_bounds_and_support(spark):
    rows = text_collocations_dice(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.cxy >= COLLOC_MIN_COUNT
        # a bigram occurrence implies one occurrence of each word
        assert r.cxy <= r.cx and r.cxy <= r.cy
        assert r.dice_ppm == 2 * r.cxy * 1_000_000 // (r.cx + r.cy)
        assert 0 < r.dice_ppm <= 1_000_000


def test_vocab_growth_is_monotone_and_concave_mass(spark):
    rows = corpus_vocab_growth(spark, SF_SMOKE).collect()
    assert rows == sorted(rows, key=lambda r: r.bucket)
    cum_v, cum_t = 0, 0
    for r in rows:
        cum_v += r.new_words
        cum_t += r.n_tokens
        assert r.cum_vocab == cum_v
        assert r.cum_tokens == cum_t
        assert r.new_words <= r.n_tokens
    # total vocabulary equals distinct words in the corpus
    d = Catalog(spark, SF_SMOKE).table("documents")
    n_vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w")).select("w").distinct().count()
    )
    assert rows[-1].cum_vocab == n_vocab


def test_oov_rate_zero_for_common_only_docs(spark):
    rows = corpus_oov_rate(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_ppm == r.n_oov * 1_000_000 // r.n_tokens
    # vocabulary coverage sanity: if the corpus has <= OOV_VOCAB_SIZE
    # distinct words, nothing is OOV
    d = Catalog(spark, SF_SMOKE).table("documents")
    n_vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w")).select("w").distinct().count()
    )
    if n_vocab <= OOV_VOCAB_SIZE:
        assert all(r.n_oov == 0 for r in rows)


def test_source_overlap_bounds(spark):
    from nzwirelessmap_fetch_spark.operators.dedup import corpus_source_overlap

    rows = corpus_source_overlap(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.shared <= min(r.sz_a, r.sz_b)
        assert r.overlap_ppm == r.shared * 1_000_000 // min(r.sz_a, r.sz_b)


def test_audience_overlap_jaccard_identity(spark):
    from nzwirelessmap_fetch_spark.operators.events_analytics import (
        events_audience_overlap,
    )

    rows = events_audience_overlap(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 <= r.n_both <= min(r.n_a, r.n_b)
        union = r.n_a + r.n_b - r.n_both
        assert r.jaccard_ppm == r.n_both * 1_000_000 // union
