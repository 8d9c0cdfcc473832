"""Semantic pins for events_anomaly_mad and text_lm_novelty."""

from __future__ import annotations

from pyspark.sql import functions as F

from nzwirelessmap_fetch_spark.catalog import Catalog
from nzwirelessmap_fetch_spark.operators.events_analytics import (
    MAD_K,
    events_anomaly_mad,
)
from nzwirelessmap_fetch_spark.operators.text import text_lm_novelty
from tests.conftest import SF_SMOKE


def test_mad_median_is_order_statistic(spark):
    """The pinned median must be an actual data value (lower median), not
    an interpolation — recompute it driver-side per type."""
    rows = {r.event_type: r for r in events_anomaly_mad(spark, SF_SMOKE).collect()}
    e = Catalog(spark, SF_SMOKE).table("events")
    for etype, r in rows.items():
        vals = sorted(
            v.value for v in e.filter(F.col("event_type") == etype).select("value").collect()
        )
        assert r.n_events == len(vals)
        assert r.med == vals[(len(vals) + 1) // 2 - 1]
        devs = sorted(abs(v - r.med) for v in vals)
        assert r.mad == devs[(len(devs) + 1) // 2 - 1]
        assert r.n_anomalies == sum(1 for v in vals if abs(v - r.med) > MAD_K * r.mad)


def test_mad_resists_outlier_vs_zscore_premise(spark):
    """MAD gate flags a bounded share of events — the robustness premise:
    anomaly count stays well under half the population per type."""
    for r in events_anomaly_mad(spark, SF_SMOKE).collect():
        assert 0 <= r.n_anomalies <= r.n_events // 2


def test_lm_novelty_bounds_and_hapax_subset(spark):
    rows = text_lm_novelty(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_bigrams
        assert r.novelty_ppm == r.n_hapax * 1_000_000 // r.n_bigrams


def test_lm_novelty_counts_match_tokenization(spark):
    """n_bigrams per doc equals max(words-1, 0) for that doc — nothing
    dropped by the count join (every doc bigram exists in the corpus
    table by construction)."""
    got = {r.doc_id: r.n_bigrams for r in text_lm_novelty(spark, SF_SMOKE).collect()}
    d = Catalog(spark, SF_SMOKE).table("documents")
    want = {
        r.doc_id: r.nb
        for r in d.select(
            "doc_id",
            F.greatest(F.size(F.split("text", " ")) - 1, F.lit(0)).alias("nb"),
        ).collect()
        if r.nb > 0
    }
    assert got == want


def test_ddsketch_bucket_upper_bounds_rank(spark):
    """The reported bucket's upper bound must sit at or above the true
    p95 value (the sketch's one-sided guarantee at γ=2), and the bucket
    histogram must conserve mass."""
    from nzwirelessmap_fetch_spark.operators.sketches import agg_ddsketch_quantile

    e = Catalog(spark, SF_SMOKE).table("events")
    rows = {r.event_type: r for r in agg_ddsketch_quantile(spark, SF_SMOKE).collect()}
    for etype, r in rows.items():
        vals = sorted(
            v.value for v in e.filter(F.col("event_type") == etype).collect()
        )
        assert r.n == len(vals)
        true_p95 = vals[-(len(vals) - (95 * len(vals) + 99) // 100) - 1]
        assert r.p95_upper_value >= true_p95
        # relative error bound: upper/2 < true p95 cents ceiling
        assert r.p95_upper_cents / 2 <= true_p95 * 100


def test_anova_f_nonnegative_and_decomposition(spark):
    from nzwirelessmap_fetch_spark.plans.stats import events_anova_f

    r = events_anova_f(spark, SF_SMOKE).collect()[0]
    assert r.k_groups >= 2
    assert r.ssb_units >= 0 and r.ssw_units >= 0
    assert r.f_milli >= 0
