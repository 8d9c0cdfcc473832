"""Round-8 tests: r7 ADVICE regressions (empty-corpus order probe, tRNS
fail-loud, atomic commit admission, pinned-base streaming merge) and the
round-8 operators (adaptive winnowing cap, unified artifact commits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_prefix_order_probe_empty_corpus(spark):
    """r7 ADVICE (dedup.py:217): order='auto' on an EMPTY shingle table
    must resolve to hash order, not raise TypeError on max(df)=None."""
    from nzwirelessmap_fetch_spark.operators.dedup import (
        _ORDER_PROBE_CACHE,
        _prefix_order_sets,
    )

    sh = spark.createDataFrame([], "doc_id long, h long")
    _ORDER_PROBE_CACHE.clear()
    order, sets, probe_tab = _prefix_order_sets(
        spark, sh, ("test-empty-corpus-probe",), "auto"
    )
    assert order == "hash"
    assert sets.count() == 0
    if probe_tab is not None:
        probe_tab.unpersist()
    sets.unpersist()
    _ORDER_PROBE_CACHE.clear()


def test_png_trns_on_truecolor_fails_loud():
    """r7 ADVICE (png.py:152): a grayscale/RGB PNG carrying tRNS (the
    spec-legal single transparent color) must raise the documented
    NotImplementedError, not silently decode opaque."""
    import struct
    import zlib

    from nzwirelessmap_fetch_spark.functions import png

    # hand-assemble a 1x1 RGB (color type 2) PNG with a tRNS chunk
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    scan = bytes([0, 10, 20, 30])  # filter 0 + one RGB pixel
    blob = (
        png.PNG_SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"tRNS", struct.pack(">HHH", 10, 20, 30))
        + png._chunk(b"IDAT", zlib.compress(scan))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="tRNS on color type 2"):
        png.decode_png(blob)
    # same image without tRNS decodes fine (the guard is tRNS-specific)
    ok = (
        png.PNG_SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(scan))
        + png._chunk(b"IEND", b"")
    )
    w, h, ch, raw = png.decode_png(ok)
    assert (w, h, ch) == (1, 1, 3) and raw == bytes([10, 20, 30])


def test_winnow_adaptive_cap_histogram_walk(spark):
    """The budget walk (r7 verdict directive #1): cap = largest df with
    cumulative sum(df^2) <= budget, floored at WINNOW_MAX_DF."""
    from nzwirelessmap_fetch_spark.operators.text import (
        WINNOW_MAX_DF,
        WINNOW_PAIR_BUDGET_PER_DOC,
        _winnow_adaptive_cap,
    )

    # 100 fps at df=10 (cum 10k), 10 at df=100 (cum 110k), 1 at df=1000
    rows = (
        [(i, 10) for i in range(100)]
        + [(1000 + i, 100) for i in range(10)]
        + [(9999, 1000)]
    )
    dfs = spark.createDataFrame(rows, "fp long, df int")
    # budget = PER_DOC * n_docs; pick n_docs so thresholds land mid-ladder
    per = WINNOW_PAIR_BUDGET_PER_DOC
    assert _winnow_adaptive_cap(dfs, -(-9_999 // per)) == WINNOW_MAX_DF  # < 10k
    assert _winnow_adaptive_cap(dfs, -(-10_000 // per) or 1) in (
        WINNOW_MAX_DF,
        10,
    )  # exactly the first rung (10 < floor 16 -> floor wins)
    assert _winnow_adaptive_cap(dfs, -(-110_000 // per)) == 100
    assert _winnow_adaptive_cap(dfs, -(-1_110_000 // per)) == 1000
    # empty df table -> floor
    empty = spark.createDataFrame([], "fp long, df int")
    assert _winnow_adaptive_cap(empty, 100) == WINNOW_MAX_DF


def test_winnow_adaptive_capped_subset_of_exact(spark):
    """The adaptive-capped pair set is a subset of the exact truth on
    the smoke corpus, and both runs hit the memoized substrates."""
    from tests.conftest import SF_SMOKE

    from nzwirelessmap_fetch_spark.operators.text import (
        _WINNOW_FP_CACHE,
        _WINNOW_PAIRS_CACHE,
        corpus_winnowing,
        corpus_winnowing_capped,
    )

    exact = {
        (r["doc_a"], r["doc_b"]) for r in corpus_winnowing(spark, SF_SMOKE).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in corpus_winnowing_capped(spark, SF_SMOKE).collect()
    }
    assert capped <= exact
    assert any(k[1] == SF_SMOKE for k in _WINNOW_FP_CACHE)
    assert sum(1 for k in _WINNOW_PAIRS_CACHE if k[1] == SF_SMOKE) == 2
