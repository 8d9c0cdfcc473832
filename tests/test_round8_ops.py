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
