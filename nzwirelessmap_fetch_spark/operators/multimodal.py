"""Multimodal (binary) column plumbing (SURVEY.md §2.4).

Media travels as opaque ``binary`` columns with typed metadata — the same
model as Spark's ``binaryFile`` source. Feature extraction runs through
``mapInPandas`` (Arrow record batches; the only operator family in this
repo where Python in the hot path is justified, because real decoders are
C libraries behind Python APIs).

The actual image/audio decode is STUBBED: this container has no
PIL/ffmpeg, so ``decode_image`` raises ``NotImplementedError`` and the
pipeline uses ``fake_decode_features`` — a deterministic stand-in with the
same signature, schema, and batch shape as a real decoder. The Spark-side
plumbing (schema, partitioning, Arrow batching) is real and oracle-checked:
the fake features are pure functions of the bytes, so DuckDB reproduces
them from the same blobs.

Scale notes: mapInPandas streams Arrow batches — no per-row pickling, no
driver collect; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Decode is CPU-bound and
embarrassingly parallel: partition count, not operator design, is the knob.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, content_md5 string, width int, height int"
)


def decode_image(data: bytes) -> dict:
    """Real decoder hook — requires an image library not present in this
    environment. Swap in PIL/libvips here in production."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; use fake_decode_features in tests"
    )


def fake_decode_features(data: bytes) -> dict:
    """Deterministic stand-in for decode: features derived purely from the
    byte content (so any engine can reproduce them)."""
    n = len(data)
    return {
        "n_bytes": n,
        "content_md5": hashlib.md5(data).hexdigest(),
        "width": 64 + n % 577,
        "height": 64 + (n * 31) % 353,
    }


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column table synthesized from documents (no image fixtures in
    the testdata): media = utf-8 bytes, metadata = (format, n_bytes)."""
    d = Catalog(spark, sf_dir).table("documents")
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(F.col("text").cast("binary")).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media binary column → per-item features via Arrow-batched
    mapInPandas."""
    media = media_table(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media"].map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]),
                    "content_md5": feats.map(lambda f: f["content_md5"]),
                    "width": feats.map(lambda f: f["width"]),
                    "height": feats.map(lambda f: f["height"]),
                }
            )

    return media.select("doc_id", "media").mapInPandas(extract, FEATURE_SCHEMA)


MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CAST(LENGTH(text) AS INT)                       AS n_bytes,
       md5(text)                                       AS content_md5,
       CAST(64 + LENGTH(text) % 577 AS INT)            AS width,
       CAST(64 + (LENGTH(text) * 31) % 353 AS INT)     AS height
FROM documents
"""
