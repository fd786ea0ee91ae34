"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly batch
iteration, Arrow-batched ``mapInPandas`` — while the actual media
decode is stubbed (image/audio libraries are not in this container):
``decode_features`` computes a deterministic fake feature vector from
the raw bytes, and ``decode_image_stub`` raises ``NotImplementedError``
to mark the integration point for a real decoder (PIL/ffmpeg on a
production cluster, shipped to executors via ``spark.archives``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, sha256 string, byte_mean double, byte_std double"
)


def attach_binary(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Typed multimodal row: opaque binary payload + cheap metadata
    (size, content digest) computed JVM-side."""
    bin_col = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        bin_col.alias("payload"),
        F.octet_length(bin_col).alias("n_bytes"),
        F.sha2(bin_col, 256).alias("sha256"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """Integration point for a real image decoder.

    STUB: real decode needs PIL/libvips, not present in this container.
    On a production cluster, replace the body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` and return
    width/height/mode."""
    raise NotImplementedError(
        "media decode requires an image library; use decode_features for "
        "the deterministic fake path"
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams column batches through Python — the shape a
    real decoder plugs into (per-batch, zero row-at-a-time overhead).
    The fake features (byte mean/std) are deterministic so tests can
    assert exact values."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "sha256": pdf["sha256"],
                    "byte_mean": [
                        float(pd.Series(list(p)).mean()) if len(p) else 0.0
                        for p in payloads
                    ],
                    "byte_std": [
                        float(pd.Series(list(p)).std(ddof=1)) if len(p) > 1 else 0.0
                        for p in payloads
                    ],
                }
            )
            yield out

    return binary_df.mapInPandas(extract, schema=FEATURE_SCHEMA)
