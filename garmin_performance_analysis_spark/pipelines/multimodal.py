"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly batch
iteration, Arrow-batched ``mapInPandas`` — and so is the header-level
decode: ``parse_image_header`` reads BMP/PPM/PGM dimensions with pure
``struct``/byte arithmetic (no image library needed).  Codec-level
decode (JPEG/PNG entropy data, audio, video) is stubbed:
``decode_features`` computes deterministic byte statistics plus the
header parse, and ``decode_image_stub`` raises ``NotImplementedError``
to mark the integration point for a real decoder (PIL/ffmpeg on a
production cluster, shipped to executors via ``spark.archives``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, sha256 string, byte_mean double, byte_std double, "
    "fmt string, width int, height int, channels int"
)


def parse_image_header(payload: bytes):
    """Real (no-dependency) image header decode: BMP and binary PPM/PGM.

    Returns ``(fmt, width, height, channels)`` or ``None`` for payloads
    that are not a recognized image — the honest fallback path for
    opaque media.  Pure ``struct``/byte arithmetic on the first bytes;
    formats needing a codec library (JPEG/PNG entropy data, audio,
    video) still belong to the ``decode_image_stub`` integration point.

    Validation: a BMP match requires DIB header size 40 at bytes 14-17
    (LE ``0x28 00 00 00``) and planes==1 at 26-27 (``0x01 0x00``) —
    both contain NUL bytes, which never occur in text, so BMP can never
    false-positive on a text corpus.  A PPM/PGM match requires the
    magic, three bounded integers, AND the full raster
    (width·height·channels samples) to be present after the header —
    so the only "text" that matches is a byte stream that genuinely IS
    a complete binary PPM, at which point reporting its dimensions is
    correct behavior, not a false positive.
    """
    # --- BMP (BITMAPINFOHEADER) ------------------------------------
    if len(payload) >= 54 and payload[:2] == b"BM":
        dib = int.from_bytes(payload[14:18], "little")
        planes = int.from_bytes(payload[26:28], "little")
        bpp = int.from_bytes(payload[28:30], "little")
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        if (
            dib == 40
            and planes == 1
            and bpp in (1, 4, 8, 16, 24, 32)
            and 0 < width <= 1_000_000
            and 0 < abs(height) <= 1_000_000
        ):
            return ("bmp", width, abs(height), max(1, bpp // 8))
    # --- binary PPM (P6) / PGM (P5) --------------------------------
    if (
        len(payload) >= 3
        and payload[:2] in (b"P6", b"P5")
        and payload[2:3] in (b" ", b"\t", b"\r", b"\n", b"#")
    ):
        channels = 3 if payload[:2] == b"P6" else 1
        pos, fields = 2, []
        try:
            while len(fields) < 3:
                while payload[pos] in b" \t\r\n":
                    pos += 1
                if payload[pos : pos + 1] == b"#":  # comment to EOL
                    while payload[pos] not in b"\r\n":
                        pos += 1
                    continue
                start = pos
                while payload[pos] in b"0123456789":
                    pos += 1
                if pos == start:
                    return None
                fields.append(int(payload[start:pos]))
        except IndexError:
            return None
        width, height, maxval = fields
        # the header ends with exactly one whitespace byte, then the
        # raster: width·height·channels samples (2 bytes each when
        # maxval > 255).  Requiring the raster to actually be present
        # rejects prose that merely starts "P6 10 20 30 ..." — a
        # payload that passes THIS check is a complete, valid binary
        # PPM byte stream.
        sample_bytes = 2 if maxval > 255 else 1
        raster_end = pos + 1 + width * height * channels * sample_bytes
        if (
            0 < width <= 1_000_000
            and 0 < height <= 1_000_000
            and 0 < maxval < 65536
            and payload[pos : pos + 1] in (b" ", b"\t", b"\r", b"\n")
            and raster_end <= len(payload)
        ):
            return ("ppm" if channels == 3 else "pgm", width, height, channels)
    return None


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
            # normalize NULL payloads once; every stat below shares it
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            headers = [parse_image_header(p) for p in payloads]
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
                    "fmt": [h[0] if h else None for h in headers],
                    "width": pd.array(
                        [h[1] if h else None for h in headers], dtype="Int32"
                    ),
                    "height": pd.array(
                        [h[2] if h else None for h in headers], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [h[3] if h else None for h in headers], dtype="Int32"
                    ),
                }
            )
            yield out

    return binary_df.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, src_bytes int"
)

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_offset bigint, frame_payload binary"
)


def resize_images(
    binary_df: DataFrame, width: int, height: int, partitions: int | None = None
) -> DataFrame:
    """Resize plumbing: one output row per input image, fixed target
    dims, payload replaced by the resized encoding.

    STUB decode: the fake "resize" emits a deterministic
    ``width*height``-byte payload derived from the source bytes
    (tiling), so tests can assert exact output; swap the marked line
    for a real ``PIL.Image.resize`` on a production cluster.  The
    Spark shape is the real part: optional repartition by ``doc_id``
    first (decode cost is per-image, not per-byte — balance images
    across tasks, same reasoning as the dedup explode), Arrow batches
    through ``mapInPandas``, binary in → binary out.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                # STUB: replace with PIL decode->resize->encode
                fake = (b * (target // max(1, len(b)) + 1))[:target] if b else bytes(target)
                out_payloads.append(fake)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                    "src_bytes": pdf["n_bytes"],
                }
            )

    df = binary_df
    if partitions is not None:
        df = df.repartition(partitions, "doc_id")
    return df.mapInPandas(do_resize, schema=RESIZE_SCHEMA)


def sample_frames(
    binary_df: DataFrame, frame_bytes: int, every_kth: int = 1
) -> DataFrame:
    """Frame sampling plumbing: 1 → N row expansion per video payload.

    Treats the payload as a sequence of fixed-size ``frame_bytes``
    chunks (the stub stand-in for container demux) and keeps every
    k-th chunk.  The Spark shape is the real part: ``mapInPandas``
    yielding MORE rows than its input batch — the fan-out a real
    demuxer produces — with ``frame_offset`` preserving provenance.
    Swap the chunking loop for ffmpeg/pyav on a production cluster.
    """

    def demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, every_kth):
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * frame_bytes)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_offset": offs,
                    "frame_payload": frames,
                }
            )

    return binary_df.mapInPandas(demux, schema=FRAME_SCHEMA)
