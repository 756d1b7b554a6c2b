"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio libraries, so the *decode kernels* are
stubs: ``decode_image`` raises NotImplementedError unless a decoder is
importable, and ``fake_feature_extract`` is a deterministic stand-in
used by tests. Everything around the kernel — schema, batch iteration
via ``mapInPandas``, partition sizing, metadata struct — is real and is
the part that matters at 100TB:

- binary payloads ride in the DataFrame as ``binary`` columns; Spark
  shuffles them like any other column, so keep them OUT of shuffle keys
  and project them away before any join/groupBy that doesn't need the
  bytes.
- per-batch Python cost is amortized by Arrow (one FFI crossing per
  ~10k rows, not per row).
- decode is mapInPandas (1 input row → 0..n output rows) so frame
  sampling and failed-decode drops need no second pass.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("format", StringType(), True),  # e.g. png, wav, mp4
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha16", StringType(), True),
        StructField("fake_width", IntegerType(), True),
        StructField("fake_height", IntegerType(), True),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_col: str, media_type: str = "image", fmt: str = "bin") -> DataFrame:
    """Wrap an existing binary/string column into the canonical media
    schema (test tables fake payloads from document text)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        content.alias("content"),
        F.lit(fmt).alias("format"),
        F.length(content).cast("long").alias("n_bytes"),
    )


def decode_image(content: bytes) -> "object":
    """Real image decode — STUB. The runtime has no PIL/cv2; wire one
    of them in here when available."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decoding requires PIL/cv2, not present in this runtime"
        ) from exc


def _fake_dims(digest: str) -> tuple[int, int]:
    """Deterministic fake width/height from the content digest."""
    return (int(digest[:4], 16) % 1920 + 1, int(digest[4:8], 16) % 1080 + 1)


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Feature extraction over media batches via ``mapInPandas``.

    The kernel is a deterministic fake (sha-based pseudo-dimensions)
    standing in for decode+inspect; the Spark plumbing — Arrow batch
    iteration, output schema, 1→0..n row mapping (undecodable rows are
    dropped, mirroring the reference's drop-malformed policy,
    mapper.py:49-57) — is the real contract under test.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = row.content
                if content is None:  # undecodable → drop, like DROPMALFORMED
                    continue
                digest = hashlib.sha256(bytes(content)).hexdigest()
                w, h = _fake_dims(digest)
                out.append(
                    (row.media_id, row.media_type, row.n_bytes, digest[:16], w, h)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(_kernel, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling plumbing (1 video → n frames) via mapInPandas.

    Fake kernel: slices the payload every ``every_n_bytes`` as stand-in
    "frames"; a real implementation would demux with pyav/ffmpeg. The
    fan-out shape (row explosion inside the Arrow batch, no shuffle)
    is the production pattern.
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_bytes", BinaryType(), True),
        ]
    )

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                content = row.content
                if content is None:
                    continue
                blob = bytes(content)
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    rows.append((row.media_id, i, blob[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(_kernel, schema=schema)
