"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

``decode_image`` natively parses binary PPM/PGM (P5/P6) and
uncompressed 24/32-bit BMP with numpy alone — real pixel data, real
stats (``extract_image_features``). Compressed formats (PNG/JPEG) fall
through to PIL when importable and otherwise raise a documented
NotImplementedError: the container ships no image/audio codecs, so
``extract_features`` keeps a deterministic sha-based fake kernel for
tests that only exercise the plumbing. Everything around the kernels —
schema, batch iteration via ``mapInPandas``, partition sizing, metadata
struct — is the part that matters at 100TB:

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
    DoubleType,
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


def _decode_pnm(content: bytes) -> "np.ndarray":
    """Parse binary PGM (P5) / PPM (P6): header tokens (width, height,
    maxval; '#' comments allowed) then a raw raster, 1 byte/sample for
    maxval <= 255. Returns (h, w) or (h, w, 3) uint8."""
    import numpy as np

    magic = content[:2]
    channels = 3 if magic == b"P6" else 1
    # tokenize the header: whitespace-separated ints, '#'-to-EOL comments
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(content):
            raise ValueError("truncated PNM header")
        c = content[pos : pos + 1]
        if c == b"#":
            pos = content.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(content) and not content[end : end + 1].isspace():
                end += 1
            tokens.append(int(content[pos:end]))
            pos = end
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    pos += 1  # exactly one whitespace byte separates header and raster
    n = width * height * channels
    raster = np.frombuffer(content, dtype=np.uint8, count=n, offset=pos)
    shape = (height, width, 3) if channels == 3 else (height, width)
    return raster.reshape(shape)


def _decode_bmp(content: bytes) -> "np.ndarray":
    """Parse an uncompressed 24/32-bit BMP (BITMAPINFOHEADER family):
    little-endian header fields, bottom-up rows padded to 4 bytes,
    BGR(A) storage. Returns (h, w, 3) uint8 RGB."""
    import struct

    import numpy as np

    if len(content) < 54:
        raise ValueError("truncated BMP header")
    pixel_offset = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * height, offset=pixel_offset
    ).reshape(height, stride)[:, : width * nch].reshape(height, width, nch)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped


def decode_image(content: bytes) -> "np.ndarray | object":
    """Real image decode. Numpy-only parsers handle binary PPM/PGM
    (P5/P6) and uncompressed 24/32-bit BMP — enough to run genuine
    pixel-stat extraction with zero dependencies. Other formats fall
    through to PIL when importable, else raise NotImplementedError
    (the runtime has no PIL/cv2; wire one in when available)."""
    content = bytes(content)
    if content[:2] in (b"P5", b"P6"):
        return _decode_pnm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(content))
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "only PPM/PGM/BMP decode natively; other formats need PIL/cv2, "
            "not present in this runtime"
        ) from exc


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("mean_pixel", DoubleType(), True),
        StructField("min_pixel", IntegerType(), True),
        StructField("max_pixel", IntegerType(), True),
    ]
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode + feature extraction over media batches: each
    payload is parsed by ``decode_image`` (PPM/PGM/BMP) and reduced to
    pixel statistics. Same Arrow/mapInPandas contract as
    ``extract_features`` — 1 input row → 0..1 output rows, undecodable
    payloads dropped (the reference's drop-malformed policy,
    mapper.py:49-57) — but the kernel is no longer a fake."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.content is None:
                    continue
                try:
                    img = decode_image(row.content)
                except (ValueError, NotImplementedError):
                    continue  # undecodable -> drop, like DROPMALFORMED
                arr = np.asarray(img)
                h, w = arr.shape[:2]
                c = 1 if arr.ndim == 2 else arr.shape[2]
                out.append(
                    (
                        row.media_id,
                        w,
                        h,
                        c,
                        round(float(arr.mean()), 6),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(_kernel, schema=IMAGE_STATS_SCHEMA)


def decode_audio(content: bytes) -> "tuple":
    """Real audio decode — numpy-only WAV (RIFF) parser for
    uncompressed PCM16: walks the chunk list (fmt / data; unknown
    chunks skipped, odd sizes padded per RIFF), validates
    audio_format=1 and 16-bit samples, and returns
    (samples[n_frames, n_channels] int16, sample_rate). Compressed
    audio needs a codec library, absent here → NotImplementedError."""
    import struct

    import numpy as np

    content = bytes(content)
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes natively; other audio formats "
            "need a codec library, not present in this runtime"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    n = len(data) // (2 * n_channels) * n_channels
    samples = np.frombuffer(data, dtype="<i2", count=n).reshape(-1, n_channels)
    return samples, sample_rate


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", IntegerType(), True),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode + feature extraction: each payload is parsed
    by ``decode_audio`` (RIFF PCM16) and reduced to duration and
    amplitude statistics (RMS / peak over all channels). Same Arrow
    mapInPandas contract as the image tier; undecodable payloads drop
    like DROPMALFORMED."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.content is None:
                    continue
                try:
                    samples, rate = decode_audio(row.content)
                except (ValueError, NotImplementedError):
                    continue
                x = samples.astype(np.float64)
                n_frames = samples.shape[0]
                out.append(
                    (
                        row.media_id,
                        int(rate),
                        int(samples.shape[1]),
                        n_frames,
                        round(n_frames / rate, 6),
                        round(float(np.sqrt((x * x).mean())), 6) if n_frames else 0.0,
                        # abs on the WIDENED copy: np.abs wraps the
                        # int16 full-scale sample (abs(-32768) ->
                        # -32768), silently skipping the true peak —
                        # caught by the r12 sf0.1 gate sweep, where
                        # 10x more blobs finally hit 0x0080
                        int(np.abs(x).max()) if n_frames else 0,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(_kernel, schema=AUDIO_STATS_SCHEMA)


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


def decode_video(content: bytes) -> "tuple":
    """Real video decode — numpy-only parser for the RAWV toy
    container (magic ``RAWV`` + little-endian u16 width/height/fps/
    n_frames + concatenated raw RGB24 frames). Uncompressed raw video
    is what a demuxer hands a stats kernel anyway; real codecs need
    pyav/ffmpeg, absent in this runtime, and fall through to
    NotImplementedError like decode_image does for JPEG.

    Returns (width, height, fps, frames) with frames shaped
    (n_frames, h, w, 3) uint8."""
    import struct

    import numpy as np

    content = bytes(content)
    if content[:4] != b"RAWV":
        raise NotImplementedError(
            "only the RAWV raw-RGB container decodes natively; compressed "
            "codecs need pyav/ffmpeg, not present in this runtime"
        )
    if len(content) < 12:
        raise ValueError("truncated RAWV header")
    w, h, fps, n = struct.unpack_from("<HHHH", content, 4)
    need = w * h * 3
    frames = np.frombuffer(
        content, dtype=np.uint8, count=n * need, offset=12
    ).reshape(n, h, w, 3)
    return w, h, fps, frames


VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("fps", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_pixel", DoubleType(), True),
        StructField("max_pixel", IntegerType(), True),
    ]
)


def extract_video_features(media: DataFrame, sample_every: int = 2) -> DataFrame:
    """REAL video decode + temporal frame sampling: each RAWV payload
    is parsed by ``decode_video``, every ``sample_every``-th frame is
    kept (the fps-aware sampling a caption/embedding stage feeds on),
    and each sampled frame reduces to pixel stats. 1 row → n rows
    inside the Arrow batch — the fan-out never shuffles; undecodable
    payloads drop (DROPMALFORMED policy)."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.content is None:
                    continue
                try:
                    w, h, fps, frames = decode_video(row.content)
                except (ValueError, NotImplementedError):
                    continue
                for idx in range(0, frames.shape[0], sample_every):
                    f = frames[idx]
                    out.append(
                        (
                            row.media_id,
                            idx,
                            int(frames.shape[0]),
                            fps,
                            w,
                            h,
                            round(float(np.asarray(f, dtype=np.float64).mean()), 6),
                            int(f.max()),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_STATS_SCHEMA.fields]
            )

    return media.mapInPandas(_kernel, schema=VIDEO_STATS_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def image_ahash(media: DataFrame, grid: tuple[int, int] = (8, 8)) -> DataFrame:
    """Perceptual average-hash (aHash) over REAL decoded images — the
    classic near-duplicate-image fingerprint: downscale to a
    ``grid`` of blocks, set bit i iff block i is brighter than the
    image mean. All arithmetic is INTEGER (bit i = block_sum *
    n_blocks > total_sum — no division, no float), so the hash is
    bit-reproducible across engines and platforms; two images with
    the same layout of light/dark regions collide regardless of
    uniform brightness shifts in the low bits. Arrow-batched
    mapInPandas, zero shuffle; images whose dimensions don't tile the
    grid (or that fail decode) drop, the DROPMALFORMED policy of the
    other kernels. Bit order is row-major (bit = row*grid_w + col)."""
    import numpy as np

    gh, gw = grid

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.content is None:
                    continue
                try:
                    img = decode_image(row.content)
                except (ValueError, NotImplementedError):
                    continue
                arr = np.asarray(img, dtype=np.int64)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w, c = arr.shape
                if h % gh or w % gw:
                    continue
                bh, bw = h // gh, w // gw
                g = arr.reshape(gh, bh, gw, bw, c).sum(axis=(1, 3, 4))
                total = int(g.sum())
                hashval = 0
                for i, bs in enumerate(g.reshape(-1)):
                    if int(bs) * (gh * gw) > total:
                        hashval |= 1 << i
                out.append((row.media_id, hashval))
            yield pd.DataFrame(
                out, columns=[f.name for f in AHASH_SCHEMA.fields]
            )

    return media.mapInPandas(_kernel, schema=AHASH_SCHEMA)


VAD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_windows", IntegerType(), False),
        StructField("n_voiced", IntegerType(), False),
        StructField("voiced_ratio", DoubleType(), True),
        StructField("max_energy", LongType(), True),
    ]
)


def audio_activity_windows(
    media: DataFrame,
    window: int = 16,
    energy_threshold: int = 5_700_000_000,
) -> DataFrame:
    """Energy-based voice-activity detection over REAL decoded PCM16:
    split each clip into fixed ``window``-sample frames (trailing
    partial frame dropped), mark a frame voiced iff its energy — the
    INTEGER sum of squared samples, channels summed — exceeds
    ``energy_threshold``, and emit per-clip counts, the voiced ratio,
    and the loudest frame's energy. All frame energies are exact
    int64 arithmetic (max 16 * 32768^2 * channels per frame, far
    below 2^63), so the report is bit-reproducible. Arrow-batched
    mapInPandas, zero shuffle; undecodable payloads drop
    (DROPMALFORMED policy). The window segmentation here is the same
    1-row → n-frame fan-in every diarization / speech-detect stage
    uses before a model sees the audio."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.content is None:
                    continue
                try:
                    samples, _rate = decode_audio(row.content)
                except (ValueError, NotImplementedError):
                    continue
                x = samples.astype(np.int64)
                n = (x.shape[0] // window) * window
                if n == 0:
                    out.append((row.media_id, 0, 0, 0.0, 0))
                    continue
                frames = (x[:n] ** 2).sum(axis=1).reshape(-1, window)
                energies = frames.sum(axis=1)
                voiced = int((energies > energy_threshold).sum())
                out.append(
                    (
                        row.media_id,
                        int(energies.shape[0]),
                        voiced,
                        round(voiced / energies.shape[0], 6),
                        int(energies.max()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in VAD_SCHEMA.fields]
            )

    return media.mapInPandas(_kernel, schema=VAD_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("n_cuts", IntegerType(), False),
        StructField("n_scenes", IntegerType(), False),
        StructField("max_diff", LongType(), True),
    ]
)


def video_scene_cuts(media: DataFrame, diff_threshold: int = 100) -> DataFrame:
    """Scene-change detection over REAL decoded video: consecutive
    frames whose absolute pixel difference — the INTEGER sum of
    |a - b| over every subpixel — exceeds ``diff_threshold`` mark a
    cut; scenes = cuts + 1. The shot-segmentation pass a video corpus
    runs before per-scene captioning/embedding, reduced to its
    engine-shaped core: 1 clip row in, 1 summary row out, all
    arithmetic exact int64 so the report is bit-reproducible.
    Arrow-batched mapInPandas, zero shuffle; undecodable payloads
    drop (DROPMALFORMED), zero/one-frame clips report no cuts and
    one scene."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.content is None:
                    continue
                try:
                    _w, _h, _fps, frames = decode_video(row.content)
                except (ValueError, NotImplementedError):
                    continue
                x = frames.astype(np.int64).reshape(frames.shape[0], -1)
                if x.shape[0] < 2:
                    out.append((row.media_id, int(x.shape[0]), 0, 1, 0))
                    continue
                diffs = np.abs(x[1:] - x[:-1]).sum(axis=1)
                cuts = int((diffs > diff_threshold).sum())
                out.append(
                    (
                        row.media_id,
                        int(x.shape[0]),
                        cuts,
                        cuts + 1,
                        int(diffs.max()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in SCENE_SCHEMA.fields]
            )

    return media.mapInPandas(_kernel, schema=SCENE_SCHEMA)
