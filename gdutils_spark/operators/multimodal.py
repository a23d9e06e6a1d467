"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Image and audio *header* decoding is real and pure-Python — PNG IHDR,
JPEG SOFn marker scan, GIF screen descriptor, BMP info header, WAV RIFF
chunk walk — no imaging libraries required. Pixel/sample decoding (which
genuinely needs PIL/ffmpeg, absent in this container) stays gated behind
``NotImplementedError`` in :func:`sample_frames`'s real path.

Scale design:

* payloads stay in executors — never collected; ``mapInPandas`` streams
  Arrow batches, so peak memory is one batch of binaries, not a partition.
* ``spark.sql.files.maxPartitionBytes`` (or an explicit ``repartition``)
  controls how many blobs land per task; for 100 MB videos use
  ``maxRecordsPerBatch`` to keep batches small.
* metadata lives in plain columns so filters on (format, width, dur)
  prune BEFORE any decode runs.
* parser helpers are built by factories and captured as closure locals,
  so cloudpickle ships them BY VALUE — executor Python workers need no
  ``gdutils_spark`` import (addPyFile shipping is defense in depth, not
  a requirement).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, format string, detected string, width int, height int, "
    "n_bytes long"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, format string, detected string, sample_rate int, "
    "n_channels int, duration_s double, n_bytes long"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"

# SOFn markers that carry frame dimensions: C0-CF minus DHT (C4),
# JPG-extension (C8) and DAC (CC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _make_image_parser():
    """Factory for the pure-Python image header parser (nested so
    cloudpickle serializes it by value into UDF closures)."""

    jpeg_sof = _JPEG_SOF

    def parse_image_dims(payload: bytes | None):
        """(detected_format, width, height) from container headers alone:
        PNG IHDR (big-endian dims at offset 16), JPEG SOFn scan, GIF
        logical screen descriptor (little-endian), BMP BITMAPINFOHEADER
        (little-endian, height may be negative for top-down rows).
        Unrecognized/truncated payloads → (None, None, None)."""
        p = payload or b""
        if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(p[16:20], "big"),
                int.from_bytes(p[20:24], "big"),
            )
        if len(p) >= 4 and p[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(p):
                if p[i] != 0xFF:  # skip entropy-coded bytes / fill
                    i += 1
                    continue
                marker = p[i + 1]
                if marker == 0xFF:  # fill byte before marker
                    i += 1
                    continue
                if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                    i += 2  # standalone markers have no length field
                    continue
                seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
                if marker in jpeg_sof:
                    if i + 9 <= len(p):
                        return (
                            "jpeg",
                            int.from_bytes(p[i + 7 : i + 9], "big"),
                            int.from_bytes(p[i + 5 : i + 7], "big"),
                        )
                    break
                if seg_len < 2:
                    break
                i += 2 + seg_len
            return "jpeg", None, None
        if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
            return (
                "gif",
                int.from_bytes(p[6:8], "little"),
                int.from_bytes(p[8:10], "little"),
            )
        if len(p) >= 26 and p[:2] == b"BM":
            return (
                "bmp",
                int.from_bytes(p[18:22], "little", signed=True),
                abs(int.from_bytes(p[22:26], "little", signed=True)),
            )
        return None, None, None

    return parse_image_dims


#: module-level instance for direct (non-Spark) use and unit tests
parse_image_dims = _make_image_parser()


def _make_wav_parser():
    """Factory for the RIFF/WAVE chunk-walk parser (closure-shipped)."""

    def parse_wav_meta(payload: bytes | None):
        """(sample_rate, n_channels, duration_s) from the fmt/data chunks
        of a RIFF WAVE container; (None, None, None) if not a WAV."""
        p = payload or b""
        if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None, None, None
        rate = channels = byte_rate = data_size = None
        i = 12
        while i + 8 <= len(p):
            cid = p[i : i + 4]
            size = int.from_bytes(p[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 24 <= len(p):
                channels = int.from_bytes(p[i + 10 : i + 12], "little")
                rate = int.from_bytes(p[i + 12 : i + 16], "little")
                byte_rate = int.from_bytes(p[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
        dur = (
            data_size / byte_rate
            if data_size is not None and byte_rate
            else None
        )
        return rate, channels, dur

    return parse_wav_meta


parse_wav_meta = _make_wav_parser()


def decode_image_features(df: DataFrame) -> DataFrame:
    """Image feature extraction over ``mapInPandas``: real header decode
    (PNG/JPEG/GIF/BMP), no imaging libraries. ``detected`` is the format
    the *bytes* claim (vs the ``format`` metadata column — a mismatch is
    a data-quality signal); unparseable payloads keep the row with null
    dims so corrupt blobs are countable downstream."""

    parse = _make_image_parser()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "detected": pd.array(
                        [t[0] for t in parsed], dtype="string"
                    ),
                    "width": pd.array([t[1] for t in parsed], dtype="Int32"),
                    "height": pd.array([t[2] for t in parsed], dtype="Int32"),
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(op, IMAGE_FEATURES_SCHEMA)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """Audio metadata over ``mapInPandas``: real RIFF/WAVE chunk walk for
    sample rate, channel count and duration; non-WAV payloads keep the
    row with nulls (compressed formats need a codec library)."""

    parse = _make_wav_parser()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "detected": pd.array(
                        ["wav" if t[0] is not None else None for t in parsed],
                        dtype="string",
                    ),
                    "sample_rate": pd.array(
                        [t[0] for t in parsed], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [t[1] for t in parsed], dtype="Int32"
                    ),
                    "duration_s": pd.array(
                        [t[2] for t in parsed], dtype="Float64"
                    ),
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return df.where(F.col("kind") == "audio").mapInPandas(op, AUDIO_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 4, use_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one row per sampled frame (1→N mapInPandas).

    Frame *extraction* genuinely requires a video codec (pyav/ffmpeg,
    absent here), so the real path raises; the stub slices the payload
    deterministically so the 1→N row-explosion plumbing is exercised.
    Output explodes rows, so downstream repartitions by media_id if
    per-video locality matters."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                raise NotImplementedError("real frame sampling requires pyav/ffmpeg")
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = payload or b""
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(
                        p[i * every_n_bytes : (i + 1) * every_n_bytes]
                    )
            yield pd.DataFrame(out)

    return df.where(F.col("kind") == "video").mapInPandas(op, FRAME_SCHEMA)
