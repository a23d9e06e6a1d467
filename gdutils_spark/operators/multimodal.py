"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Image, audio AND video *container* decoding is real and pure-Python —
PNG IHDR (+ full pixel codec), JPEG SOFn marker scan, GIF screen
descriptor, BMP info header, WAV RIFF chunk walk, AVI RIFF walk
(header + movi frame chunks, so MJPEG frame extraction is a container
walk) — no media libraries required. Only inter-frame video codecs
(mp4/webm/h264), which genuinely need pyav/ffmpeg (absent in this
container), stay gated behind ``NotImplementedError`` in
:func:`sample_frames`'s real path.

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

PCM_STATS_SCHEMA = (
    "media_id long, n_samples long, sum_amp long, sumsq_amp long, "
    "peak int, mean_amp double, rms double"
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
            # a declared fmt size < 16 means the PCM fields below would
            # read the NEXT chunk's bytes as rate/channels — garbage
            # metadata from a malformed file; require the full PCM fmt
            if cid == b"fmt " and size >= 16 and i + 24 <= len(p):
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


def _make_pcm_parser():
    """Factory for the 16-bit PCM sample-statistics parser
    (closure-shipped). Walks the RIFF chunks to locate the ``data``
    payload, then decodes it as little-endian int16 samples."""

    def pcm_stats(payload: bytes | None):
        """(n_samples, sum, sum_of_squares, peak_abs) over the int16
        samples of a PCM WAV; None if the payload is not a RIFF WAVE.
        A trailing odd byte (malformed data chunk) is ignored, matching
        every practical decoder."""
        import numpy as np

        p = payload or b""
        if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            return None
        i = 12
        while i + 8 <= len(p):
            cid = p[i : i + 4]
            size = int.from_bytes(p[i + 4 : i + 8], "little")
            if cid == b"data":
                raw = p[i + 8 : i + 8 + size]
                n = len(raw) // 2
                a = np.frombuffer(raw[: 2 * n], dtype="<i2").astype(np.int64)
                if n == 0:
                    return 0, 0, 0, None
                return (
                    n,
                    int(a.sum()),
                    int((a * a).sum()),
                    int(np.abs(a).max()),
                )
            i += 8 + size + (size & 1)
        return None

    return pcm_stats


pcm_stats = _make_pcm_parser()


def audio_pcm_stats(df: DataFrame) -> DataFrame:
    """Real sample-level audio decode over ``mapInPandas``: int16 PCM
    amplitude statistics (count, exact integer sum / sum-of-squares,
    peak) plus mean and RMS. The integer aggregates are exact, and the
    two derived doubles are one IEEE division (+ one correctly-rounded
    ``sqrt``) over them — bit-identical in any engine, the same
    determinism contract as :func:`image_pixel_stats` for PNGs.

    Loudness/clipping stats are the standard triage signals an audio
    training pipeline filters on (silence ⇒ rms ≈ 0, clipping ⇒ peak at
    32767). Payloads never leave the executors; non-WAV rows keep their
    id with null stats so undecodable blobs stay countable."""

    parse = _make_pcm_parser()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            parsed = [parse(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.array(
                        [t[0] if t else None for t in parsed], dtype="Int64"
                    ),
                    "sum_amp": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int64"
                    ),
                    "sumsq_amp": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int64"
                    ),
                    "peak": pd.array(
                        [t[3] if t else None for t in parsed], dtype="Int32"
                    ),
                    "mean_amp": pd.array(
                        [t[1] / t[0] if t and t[0] else None for t in parsed],
                        dtype="Float64",
                    ),
                    "rms": pd.array(
                        [
                            math.sqrt(t[2] / t[0]) if t and t[0] else None
                            for t in parsed
                        ],
                        dtype="Float64",
                    ),
                }
            )

    return df.where(F.col("kind") == "audio").mapInPandas(op, PCM_STATS_SCHEMA)


THUMBNAIL_SCHEMA = (
    "media_id long, width int, height int, thumb_w int, thumb_h int, "
    "thumb_px_sum long, thumbnail binary"
)


def _make_png_codec():
    """Factory for a pure-stdlib PNG codec (zlib + struct — no imaging
    libraries): 8-bit grayscale / gray+alpha / RGB / RGBA, non-interlaced,
    all five scanline filters on decode, filter-0 on encode. Nested so
    cloudpickle ships it by value into UDF closures.

    This is what makes thumbnail generation
    (/root/reference/scripts/dac/create_thumbnails.sh:1+ — ImageMagick
    resize of downloaded plot PNGs) expressible here without PIL: PNG's
    pixel layer is just zlib over filtered scanlines."""
    import struct
    import zlib

    _CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
    # decompressed-pixel budget per blob: IHDR dims are UNTRUSTED input,
    # and zlib expands ~1000:1 — a 1 MB "image" claiming 30000x30000
    # RGBA would otherwise decompress ~3.6 GB inside the executor (a
    # classic decompression-bomb DoS against the whole ingest job).
    # 64 MiB covers any plot/thumbnail-sized PNG by orders of magnitude;
    # genuinely larger rasters belong in a tiled format, not this codec.
    _MAX_PIXEL_BYTES = 1 << 26

    def decode_png(p: bytes | None):
        """→ (width, height, channels, bytearray row-major pixels) or
        None for anything that isn't a supported 8-bit PNG — including
        structurally corrupt streams (declared chunk lengths past the
        payload end must yield None, never an exception: one bad blob
        must not fail the whole job) and decompression bombs: a declared
        pixel buffer beyond the 64 MiB budget yields None, and the IDAT
        inflate is CAPPED at what the declared dims need — an overlong
        stream is truncated there (decoders tolerate trailing data)
        instead of materializing."""
        p = p or b""
        if len(p) < 33 or p[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        w = h = None
        channels = None
        idat = bytearray()
        i = 8
        while i + 8 <= len(p):
            (length,) = struct.unpack(">I", p[i : i + 4])
            ctype = p[i + 4 : i + 8]
            if i + 8 + length > len(p):  # declared length past payload end
                return None
            data = p[i + 8 : i + 8 + length]
            if ctype == b"IHDR":
                if length < 13:
                    return None
                w, h = struct.unpack(">II", data[:8])
                depth, color, _comp, _filt, interlace = data[8:13]
                if depth != 8 or interlace != 0 or color not in _CHANNELS:
                    return None
                channels = _CHANNELS[color]
                if h * (w * channels + 1) > _MAX_PIXEL_BYTES:
                    return None  # bomb guard: untrusted dims, bounded RAM
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            i += 12 + length  # length + type + data + crc
        if not (w and h and channels and idat):
            return None
        stride = w * channels
        need = h * (stride + 1)
        # bounded decompression: cap output at the bytes the declared
        # dims need (+1 to detect overlong streams); an IDAT that would
        # expand further never allocates past the budget
        d = zlib.decompressobj()
        try:
            raw = d.decompress(bytes(idat), need + 1)
        except zlib.error:
            return None
        if len(raw) < need:
            return None
        out = bytearray(h * stride)
        prev = bytearray(stride)
        pos = 0
        for y in range(h):
            ftype = raw[pos]
            line = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            if ftype == 1:  # Sub
                for j in range(channels, stride):
                    line[j] = (line[j] + line[j - channels]) & 0xFF
            elif ftype == 2:  # Up
                for j in range(stride):
                    line[j] = (line[j] + prev[j]) & 0xFF
            elif ftype == 3:  # Average
                for j in range(stride):
                    left = line[j - channels] if j >= channels else 0
                    line[j] = (line[j] + ((left + prev[j]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for j in range(stride):
                    a = line[j - channels] if j >= channels else 0
                    b = prev[j]
                    c = prev[j - channels] if j >= channels else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                    line[j] = (line[j] + pred) & 0xFF
            elif ftype != 0:
                return None
            out[y * stride : (y + 1) * stride] = line
            prev = line
        return w, h, channels, out

    def encode_png(w: int, h: int, channels: int, pixels) -> bytes:
        """Filter-0 scanlines + one zlib stream, correct CRCs — a
        minimal but fully valid PNG writer."""
        color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
        stride = w * channels
        raw = bytearray()
        for y in range(h):
            raw.append(0)
            raw += pixels[y * stride : (y + 1) * stride]

        def chunk(ctype: bytes, data: bytes) -> bytes:
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b"")
        )

    return decode_png, encode_png


decode_png, encode_png = _make_png_codec()


def thumbnail_images(df: DataFrame, max_dim: int = 8) -> DataFrame:
    """Thumbnail generation over ``mapInPandas`` — the reference's
    ``create_thumbnails.sh`` (ImageMagick loop over downloaded plot
    PNGs) as one distributed pass with a pure-stdlib PNG codec.

    Shrink-only nearest-neighbor resize with deterministic integer
    arithmetic: if max(w, h) <= max_dim the image passes through at full
    size, else ``tw = max(1, w * max_dim // max(w, h))`` (same for th)
    and thumbnail pixel (x, y) samples source (x * w // tw, y * h // th)
    — every output is exactly reproducible in any engine, which is what
    lets the driver hash-check ``thumb_px_sum`` (sum of all thumbnail
    bytes) against an arithmetic SQL oracle. Payloads that aren't
    decodable 8-bit PNGs keep their row with null dims so corrupt blobs
    stay countable. Payloads never leave executors."""

    codec = _make_png_codec

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode, encode = codec()
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "thumb_w": [],
                "thumb_h": [],
                "thumb_px_sum": [],
                "thumbnail": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                dec = decode(payload)
                if dec is None:
                    for k in ("width", "height", "thumb_w", "thumb_h",
                              "thumb_px_sum", "thumbnail"):
                        out[k].append(None)
                    continue
                w, h, ch, px = dec
                mx = max(w, h)
                if mx <= max_dim:
                    tw, th = w, h
                else:
                    tw = max(1, w * max_dim // mx)
                    th = max(1, h * max_dim // mx)
                stride = w * ch
                tpx = bytearray(tw * th * ch)
                k = 0
                for y in range(th):
                    sy = y * h // th
                    row = sy * stride
                    for x in range(tw):
                        sx = x * w // tw
                        src = row + sx * ch
                        tpx[k : k + ch] = px[src : src + ch]
                        k += ch
                out["width"].append(w)
                out["height"].append(h)
                out["thumb_w"].append(tw)
                out["thumb_h"].append(th)
                out["thumb_px_sum"].append(int(sum(tpx)))
                out["thumbnail"].append(encode(tw, th, ch, tpx))
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "thumb_w": pd.array(out["thumb_w"], dtype="Int32"),
                    "thumb_h": pd.array(out["thumb_h"], dtype="Int32"),
                    "thumb_px_sum": pd.array(out["thumb_px_sum"], dtype="Int64"),
                    "thumbnail": out["thumbnail"],
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(op, THUMBNAIL_SCHEMA)


PIXEL_STATS_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "px_sum long, px_mean double, px_min int, px_max int"
)


def image_pixel_stats(df: DataFrame) -> DataFrame:
    """Pixel-level image statistics over ``mapInPandas`` — the
    feature-extraction step past header decoding: each 8-bit PNG is
    fully decoded (zlib + unfilter, :func:`decode_png`) and reduced to
    exact integer pixel aggregates (sum/min/max over every byte) plus
    the mean as ONE double division of exact ints — engine-reproducible,
    so a SQL oracle can predict every value for synthesized images.
    Payloads that aren't decodable 8-bit PNGs keep their row with null
    stats; payloads never leave executors."""

    codec = _make_png_codec

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode, _ = codec()
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "channels",
                "px_sum", "px_mean", "px_min", "px_max",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                dec = decode(payload)
                if dec is None:
                    for k in ("width", "height", "channels", "px_sum",
                              "px_mean", "px_min", "px_max"):
                        out[k].append(None)
                    continue
                w, h, ch, px = dec
                s = int(sum(px))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["px_sum"].append(s)
                out["px_mean"].append(s / len(px))
                out["px_min"].append(min(px))
                out["px_max"].append(max(px))
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "channels": pd.array(out["channels"], dtype="Int32"),
                    "px_sum": pd.array(out["px_sum"], dtype="Int64"),
                    "px_mean": pd.array(out["px_mean"], dtype="Float64"),
                    "px_min": pd.array(out["px_min"], dtype="Int32"),
                    "px_max": pd.array(out["px_max"], dtype="Int32"),
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(op, PIXEL_STATS_SCHEMA)


VIDEO_FEATURES_SCHEMA = (
    "media_id long, format string, detected string, width int, height int, "
    "fps double, n_frames int, n_bytes long"
)

FRAME_INDEX_SCHEMA = "media_id long, frame_idx int, offset long, n_bytes int"

#: cap on a declared RIFF chunk size — same decompression-bomb stance as
#: the PNG codec: a hostile header must not make the walker index
#: gigabytes it never scans (sizes beyond the payload are clamped anyway,
#: this bounds the per-chunk slice).
_AVI_MAX_CHUNK = 1 << 26  # 64 MiB


def _make_avi_parser():
    """Factory for the pure-Python AVI RIFF walker (closure-shipped).

    AVI is a RIFF container (the public msdn AVI RIFF spec): a ``hdrl``
    LIST holding the ``avih`` main header (frame period in µs, declared
    frame count, dimensions) and a ``movi`` LIST whose ``##dc``/``##db``
    sub-chunks ARE the frames. For MJPEG AVIs every ``##dc`` chunk is a
    complete JPEG, so walking the container IS frame extraction — no
    video codec involved. Inter-frame codecs (mp4/webm/h264) genuinely
    need pyav/ffmpeg and stay gated."""

    max_chunk = _AVI_MAX_CHUNK

    def parse_avi(payload: bytes | None):
        """``(usec_per_frame, declared_frames, width, height,
        [(frame_offset, frame_size), ...])`` from an AVI RIFF container;
        ``None`` if the payload is not RIFF/AVI. Truncated declared
        sizes clamp to the actual payload; ``rec `` grouping LISTs
        inside ``movi`` are walked transparently (one level — their
        only legal nesting)."""
        p = payload or b""
        if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
            return None
        usec = width = height = declared = None
        frames: list[tuple[int, int]] = []

        def is_frame(cid: bytes) -> bool:
            return cid[2:4] in (b"dc", b"db") and cid[:2].isdigit()

        def walk_movi(base: int, body: bytes) -> None:
            j = 4  # skip the 'movi'/'rec ' list type
            while j + 8 <= len(body):
                scid = body[j : j + 4]
                ssz = min(
                    int.from_bytes(body[j + 4 : j + 8], "little"), max_chunk
                )
                ssz = min(ssz, len(body) - j - 8)
                if scid == b"LIST" and body[j + 8 : j + 12] == b"rec ":
                    walk_movi(base + j + 8, body[j + 8 : j + 8 + ssz])
                elif is_frame(scid):
                    frames.append((base + j + 8, ssz))
                j += 8 + ssz + (ssz & 1)

        end = min(len(p), 8 + int.from_bytes(p[4:8], "little"))
        i = 12
        while i + 8 <= end:
            cid = p[i : i + 4]
            size = min(int.from_bytes(p[i + 4 : i + 8], "little"), max_chunk)
            size = min(size, len(p) - i - 8)
            if cid == b"LIST" and size >= 4:
                ltype = p[i + 8 : i + 12]
                body = p[i + 8 : i + 8 + size]
                if ltype == b"hdrl":
                    j = 4
                    while j + 8 <= len(body):
                        scid = body[j : j + 4]
                        ssz = int.from_bytes(body[j + 4 : j + 8], "little")
                        if scid == b"avih" and ssz >= 40 and j + 48 <= len(body):
                            h = body[j + 8 : j + 8 + ssz]
                            usec = int.from_bytes(h[0:4], "little")
                            declared = int.from_bytes(h[16:20], "little")
                            width = int.from_bytes(h[32:36], "little")
                            height = int.from_bytes(h[36:40], "little")
                        j += 8 + ssz + (ssz & 1)
                elif ltype == b"movi":
                    walk_movi(i + 8, body)
            i += 8 + size + (size & 1)
        return usec, declared, width, height, frames

    return parse_avi


parse_avi = _make_avi_parser()


def _make_avi_builder():
    """Factory for the AVI muxer (closure-shipped like the parsers, so
    registry fixtures can synthesize containers on executors without a
    ``gdutils_spark`` import there)."""
    import struct

    def build_avi(
        frames: list,
        width: int,
        height: int,
        usec_per_frame: int = 40000,
        fourcc: bytes = b"00dc",
    ) -> bytes:
        """Encode frame payloads as a minimal valid AVI RIFF container
        (RIFF/AVI → LIST hdrl(avih + LIST strl(strh+strf)) → LIST movi)
        — the write-side twin of :func:`parse_avi`, used by the registry
        fixtures and as a container muxer for already-encoded frames
        (e.g. JPEGs → MJPEG AVI). Word-aligned chunks per the RIFF rule;
        total size is exactly ``224 + Σ(8 + len(frame) + len(frame)%2)``
        (12 RIFF + 200 hdrl + 12 movi header), which the registry
        oracles predict arithmetically."""

        def chunk(cid: bytes, data: bytes) -> bytes:
            return (
                cid + struct.pack("<I", len(data)) + data
                + (b"\x00" * (len(data) & 1))
            )

        def lst(ltype: bytes, data: bytes) -> bytes:
            return chunk(b"LIST", ltype + data)

        avih = struct.pack(
            "<14I",
            usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0,
            width, height, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"MJPG", 0, 0, 0, 0, 1,
            1_000_000 // max(usec_per_frame, 1),
            0, len(frames), 0, 0xFFFFFFFF, 0, 0, 0, width, height,
        )
        strf = struct.pack(
            "<IiiHHIIiiII",
            40, width, height, 1, 24, 0, width * height * 3, 0, 0, 0, 0,
        )
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )
        movi = lst(b"movi", b"".join(chunk(fourcc, f) for f in frames))
        return chunk(b"RIFF", b"AVI " + hdrl + movi)

    return build_avi


build_avi = _make_avi_builder()


def decode_video_features(df: DataFrame) -> DataFrame:
    """Video metadata extraction over ``mapInPandas`` — the video twin
    of :func:`decode_image_features`/:func:`decode_audio_features`:
    real ``avih`` header parse (dimensions, fps = 1e6/µs-per-frame, one
    IEEE division) plus a ``movi`` walk so ``n_frames`` is the COUNTED
    frame-chunk number, not the header's claim (corrupt headers can't
    lie about it). Non-AVI payloads keep their row with NULL fields —
    the same unrecognized-container convention as the image parser."""

    parse = _make_avi_parser()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "format", "detected", "width", "height",
                "fps", "n_frames", "n_bytes",
            )}
            for mid, payload, fmt in zip(
                pdf["media_id"], pdf["payload"], pdf["format"]
            ):
                meta = parse(payload)
                out["media_id"].append(mid)
                out["format"].append(fmt)
                if meta is None:
                    out["detected"].append(None)
                    for k in ("width", "height", "fps", "n_frames"):
                        out[k].append(None)
                else:
                    usec, _declared, w, h, frames = meta
                    out["detected"].append("avi")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["fps"].append(
                        1_000_000 / usec if usec else None
                    )
                    out["n_frames"].append(len(frames))
                out["n_bytes"].append(len(payload or b""))
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "format": out["format"],
                    "detected": out["detected"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "fps": pd.array(out["fps"], dtype="Float64"),
                    "n_frames": pd.array(out["n_frames"], dtype="Int32"),
                    "n_bytes": pd.array(out["n_bytes"], dtype="Int64"),
                }
            )

    return df.where(F.col("kind") == "video").mapInPandas(
        op, VIDEO_FEATURES_SCHEMA
    )


def video_frame_index(df: DataFrame) -> DataFrame:
    """Per-frame container index (``media_id, frame_idx, offset,
    n_bytes``) from the ``movi`` walk alone — no payload copy, no
    decode: the cheap scan that drives Catalyst-side per-frame
    analytics (scene-cut detection on frame-size deltas, bitrate
    profiles, sampling plans) without ever shipping pixel bytes
    through Python again. Non-AVI payloads contribute no rows."""

    parse = _make_avi_parser()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "offset": [], "n_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = parse(payload)
                if meta is None:
                    continue
                for i, (off, sz) in enumerate(meta[4]):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["offset"].append(off)
                    out["n_bytes"].append(sz)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="Int64"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="Int32"),
                    "offset": pd.array(out["offset"], dtype="Int64"),
                    "n_bytes": pd.array(out["n_bytes"], dtype="Int32"),
                }
            )

    return df.where(F.col("kind") == "video").mapInPandas(op, FRAME_INDEX_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 4,
    use_stub: bool = True,
    stride: int = 1,
) -> DataFrame:
    """Video frame sampling: one row per sampled frame (1→N mapInPandas).

    The REAL path (``use_stub=False``) walks the AVI RIFF container:
    ``movi``'s ``##dc``/``##db`` chunks are the frames, so extraction is
    a container walk — for MJPEG AVIs each emitted ``frame_payload`` is
    a complete standalone JPEG. ``stride``/``max_frames`` pick every
    stride-th frame up to the cap; ``frame_idx`` is the SOURCE frame
    index, so downstream can map back to timestamps via fps. Non-AVI
    video containers (mp4/webm: inter-frame codecs) raise
    ``NotImplementedError`` — that part genuinely requires pyav/ffmpeg.

    The stub path slices the payload blind (kept for plumbing tests and
    for corpora of already-flattened byte streams). Output explodes
    rows, so downstream repartitions by media_id if per-video locality
    matters."""

    parse = _make_avi_parser()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = payload or b""
                if use_stub:
                    for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["frame_payload"].append(
                            p[i * every_n_bytes : (i + 1) * every_n_bytes]
                        )
                    continue
                meta = parse(p)
                if meta is None:
                    raise NotImplementedError(
                        "real frame sampling: payload for media_id="
                        f"{mid} is not an AVI RIFF container — mp4/webm "
                        "inter-frame codecs require pyav/ffmpeg"
                    )
                frames = meta[4]
                taken = 0
                for i in range(0, len(frames), max(stride, 1)):
                    if taken >= max_frames:
                        break
                    off, sz = frames[i]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(p[off : off + sz])
                    taken += 1
            yield pd.DataFrame(out)

    return df.where(F.col("kind") == "video").mapInPandas(op, FRAME_SCHEMA)


DHASH_SCHEMA = (
    "media_id long, width int, height int, b0 int, b1 int, b2 int, b3 int"
)


def image_dhash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per image — the classic
    near-duplicate fingerprint: point-sample a ``(grid+1) x grid``
    luminance lattice from the decoded pixels and emit one bit per
    horizontally adjacent sample pair (``lum(x+1, y) > lum(x, y)``) —
    ``grid*grid`` bits total, robust to re-encoding and mild resizes
    because only local brightness GRADIENTS survive into the hash.

    Determinism contract (what lets a SQL oracle predict the hash for
    synthesized images): sample positions are exact integer lattice
    arithmetic ``sx = x*w // (grid+1)``, ``sy = y*h // grid`` (the
    thumbnail_images convention — no float resampling kernels), and
    luminance is the integer mean over channels (``sum // ch``). Bits
    pack COLUMN-major (``k = x*grid + y``) into ``grid*grid/16``
    16-bit bands (b0..b3 for the default grid): a localized image edit
    perturbs adjacent sample COLUMNS, so column-major packing confines
    the flipped bits to neighboring bands and keeps the others exact —
    which is precisely what the banded near-dup join needs. Undecodable
    payloads keep their row with null dims/bands (countable corrupt
    blobs); payloads never leave executors."""
    if grid < 2 or (grid * grid) % 16 != 0:
        raise ValueError(f"image_dhash: grid={grid} must be >=2 with grid*grid % 16 == 0")
    n_bands = (grid * grid) // 16
    if n_bands != 4:
        raise ValueError("image_dhash: only grid=8 (4 bands) is wired to DHASH_SCHEMA")
    codec = _make_png_codec
    g = grid

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode, _ = codec()
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "b0", "b1", "b2", "b3")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                dec = decode(payload)
                if dec is None:
                    for k in ("width", "height", "b0", "b1", "b2", "b3"):
                        out[k].append(None)
                    continue
                w, h, ch, px = dec
                stride = w * ch
                lum = [
                    [
                        sum(
                            px[(y * h // g) * stride + (x * w // (g + 1)) * ch + c]
                            for c in range(ch)
                        )
                        // ch
                        for y in range(g)
                    ]
                    for x in range(g + 1)
                ]
                bands = [0, 0, 0, 0]
                for x in range(g):
                    for y in range(g):
                        if lum[x + 1][y] > lum[x][y]:
                            k = x * g + y
                            bands[k // 16] |= 1 << (k % 16)
                out["width"].append(w)
                out["height"].append(h)
                for i in range(4):
                    out[f"b{i}"].append(bands[i])
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "b0": pd.array(out["b0"], dtype="Int32"),
                    "b1": pd.array(out["b1"], dtype="Int32"),
                    "b2": pd.array(out["b2"], dtype="Int32"),
                    "b3": pd.array(out["b3"], dtype="Int32"),
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(op, DHASH_SCHEMA)


def dhash_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 16,
    stage_path: str | None = None,
    max_band_freq: int | None = 1024,
) -> DataFrame:
    """Near-duplicate image pairs from :func:`image_dhash` output —
    banded Hamming LSH, the exact-for-Hamming analogue of the MinHash
    band trick: two hashes within ``max_hamming`` of each other over 64
    bits CAN still disagree in every 16-bit band, so candidates are
    pairs sharing AT LEAST ONE exact band (probabilistic recall, like
    every banded LSH in this engine — with <=16 flipped bits confined
    to <=2 adjacent bands by the column-major packing, locality-edited
    images are always recalled), then the exact popcount filter keeps
    pairs at ``hamming <= max_hamming``. Output: ``(media_id_a,
    media_id_b, hamming)``, each unordered pair once (``a < b``).

    Plan shape: melt to (band_idx, band_val) — 4 rows per image — ONE
    shuffle on the band key, within-bucket self-pairing, distinct, then
    the xor/bit_count verify runs as a Catalyst post-filter on the
    candidate rows. Degenerate bands (e.g. all-zero hashes from flat
    images) create hot buckets exactly like empty-shingle MinHash
    bands — the quadratic blow-up is in the DATA, not the plan.
    ``max_band_freq`` is the skew guard (the ``max_shingle_freq``
    convention from ``dedup.minhash_lsh_pairs``): band VALUES occurring
    in more than that many images are excluded from CANDIDATE
    generation — f images sharing a flat-region band otherwise put f²
    candidate rows in one bucket. Emitted hammings stay exact; only
    recall changes, and only for pairs whose EVERY shared band is hot
    (images similar solely through flat regions stop colliding).
    The default (1024) is MEASURED, not stylistic
    (tools/dhash_hot_band_probe.py: 2k identical flat images in a 5k
    corpus → all-zero bands at freq >2000; guard off = 7.0 s / 2.64M
    output pairs, 2M of them the one flat cluster's f² self-pairs;
    guard 1024 = 2.8 s / 126k pairs — and the flat cluster's pairs are
    exact duplicates, which belong to hash-groupBy exact dedup, not a
    pairwise near-dup report). Above 1024 one band value alone emits
    >0.5M candidate rows into a single bucket. Pass ``None`` to
    disable when a corpus legitimately clusters through flat regions.

    The melted hash table feeds both self-join sides (plus the band
    frequency census when the guard is on); without reuse the PNG
    decode upstream would run twice. ``stage_path=None`` (default)
    memory-caches it for the call (4 small rows per image), and the
    result is local-checkpointed so the cache can drop before returning;
    at 100 TB pass ``stage_path`` to stage the hashes as parquet once —
    same convention as ``similarity.lsh_near_dup_pairs``."""
    bands = F.array(*[
        F.struct(F.lit(i).alias("band_idx"), F.col(f"b{i}").alias("band_val"))
        for i in range(4)
    ])
    melted = (
        hashes.where(F.col("b0").isNotNull())
        .select("media_id", "b0", "b1", "b2", "b3", F.explode(bands).alias("bd"))
        .select("media_id", "b0", "b1", "b2", "b3", "bd.band_idx", "bd.band_val")
    )
    if stage_path is not None:
        melted.write.mode("overwrite").parquet(stage_path)
        melted = hashes.sparkSession.read.parquet(stage_path)
    else:
        melted = melted.persist()
    cached = melted  # unpersist handle (the guard reassigns `melted`)
    if max_band_freq is not None:
        cold_bands = (
            melted.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("__f"))
            .where(F.col("__f") <= F.lit(int(max_band_freq)))
            .select("band_idx", "band_val")
        )
        melted = melted.join(cold_bands, ["band_idx", "band_val"], "left_semi")
    a = melted.select(
        F.col("band_idx"), F.col("band_val"),
        F.col("media_id").alias("media_id_a"),
        *[F.col(f"b{i}").alias(f"a{i}") for i in range(4)],
    )
    b = melted.select(
        F.col("band_idx"), F.col("band_val"),
        F.col("media_id").alias("media_id_b"),
        *[F.col(f"b{i}").alias(f"b{i}_") for i in range(4)],
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("media_id_a") < F.col("media_id_b"))
        .drop("band_idx", "band_val")
        .dropDuplicates(["media_id_a", "media_id_b"])
    )
    if stage_path is None:
        # materialize the candidate pairs past the cache (ids + 8 small
        # ints — collision-bounded), then drop the cache so repeated
        # calls don't accumulate storage; the popcount verify below
        # stays a lazy codegen filter over the checkpoint (the
        # lsh_near_dup_pairs convention)
        cand = cand.localCheckpoint(eager=True)
        cached.unpersist()
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}_"))) for i in range(4)
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("media_id_a", "media_id_b", "hamming")
    )
