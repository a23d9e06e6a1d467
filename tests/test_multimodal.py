"""Multimodal plumbing: real header parsing, mapInPandas batching, gating.

Fixtures are hand-built byte streams with known dimensions — the parsers
must recover them from the actual container layout (offsets, endianness),
not from any side channel.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from gdutils_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    build_avi,
    decode_audio_features,
    decode_image_features,
    decode_video_features,
    parse_avi,
    parse_image_dims,
    parse_wav_meta,
    sample_frames,
    video_frame_index,
)


def make_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II5B", w, h, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def make_jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(8)
    # DHT before SOF0 ensures the scan must skip non-SOF segments
    dht = b"\xff\xc4" + struct.pack(">H", 5) + bytes(3)
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 3) + bytes(2)
    return b"\xff\xd8" + app0 + dht + sof0 + b"\xff\xd9"


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + bytes(3)


def make_bmp(w: int, h: int) -> bytes:
    return b"BM" + bytes(16) + struct.pack("<ii", w, h) + bytes(10)


def make_wav(rate: int, channels: int, seconds: float) -> bytes:
    byte_rate = rate * channels * 2
    data = bytes(int(byte_rate * seconds))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parse_image_dims_all_formats():
    assert parse_image_dims(make_png(640, 480)) == ("png", 640, 480)
    assert parse_image_dims(make_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    assert parse_image_dims(make_gif(320, 200)) == ("gif", 320, 200)
    assert parse_image_dims(make_bmp(800, 600)) == ("bmp", 800, 600)
    # top-down BMP stores negative height
    assert parse_image_dims(make_bmp(800, -600)) == ("bmp", 800, 600)


def test_parse_image_dims_garbage():
    assert parse_image_dims(None) == (None, None, None)
    assert parse_image_dims(b"") == (None, None, None)
    assert parse_image_dims(b"not an image at all") == (None, None, None)
    # PNG signature but truncated before IHDR dims
    assert parse_image_dims(b"\x89PNG\r\n\x1a\n\x00\x00") == (None, None, None)
    # JPEG SOI with no SOF marker: detected but dimensionless
    assert parse_image_dims(b"\xff\xd8\xff\xd9") == ("jpeg", None, None)


def test_parse_wav_meta():
    assert parse_wav_meta(make_wav(16000, 1, 2.0)) == (16000, 1, pytest.approx(2.0))
    assert parse_wav_meta(make_wav(44100, 2, 0.5)) == (44100, 2, pytest.approx(0.5))
    assert parse_wav_meta(b"RIFFxxxx1234") == (None, None, None)
    assert parse_wav_meta(None) == (None, None, None)


@pytest.fixture()
def media(spark):
    rows = [
        (1, make_png(300, 200), "png", "image"),
        (2, make_jpeg(64, 32), "jpeg", "image"),
        (3, None, "png", "image"),
        (4, make_gif(12, 8), "png", "image"),  # metadata lies: bytes are GIF
        (5, make_wav(16000, 1, 2.0), "wav", "audio"),
        (6, bytes(5000), "mp4", "video"),
        (7, b"corrupt blob", "jpeg", "image"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features(media):
    rows = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert set(rows) == {1, 2, 3, 4, 7}
    assert (rows[1]["width"], rows[1]["height"]) == (300, 200)
    assert (rows[2]["width"], rows[2]["height"]) == (64, 32)
    assert rows[1]["detected"] == "png" and rows[2]["detected"] == "jpeg"
    # metadata/bytes mismatch surfaces via detected
    assert rows[4]["format"] == "png" and rows[4]["detected"] == "gif"
    # null / corrupt payloads keep their rows with null dims
    assert rows[3]["width"] is None and rows[3]["n_bytes"] == 0
    assert rows[7]["detected"] is None and rows[7]["width"] is None


def test_audio_features(media):
    rows = decode_audio_features(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["sample_rate"] == 16000
    assert r["n_channels"] == 1
    assert r["duration_s"] == pytest.approx(2.0)
    assert r["detected"] == "wav"


def test_frame_sampling(media):
    frames = sample_frames(media, every_n_bytes=1024, max_frames=4).collect()
    assert {f["frame_idx"] for f in frames} == {0, 1, 2, 3}
    assert all(f["media_id"] == 6 for f in frames)
    assert len(frames[0]["frame_payload"]) == 1024


def test_real_frame_decode_is_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|pyav|ffmpeg"):
        sample_frames(media, use_stub=False).collect()


def test_spark_payload_synthesis_matches_parser(spark, sf_smoke):
    """The mm_image_features Catalyst-built PNG stream is genuinely
    parseable — the bytes round-trip through the real parser."""
    from gdutils_spark.queries_ext import mm_image_features

    rows = mm_image_features(spark, sf_smoke).orderBy("media_id").limit(5).collect()
    assert rows
    for r in rows:
        assert r["detected"] == "png"
        assert r["width"] == 64 + r["media_id"] % 192
        assert r["height"] == 64 + (r["media_id"] * 7) % 192


def test_spark_wav_synthesis_matches_parser(spark, sf_smoke):
    """The mm_audio_features Catalyst-built RIFF container (little-endian
    fields via byte reversal) is genuinely parseable."""
    from gdutils_spark.queries_ext import mm_audio_features

    rows = mm_audio_features(spark, sf_smoke).orderBy("media_id").limit(5).collect()
    assert rows
    for r in rows:
        assert r["detected"] == "wav"
        assert r["sample_rate"] == 8000 + (r["media_id"] % 8) * 1000
        assert r["n_channels"] == 1 + r["media_id"] % 2
        assert r["duration_s"] > 0


def test_png_codec_roundtrip_all_channel_counts():
    from gdutils_spark.operators.multimodal import decode_png, encode_png

    for ch in (1, 2, 3, 4):
        w, h = 7, 5
        px = bytearray(
            (x * 3 + y * 5 + c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )
        dec = decode_png(encode_png(w, h, ch, px))
        assert dec is not None
        assert dec[:3] == (w, h, ch)
        assert dec[3] == px


def test_png_decode_handles_all_five_filters():
    from gdutils_spark.operators.multimodal import decode_png

    def filter_line(ftype, line, prev, ch):
        out = bytearray()
        for j in range(len(line)):
            a = line[j - ch] if j >= ch else 0
            b = prev[j]
            c = prev[j - ch] if j >= ch else 0
            pred = (
                0 if ftype == 0
                else a if ftype == 1
                else b if ftype == 2
                else (a + b) >> 1 if ftype == 3
                else (
                    a
                    if abs(b - c) <= abs(a - c) and abs(b - c) <= abs(a + b - 2 * c)
                    else b if abs(a - c) <= abs(a + b - 2 * c) else c
                )
            )
            out.append((line[j] - pred) & 0xFF)
        return out

    def chunk(t, data):
        return (
            struct.pack(">I", len(data))
            + t
            + data
            + struct.pack(">I", zlib.crc32(t + data) & 0xFFFFFFFF)
        )

    w, h = 6, 10
    px = bytearray((x * 3 + y * 5 + 7) % 256 for y in range(h) for x in range(w))
    raw = bytearray()
    prev = bytearray(w)
    for y in range(h):
        line = px[y * w : (y + 1) * w]
        raw.append(y % 5)
        raw += filter_line(y % 5, line, prev, 1)
        prev = line
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dec = decode_png(p)
    assert dec is not None and dec[:3] == (w, h, 1)
    assert dec[3] == px


def test_thumbnail_images_spark(spark):
    """Distributed thumbnails: shrink-only resize, exact dims, pixel sum,
    decodable output thumbnails; undecodable payloads keep null rows."""
    from gdutils_spark.operators.multimodal import (
        decode_png,
        encode_png,
        thumbnail_images,
    )

    w, h = 20, 10
    px = bytearray((x + 2 * y) % 256 for y in range(h) for x in range(w))
    small = encode_png(3, 2, 1, bytearray(range(6)))
    rows = [
        (1, encode_png(w, h, 1, px), "png", "image"),
        (2, small, "png", "image"),  # already under max_dim → passthrough
        (3, b"not a png", "png", "image"),
        (4, make_wav(8000, 1, 0.1), "wav", "audio"),  # filtered out by kind
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in thumbnail_images(df, max_dim=8).collect()}
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    assert (r1.width, r1.height, r1.thumb_w, r1.thumb_h) == (20, 10, 8, 4)
    dec = decode_png(bytes(r1.thumbnail))
    assert dec is not None and dec[:3] == (8, 4, 1)
    expect = bytearray(
        ((x * 20 // 8) + 2 * (y * 10 // 4)) % 256 for y in range(4) for x in range(8)
    )
    assert dec[3] == expect
    assert r1.thumb_px_sum == sum(expect)
    r2 = got[2]
    assert (r2.thumb_w, r2.thumb_h) == (3, 2)
    assert bytes(r2.thumbnail) == small  # re-encode of identical pixels
    assert got[3].width is None and got[3].thumbnail is None


def test_png_decode_corrupt_chunk_lengths_return_none():
    """Structural corruption must yield None (null row downstream), never
    an exception — a declared chunk length past the payload end, or a
    truncated IHDR, would otherwise kill the whole mapInPandas task."""
    from gdutils_spark.operators.multimodal import decode_png

    sig = b"\x89PNG\r\n\x1a\n"
    # IHDR declares 13 data bytes but only 5 are present
    junk = sig + struct.pack(">I", 0) + b"jUNK" + struct.pack(">I", 0)
    trunc = junk + struct.pack(">I", 13) + b"IHDR" + bytes(5)
    assert decode_png(trunc) is None
    # chunk length far past the end of the payload
    huge = sig + struct.pack(">I", 1 << 30) + b"IDAT" + bytes(20)
    assert decode_png(huge) is None


def test_image_pixel_stats_spark(spark):
    from gdutils_spark.operators.multimodal import encode_png, image_pixel_stats

    w, h = 5, 4
    px = bytearray((x * 7 + y * 11) % 256 for y in range(h) for x in range(w))
    rows = [
        (1, encode_png(w, h, 1, px), "png", "image"),
        (2, b"junk", "png", "image"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_pixel_stats(df).collect()}
    r1 = got[1]
    assert (r1.width, r1.height, r1.channels) == (5, 4, 1)
    assert r1.px_sum == sum(px)
    assert r1.px_mean == sum(px) / len(px)
    assert (r1.px_min, r1.px_max) == (min(px), max(px))
    assert got[2].px_sum is None


def make_wav_pcm(samples, rate=8000, channels=1, extra_byte=False) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    if extra_byte:
        data += b"\x01"  # malformed odd tail — decoders drop it
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm_stats_signed_samples():
    from gdutils_spark.operators.multimodal import pcm_stats

    samples = [100, -200, 32767, -32768]
    n, s, ss, peak = pcm_stats(make_wav_pcm(samples))
    assert n == 4
    assert s == sum(samples)
    assert ss == sum(x * x for x in samples)
    assert peak == 32768  # |−32768| — abs must widen past int16


def test_pcm_stats_edges():
    from gdutils_spark.operators.multimodal import pcm_stats

    # odd trailing byte ignored
    assert pcm_stats(make_wav_pcm([7, -7], extra_byte=True)) == (2, 0, 98, 7)
    # empty data chunk: zero counts, null peak
    assert pcm_stats(make_wav_pcm([])) == (0, 0, 0, None)
    # non-WAV payloads
    assert pcm_stats(None) is None
    assert pcm_stats(b"not audio") is None


def test_audio_pcm_stats_spark(spark):
    import math

    from gdutils_spark.operators.multimodal import audio_pcm_stats

    rows = [
        (1, make_wav_pcm([1000, -1000, 500]), "wav", "audio"),
        (2, b"\xffgarbage", "mp3", "audio"),
        (3, make_wav_pcm([4, 4]), "wav", "image"),  # filtered by kind
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, format string, kind string"
    )
    got = {r.media_id: r for r in audio_pcm_stats(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1.n_samples, r1.sum_amp, r1.sumsq_amp, r1.peak) == (3, 500, 2250000, 1000)
    assert r1.mean_amp == 500 / 3
    assert r1.rms == math.sqrt(2250000 / 3)
    r2 = got[2]
    assert r2.n_samples is None and r2.rms is None


def test_png_decode_bomb_guard_bounds_memory():
    """Decompression-bomb hardening: (a) an IHDR declaring a pixel
    buffer past the 64 MiB budget is rejected before any inflate; (b) an
    IDAT expanding far past what sane declared dims need is truncated at
    the cap (tolerated like trailing data), never materialized."""
    import struct
    import zlib

    from gdutils_spark.operators.multimodal import decode_png

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    # (a) 30000x30000 RGBA claims ~3.6 GB of pixels from a 100-byte blob
    ihdr_bomb = struct.pack(">IIBBBBB", 30000, 30000, 8, 6, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr_bomb)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
        + chunk(b"IEND", b"")
    )
    assert decode_png(bomb) is None
    # (b) legit 2x2 grayscale dims, but the IDAT inflates to 1 MB of
    # trailing garbage — decode succeeds from the capped prefix
    good_rows = b"\x00\x01\x02" + b"\x00\x03\x04"
    overlong = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(good_rows + b"\xff" * (1 << 20)))
        + chunk(b"IEND", b"")
    )
    got = decode_png(overlong)
    assert got is not None
    w, h, ch, px = got
    assert (w, h, ch) == (2, 2, 1)
    assert bytes(px) == b"\x01\x02\x03\x04"


def test_parse_wav_meta_undersized_fmt_chunk_is_garbage_guarded():
    """A malformed fmt chunk whose declared size < 16 must not read the
    next chunk's bytes as rate/channels — all-None metadata, not
    plausible-looking garbage."""
    from gdutils_spark.operators.multimodal import parse_wav_meta

    # RIFF/WAVE with fmt size 4 followed by a data chunk whose header
    # bytes would otherwise be misread as channels/rate
    fmt_small = b"fmt " + (4).to_bytes(4, "little") + b"\x01\x00\x02\x00"
    data = b"data" + (8).to_bytes(4, "little") + b"\x00" * 8
    body = b"WAVE" + fmt_small + data
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert parse_wav_meta(wav) == (None, None, None)


# ---------------------------------------------------------------------------
# AVI container: real video path (round 10)
# ---------------------------------------------------------------------------


def test_parse_avi_roundtrip():
    frames = [b"first", b"second!", b"x" * 64, b"odd"]
    avi = build_avi(frames, width=320, height=240, usec_per_frame=40000)
    usec, declared, w, h, idx = parse_avi(avi)
    assert (usec, declared, w, h) == (40000, 4, 320, 240)
    assert [avi[o : o + s] for o, s in idx] == frames
    # total size formula the oracles rely on: 224 + sum(8 + sz + pad)
    assert len(avi) == 224 + sum(8 + len(f) + (len(f) & 1) for f in frames)


def test_parse_avi_rejects_and_clamps():
    assert parse_avi(None) is None
    assert parse_avi(b"") is None
    assert parse_avi(b"RIFF\x00\x00\x00\x00WAVE") is None  # RIFF, not AVI
    avi = build_avi([b"abc"], 16, 16)
    # truncation clamps instead of crashing; hostile declared sizes too
    assert parse_avi(avi[:40]) is not None
    hostile = bytearray(avi)
    hostile[4:8] = (0xFFFFFFFF).to_bytes(4, "little")  # RIFF size lies
    meta = parse_avi(bytes(hostile))
    assert meta is not None and [m[1] for m in meta[4]] == [3]


def test_parse_avi_rec_grouping():
    """Frames inside a 'rec ' grouping LIST (legal AVI interleaving) are
    walked transparently and their offsets stay payload-absolute."""
    import struct

    def chunk(cid, data):
        return cid + struct.pack("<I", len(data)) + data + b"\x00" * (len(data) & 1)

    plain = build_avi([b"one"], 16, 16)
    rec = chunk(b"LIST", b"rec " + chunk(b"00dc", b"grouped"))
    movi_at = plain.find(b"movi")
    # splice the rec LIST after the existing frame, fixing up sizes
    movi_hdr = movi_at - 8
    old_movi_sz = int.from_bytes(plain[movi_at - 4 : movi_at], "little")
    new = bytearray(plain[: movi_hdr + 8 + old_movi_sz]) + rec
    new[movi_at - 4 : movi_at] = (old_movi_sz + len(rec)).to_bytes(4, "little")
    new[4:8] = (len(new) - 8).to_bytes(4, "little")
    meta = parse_avi(bytes(new))
    got = [bytes(new)[o : o + s] for o, s in meta[4]]
    assert got == [b"one", b"grouped"]


def test_video_features_and_frame_index(spark):
    frames_a = [b"alpha", b"beta-beta", b"g" * 40]
    frames_b = [b"only"]
    rows = [
        (1, build_avi(frames_a, 100, 50, usec_per_frame=20000), "avi", "video"),
        (2, build_avi(frames_b, 64, 48, usec_per_frame=40000), "avi", "video"),
        (3, bytes(64), "mp4", "video"),          # not parseable: NULL row
        (4, make_png(8, 8), "png", "image"),     # wrong kind: filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in decode_video_features(media).collect()}
    assert set(feats) == {1, 2, 3}
    assert (feats[1]["width"], feats[1]["height"]) == (100, 50)
    assert feats[1]["fps"] == 50.0 and feats[1]["n_frames"] == 3
    assert feats[2]["fps"] == 25.0 and feats[2]["n_frames"] == 1
    assert feats[3]["detected"] is None and feats[3]["width"] is None
    assert feats[3]["n_bytes"] == 64

    idx = video_frame_index(media).collect()
    by_media = {}
    for r in idx:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1, 2}  # non-AVI contributes no rows
    sizes = [r["n_bytes"] for r in sorted(by_media[1], key=lambda r: r["frame_idx"])]
    assert sizes == [5, 9, 40]


def test_sample_frames_real_path_stride_and_cap(spark):
    frames = [f"frame-{i}".encode() for i in range(7)]
    media = spark.createDataFrame(
        [(9, build_avi(frames, 32, 32), "avi", "video")], MEDIA_SCHEMA
    )
    got = sorted(
        sample_frames(media, use_stub=False, stride=2, max_frames=3).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in got] == [0, 2, 4]  # cap binds before idx 6
    assert [bytes(r["frame_payload"]) for r in got] == [
        b"frame-0", b"frame-2", b"frame-4",
    ]


def test_image_dhash_known_bits(spark):
    """A 9x8 gradient PNG (identity sample lattice) must produce the
    arithmetically predicted bands; an undecodable payload keeps its
    row with null bands."""
    from gdutils_spark.operators.multimodal import encode_png, image_dhash

    w, h = 9, 8
    px = bytearray(((x * 31 + y * 17) * 3) % 256 for y in range(h) for x in range(w))
    good = encode_png(w, h, 1, px)
    df = spark.createDataFrame(
        [(1, bytearray(good), "png", "image"), (2, bytearray(b"nope"), "png", "image")],
        "media_id long, payload binary, format string, kind string",
    )
    rows = {r["media_id"]: r for r in image_dhash(df).collect()}
    bands = [0, 0, 0, 0]
    for k in range(64):
        x, y = k // 8, k % 8
        p0 = ((x * 31 + y * 17) * 3) % 256
        p1 = (((x + 1) * 31 + y * 17) * 3) % 256
        if p1 > p0:
            bands[k // 16] |= 1 << (k % 16)
    got = [rows[1][f"b{i}"] for i in range(4)]
    assert got == bands
    assert rows[1]["width"] == 9 and rows[1]["height"] == 8
    assert all(rows[2][f"b{i}"] is None for i in range(4))


def test_image_dhash_grid_validation(spark):
    import pytest as _pytest

    from gdutils_spark.operators.multimodal import image_dhash

    df = spark.createDataFrame(
        [], "media_id long, payload binary, format string, kind string"
    )
    with _pytest.raises(ValueError, match="grid"):
        image_dhash(df, grid=5)


def test_dhash_near_dup_pairs_banding_and_hamming(spark):
    """Identical hashes pair at hamming 0; a 1-bit flip pairs at 1; a
    hash differing in EVERY band is never a candidate even when its
    true hamming is under the threshold."""
    from gdutils_spark.operators.multimodal import dhash_near_dup_pairs

    rows = [
        (1, 9, 8, 0x1111, 0x2222, 0x3333, 0x4444),
        (2, 9, 8, 0x1111, 0x2222, 0x3333, 0x4444),      # identical → d=0
        (3, 9, 8, 0x1110, 0x2222, 0x3333, 0x4444),      # 1 bit off b0
        (4, 9, 8, 0x1112, 0x2223, 0x3332, 0x4445),      # off in EVERY band
        (5, 9, 8, None, None, None, None),               # undecodable: skipped
    ]
    df = spark.createDataFrame(
        rows, "media_id long, width int, height int, b0 int, b1 int, b2 int, b3 int"
    )
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(df, max_hamming=16).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 1
    # 4 shares no exact band with anyone → not a candidate despite d=4
    assert not any(4 in p for p in got)
    assert not any(5 in p for p in got)


def test_dhash_near_dup_pairs_hot_band_guard(spark):
    """With max_band_freq, a band value shared by many images stops
    generating candidates; pairs still matching via a cold band keep
    their EXACT hamming."""
    from gdutils_spark.operators.multimodal import dhash_near_dup_pairs

    # 1 and 2: share hot band b0 (=0) AND cold band b1 -> survive via b1
    # 3 and 4: share ONLY the hot band b0 -> dropped under the guard
    rows = [
        (1, 9, 8, 0x0, 0x7777, 0x1111, 0x2222),
        (2, 9, 8, 0x0, 0x7777, 0x1112, 0x2223),
        (3, 9, 8, 0x0, 0x5551, 0x3331, 0x4441),
        (4, 9, 8, 0x0, 0x5552, 0x3332, 0x4442),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, width int, height int, b0 int, b1 int, b2 int, b3 int"
    )
    unguarded = {(r["media_id_a"], r["media_id_b"])
                 for r in dhash_near_dup_pairs(df, max_hamming=16).collect()}
    assert (1, 2) in unguarded and (3, 4) in unguarded
    guarded = {(r["media_id_a"], r["media_id_b"]): r["hamming"]
               for r in dhash_near_dup_pairs(df, max_hamming=16,
                                             max_band_freq=3).collect()}
    assert (1, 2) in guarded and (3, 4) not in guarded


def test_dhash_hot_band_guard_is_on_by_default(spark):
    """The guard default is the MEASURED 1024 from
    tools/dhash_hot_band_probe.py (a flat-image corpus otherwise puts
    f² candidate rows in the all-zero-band bucket); None disables it."""
    import inspect

    from gdutils_spark.operators.multimodal import dhash_near_dup_pairs

    sig = inspect.signature(dhash_near_dup_pairs)
    assert sig.parameters["max_band_freq"].default == 1024
