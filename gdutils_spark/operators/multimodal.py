"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schemas, partitioning,
UDF signatures, batch iteration; the codec calls are STUBS (the image/
audio libraries are not in this container): ``decode_stub=True`` swaps in a
deterministic fake decoder so pipelines exercise end-to-end, and
``decode_stub=False`` raises ``NotImplementedError`` where a real
``PIL.Image.open`` / ``soundfile.read`` call belongs.

Scale design:

* payloads stay in executors — never collected; ``mapInPandas`` streams
  Arrow batches, so peak memory is one batch of binaries, not a partition.
* ``spark.sql.files.maxPartitionBytes`` (or an explicit ``repartition``)
  controls how many blobs land per task; for 100 MB videos use
  ``maxRecordsPerBatch`` to keep batches small.
* metadata lives in plain columns so filters on (format, width, dur)
  prune BEFORE any decode runs.
"""

from __future__ import annotations

import hashlib
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
    "media_id long, format string, width int, height int, n_bytes long, phash string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id long, format string, sample_rate int, duration_s double, n_bytes long"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def decode_image_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Image decode + feature extraction over ``mapInPandas``.

    Real plumbing: Arrow batch in → pandas out with a stable schema; the
    decode body is the only stubbed piece."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NB: helpers live INSIDE the closure so cloudpickle ships them by
        # value — executors need no gdutils_spark import
        def stub_dims(payload: bytes) -> tuple[int, int]:
            h = hashlib.md5(payload).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192

        for pdf in batches:
            if not use_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not in this "
                    "container; swap stub_dims for PIL.Image.open(io.BytesIO(p)).size"
                )
            dims = [stub_dims(p or b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "phash": [
                        hashlib.md5(p or b"").hexdigest()[:16] for p in pdf["payload"]
                    ],
                }
            )

    return df.where(F.col("kind") == "image").mapInPandas(op, IMAGE_FEATURES_SCHEMA)


def decode_audio_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa — not in "
                    "this container"
                )
            n = pdf["payload"].map(lambda p: len(p or b""))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "sample_rate": [16000] * len(pdf),
                    "duration_s": (n / 32000.0),
                    "n_bytes": n,
                }
            )

    return df.where(F.col("kind") == "audio").mapInPandas(op, AUDIO_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 4, use_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one row per sampled frame (1→N mapInPandas).

    The stub slices the payload; a real implementation seeks keyframes via
    pyav/ffmpeg. Output explodes rows, so downstream repartitions by
    media_id if per-video locality matters."""

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
