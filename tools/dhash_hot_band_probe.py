"""Measure dhash_near_dup_pairs on an adversarial flat-image corpus.

A flat (constant-luminance) image dHashes to all-zero bands, so every
flat image in a corpus shares every band value with every other one —
the banded LSH self-join then puts f² candidate rows in four buckets.
This probe quantifies that blow-up (N identical flat images mixed into
a normal gradient corpus) with the ``max_band_freq`` guard off vs on,
so the operator's default rests on a measured number — the graph hub /
resample hub probe convention.

Also prints the band-frequency census of the mm_image_near_dup fixture
shape (500 images, 50 gradient clusters) to confirm the chosen default
never triggers on non-degenerate corpora.

Run from the repo root on an idle host: python tools/dhash_hot_band_probe.py
"""

from __future__ import annotations

import os
import struct
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from gdutils_spark.operators.multimodal import dhash_near_dup_pairs, image_dhash

N_FLAT = 2_000     # identical flat images (the hazard)
N_NORM = 3_000     # distinct gradient images (healthy corpus bulk)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def _png(w: int, h: int, pix) -> bytes:
    def chunk(t, data):
        crc = zlib.crc32(t + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + t + data + struct.pack(">I", crc)

    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += bytes(pix(x, y) % 256 for x in range(w))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def fixture():
    def synth(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid in pdf["id"]:
                mid = int(mid)
                if mid < N_FLAT:
                    payloads.append(_png(9, 8, lambda x, y: 127))  # flat
                else:
                    payloads.append(
                        _png(9, 8, lambda x, y: (x * 31 + y * 17) * (mid % 97 + 3))
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["id"],
                    "payload": payloads,
                    "format": "png",
                    "kind": "image",
                }
            )

    return spark.range(N_FLAT + N_NORM).mapInPandas(
        synth, "media_id long, payload binary, format string, kind string"
    )


hashes = image_dhash(fixture()).persist()
hashes.count()

census = (
    hashes.where(F.col("b0").isNotNull())
    .select(
        "media_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("bi"), F.col(f"b{i}").alias("bv"))
                for i in range(4)
            ])
        ).alias("bd"),
    )
    .groupBy("bd.bi", "bd.bv")
    .agg(F.count(F.lit(1)).alias("f"))
)
top = census.orderBy(F.desc("f")).limit(5).collect()
print("hot bands (band_idx, band_val, freq):", [(r["bi"], r["bv"], r["f"]) for r in top])

for label, guard in (("guard OFF (None)", None), ("guard 1024", 1024)):
    t0 = time.monotonic()
    n = dhash_near_dup_pairs(hashes, max_hamming=16, max_band_freq=guard).count()
    print(f"{label}: {time.monotonic() - t0:.2f}s, {n} pairs")
hashes.unpersist()
