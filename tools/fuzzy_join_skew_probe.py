"""Measure fuzzy_blocked_join on an adversarial shared-token corpus.

Real entity tables share boilerplate tokens ("inc", "ltd", "r/v") across
most rows; the token-blocked candidate join then puts f_a x f_b rows in
one token bucket. This probe quantifies the blow-up (every row on both
sides shares one corpus-wide token) with the ``max_token_freq`` guard
off vs on — the dhash_hot_band_probe / graph-hub convention: the
operator's guard default should rest on a measured number.

Run from the repo root on an idle host: python tools/fuzzy_join_skew_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from gdutils_spark.operators.linkage import fuzzy_blocked_join

N = 20_000  # rows per side; unguarded candidate join = N^2 = 4e8 rows
# the unguarded leg runs at a smaller N: at 20k/side its single hot-token
# bucket (4e8 candidate rows in ONE partition) GC-thrashes the executor
# for >9 minutes — which IS the finding; the small-N legs measure the
# quadratic slope instead of hanging the probe
N_UNGUARDED = (2_000, 4_000)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# every name: "<unique serial> inc" — "inc" is the corpus-wide hot token,
# serials match 1:1 across the sides (the real pairs)
def side(n):
    return spark.range(n).select(
        F.col("id").alias("id"),
        F.concat(F.lit("serial"), F.col("id"), F.lit(" inc")).alias("name"),
    )


def run(label, n, guard):
    t0 = time.monotonic()
    cnt = fuzzy_blocked_join(
        side(n), side(n), "id", "name", "id", "name",
        threshold=0.5, max_token_freq=guard,
    ).count()
    print(f"{label} @ {n}/side: {time.monotonic() - t0:.2f}s, {cnt} pairs",
          flush=True)


run("guard 1000 (default)", N, 1000)
for n in N_UNGUARDED:
    run("guard OFF (None)", n, None)
