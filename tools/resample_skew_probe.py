"""Measure resample_interpolate on an adversarial hot-entity fixture.

The operator's per-entity ordered carry is sequential by nature: one
entity's obs+grid rows land in one window partition. This probe
quantifies the straggler cost of a hub entity owning half the
observations versus a balanced fixture of identical total size, so
SCALE.md's "time-chunk with one-obs overlap" advice rests on a measured
number rather than an assertion.

Run from the repo root on an idle host: python tools/resample_skew_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from gdutils_spark.operators.timeseries import resample_interpolate

N = 1_000_000
USERS = 5_000
SPAN_S = 30 * 86400
STEP_S = 3600

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def fixture(hot: bool):
    base = spark.range(N)
    if hot:
        # id<N/2 -> user 0 (one hub with 500k obs); rest spread evenly
        user = F.when(F.col("id") < N // 2, F.lit(0)).otherwise(
            F.pmod(F.col("id"), F.lit(USERS))
        )
    else:
        user = F.pmod(F.col("id"), F.lit(USERS))
    ts = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(F.col("id") * 7919, F.lit(SPAN_S))
    )
    return base.select(
        user.alias("user_id"),
        ts.alias("ts"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )


def timed(df) -> tuple[float, int]:
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, n


for label, hot in (("balanced", False), ("hot-hub", True)):
    # one DISCARDED warm-up, then best-of-2 timed runs (rows from the
    # same runs that produced the timings)
    out = resample_interpolate(fixture(hot), "user_id", "ts", "value", STEP_S)
    timed(out)  # warm-up: JIT, shuffle files, code cache
    runs = [timed(out) for _ in range(2)]
    best, rows = min(runs)[0], runs[0][1]
    print(f"{label}: best {best:.2f}s, {rows} grid rows")
