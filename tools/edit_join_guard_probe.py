"""Measure edit_blocked_join GUARD MODE on a boilerplate-heavy corpus.

With ``max_gram_freq`` set, the MergeCount filter is DISABLED
(linkage.py: dropped grams would break its bound), so candidate volume
is bounded only by the frequency cap — VERDICT r12 task 4 asks for the
measured unfiltered-candidate slope rather than the assumption that the
cap alone keeps the pair aggregate balanced. Fixture: every text is
"<6-digit serial> <30-char shared boilerplate>" — ALL boilerplate grams
(and the 'serial' prefix grams) sit on every row and are dropped by the
census; the surviving digit grams are each shared by ~N/10..N/1000 rows
depending on position. The fuzzy_join_skew_probe convention: guard-off
default (count filter ON) as the reference leg, guard-on at two corpus
sizes for the slope, plus the max (gram, bkt) key multiplicity — the
partition-balance number.

Run from the repo root on an idle host: python tools/edit_join_guard_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from gdutils_spark.operators.linkage import edit_blocked_join

BOILER = "common boilerplate suffix text"  # 30 chars, shared by every row

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def side(n):
    return spark.range(n).select(
        F.col("id").alias("id"),
        F.concat(
            F.lit("serial"),
            F.lpad(F.col("id").cast("string"), 6, "0"),
            F.lit(" " + BOILER),
        ).alias("t"),
    )


def run(label, n, guard):
    t0 = time.monotonic()
    cnt = edit_blocked_join(
        side(n), side(n), "id", "t", "id", "t",
        max_dist=2, q=4, max_gram_freq=guard,
    ).count()
    print(
        f"{label} @ {n}/side: {time.monotonic() - t0:.2f}s, {cnt} pairs",
        flush=True,
    )


for n in (5_000, 10_000, 20_000):
    run("guard 1000 (count filter OFF)", n, 1000)
for n in (5_000, 10_000):
    run("default   (count filter ON) ", n, None)
