"""Property-based invariants for the time-series operator family.

1. interpolation bounds: every grid value lies within [min, max] of the
   entity's observed values (linear interpolation cannot extrapolate),
   and grid instants are exact step multiples inside the obs span;
2. gap merge lemma, randomized: registers built on ARBITRARY time cuts
   and merged in ARBITRARY order resolve to the whole-corpus report —
   the union-of-chunks design's core claim;
3. fold-count conservation: rolling-origin folds partition the corpus —
   the last fold's train+test count plus its own test window equals the
   total, and n_train is monotone in the fold index.
"""

from __future__ import annotations

import datetime as dt
from functools import reduce

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdutils_spark.operators.timeseries import (
    entity_gap_report,
    gap_merge,
    gap_registers,
    gap_report_from_registers,
    resample_interpolate,
    rolling_origin_folds,
)

SCHEMA = T.StructType(
    [
        T.StructField("e", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)

timestamps = st.datetimes(
    min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2024, 1, 8)
)
rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        timestamps,
        st.floats(-100, 100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)

slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=rows)
@slow
def test_interp_values_bounded_by_observations(spark, data):
    df = spark.createDataFrame(data, SCHEMA)
    out = resample_interpolate(df, "e", "ts", "v", 3600).collect()
    bounds = {
        r["e"]: (r["lo"], r["hi"])
        for r in df.groupBy("e")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    for r in out:
        lo, hi = bounds[r["e"]]
        assert lo - 1e-9 <= r["v_interp"] <= hi + 1e-9
        assert r["ts"].minute == 0 and r["ts"].second == 0
        assert r["ts"].microsecond == 0


@given(data=rows, cuts=st.lists(timestamps, min_size=1, max_size=3))
@slow
def test_gap_merge_lemma_random_cuts(spark, data, cuts):
    thr = 7200
    df = spark.createDataFrame(data, SCHEMA)
    edges = [dt.datetime.min] + sorted(cuts) + [dt.datetime.max]
    slices = [
        df.where((F.col("ts") >= lo) & (F.col("ts") < hi))
        for lo, hi in zip(edges, edges[1:])
    ]
    regs = [gap_registers(s, "e", "ts", thr) for s in slices]
    # merge in reversed order — order-invariance is part of the claim
    merged = reduce(gap_merge, reversed(regs))
    got = {
        r["entity"]: r for r in gap_report_from_registers(merged, thr).collect()
    }
    want = {
        r["entity"]: r
        for r in entity_gap_report(df, "e", "ts", thr)
        .withColumnRenamed("e", "entity")
        .collect()
    }
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["overlapped"] is False
        for c in ("n_obs", "span_s", "n_gaps", "max_gap_s", "coverage_frac"):
            assert g[c] == w[c], (k, c, g[c], w[c])


@given(data=rows, n=st.integers(1, 4))
@slow
def test_folds_partition_the_corpus(spark, data, n):
    df = spark.createDataFrame(data, SCHEMA)
    folds = sorted(
        rolling_origin_folds(df, "ts", n, 3600).collect(),
        key=lambda r: r["fold"],
    )
    total = df.count()
    assert len(folds) == n
    last = folds[-1]
    # the last fold's window ends at max(ts): train + test covers all
    assert last["n_train"] + last["n_test"] == total
    trains = [r["n_train"] for r in folds]
    assert trains == sorted(trains)
    # adjacency: each fold's train count equals everything at or before
    # its window start = previous train + previous test
    for prev, cur in zip(folds, folds[1:]):
        assert cur["n_train"] == prev["n_train"] + prev["n_test"]
