"""resample_interpolate: grid geometry, passthrough, interpolation math."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from gdutils_spark.operators.timeseries import resample_interpolate


def _df(spark, rows):
    return spark.createDataFrame(rows, "e string, ts timestamp, v double")


def test_linear_midpoint_and_passthrough(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 10.0),
        ("a", datetime(2024, 1, 1, 2, 0, 0), 30.0),
    ]
    out = resample_interpolate(_df(spark, rows), "e", "ts", "v", 3600).collect()
    got = {r["ts"]: r["v_interp"] for r in out}
    # grid aligned to the epoch: 00:00 (co-timed), 01:00 (midpoint), 02:00
    assert got[datetime(2024, 1, 1, 0, 0, 0)] == 10.0  # exact passthrough
    assert got[datetime(2024, 1, 1, 1, 0, 0)] == 20.0  # linear midpoint
    assert got[datetime(2024, 1, 1, 2, 0, 0)] == 30.0
    assert len(got) == 3


def test_grid_is_epoch_aligned_not_obs_aligned(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 30, 0), 0.0),
        ("a", datetime(2024, 1, 1, 3, 30, 0), 3.0),
    ]
    out = resample_interpolate(_df(spark, rows), "e", "ts", "v", 3600).collect()
    ts = sorted(r["ts"] for r in out)
    assert ts == [
        datetime(2024, 1, 1, 1, 0, 0),
        datetime(2024, 1, 1, 2, 0, 0),
        datetime(2024, 1, 1, 3, 0, 0),
    ]
    got = {r["ts"]: r["v_interp"] for r in out}
    assert got[datetime(2024, 1, 1, 1, 0, 0)] == pytest.approx(0.5)


def test_duplicate_timestamps_collapse_to_max(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 1.0),
        ("a", datetime(2024, 1, 1, 0, 0, 0), 5.0),  # dup instant: max wins
        ("a", datetime(2024, 1, 1, 1, 0, 0), 5.0),
    ]
    out = resample_interpolate(_df(spark, rows), "e", "ts", "v", 3600).collect()
    got = {r["ts"]: r["v_interp"] for r in out}
    assert got[datetime(2024, 1, 1, 0, 0, 0)] == 5.0


def test_no_grid_instant_inside_span_yields_no_rows(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 10, 0), 1.0),
        ("a", datetime(2024, 1, 1, 0, 50, 0), 2.0),
    ]
    out = resample_interpolate(_df(spark, rows), "e", "ts", "v", 3600)
    assert out.count() == 0


def test_entities_are_independent(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
        ("a", datetime(2024, 1, 1, 1, 0, 0), 2.0),
        ("b", datetime(2024, 1, 1, 0, 0, 0), 100.0),
        ("b", datetime(2024, 1, 1, 1, 0, 0), 200.0),
    ]
    out = resample_interpolate(_df(spark, rows), "e", "ts", "v", 1800).collect()
    got = {(r["e"], r["ts"]): r["v_interp"] for r in out}
    assert got[("a", datetime(2024, 1, 1, 0, 30, 0))] == 1.0
    assert got[("b", datetime(2024, 1, 1, 0, 30, 0))] == 150.0


def test_null_rows_dropped_and_step_validated(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
        ("a", None, 99.0),
        (None, datetime(2024, 1, 1, 0, 30, 0), 99.0),
        ("a", datetime(2024, 1, 1, 1, 0, 0), 4.0),
    ]
    out = resample_interpolate(_df(spark, rows), "e", "ts", "v", 1800).collect()
    got = {r["ts"]: r["v_interp"] for r in out}
    assert got[datetime(2024, 1, 1, 0, 30, 0)] == 2.0  # nulls didn't anchor
    with pytest.raises(ValueError, match="step_seconds"):
        resample_interpolate(_df(spark, rows), "e", "ts", "v", 0)


def test_plan_has_single_entity_window_shuffle(spark):
    rows = [("a", datetime(2024, 1, 1, 0, 0, 0), 0.0)]
    plan = resample_interpolate(
        _df(spark, rows), "e", "ts", "v", 3600
    )._jdf.queryExecution().optimizedPlan().toString()
    # one Window over the union (forward+backward carry share the spec's
    # partitioning) — no join, no cartesian
    assert "Join" not in plan
