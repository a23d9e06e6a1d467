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


def test_pre_epoch_grid_stays_epoch_aligned(spark):
    # negative epoch micros: Spark's % keeps the dividend's sign, so the
    # old `x - x % step` alignment rounded toward zero and produced
    # grid instants OFF the epoch lattice pre-1970; pmod keeps true
    # floor semantics on the whole epoch line
    rows = [
        ("a", datetime(1969, 12, 31, 22, 30, 0), 0.0),
        ("a", datetime(1970, 1, 1, 1, 30, 0), 6.0),
    ]
    out = resample_interpolate(_df(spark, rows), "e", "ts", "v", 3600).collect()
    ts = sorted(r["ts"] for r in out)
    assert ts == [
        datetime(1969, 12, 31, 23, 0, 0),
        datetime(1970, 1, 1, 0, 0, 0),
        datetime(1970, 1, 1, 1, 0, 0),
    ]
    got = {r["ts"]: r["v_interp"] for r in out}
    # span is 3h from -1.5h to +1.5h, value 0..6 → 2.0 per hour
    assert got[datetime(1969, 12, 31, 23, 0, 0)] == pytest.approx(1.0)
    assert got[datetime(1970, 1, 1, 0, 0, 0)] == pytest.approx(3.0)
    assert got[datetime(1970, 1, 1, 1, 0, 0)] == pytest.approx(5.0)


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


def test_rolling_origin_folds_counts(spark):
    from gdutils_spark.operators.timeseries import rolling_origin_folds

    # 10 obs at hours 0..9; 3 folds of 2h ending at t1=9h:
    # fold windows (3,5], (5,7], (7,9]; train = ts <= window start
    rows = [("a", datetime(2024, 1, 1, hh, 0, 0), 1.0) for hh in range(10)]
    out = {r["fold"]: r for r in rolling_origin_folds(
        _df(spark, rows), "ts", 3, 7200
    ).collect()}
    assert len(out) == 3
    assert out[1]["n_train"] == 4 and out[1]["n_test"] == 2   # train 0-3h, test 4,5h
    assert out[2]["n_train"] == 6 and out[2]["n_test"] == 2   # test 6,7h
    assert out[3]["n_train"] == 8 and out[3]["n_test"] == 2   # test 8,9h
    assert out[3]["test_end"] == datetime(2024, 1, 1, 9, 0, 0)
    assert out[1]["train_end"] == datetime(2024, 1, 1, 3, 0, 0)


def test_rolling_origin_folds_empty_windows_and_validation(spark):
    from gdutils_spark.operators.timeseries import rolling_origin_folds

    # all data older than every test window: n_test = 0 everywhere,
    # n_train = full corpus
    rows = [("a", datetime(2023, 1, 1, 0, 0, 0), 1.0),
            ("a", datetime(2024, 1, 1, 0, 0, 0), 1.0)]
    out = rolling_origin_folds(_df(spark, rows), "ts", 2, 60).collect()
    got = {r["fold"]: (r["n_train"], r["n_test"]) for r in out}
    # t1 itself falls in the LAST window (exclusive-start, inclusive-end)
    assert got[2] == (1, 1)
    assert got[1] == (1, 0)
    with pytest.raises(ValueError, match="n_folds"):
        rolling_origin_folds(_df(spark, rows), "ts", 0, 60)
    with pytest.raises(ValueError, match="horizon"):
        rolling_origin_folds(_df(spark, rows), "ts", 2, 0)


def test_entity_gap_report_counts_and_coverage(spark):
    from gdutils_spark.operators.timeseries import entity_gap_report

    # a: obs at 0h, 1h, 5h -> one 4h gap at threshold 2h;
    #    span 5h, lost 4h, coverage 1 - 4/5
    # b: single obs -> span 0, coverage 1.0
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
        ("a", datetime(2024, 1, 1, 1, 0, 0), 0.0),
        ("a", datetime(2024, 1, 1, 5, 0, 0), 0.0),
        ("b", datetime(2024, 1, 1, 0, 0, 0), 0.0),
    ]
    out = {r["e"]: r for r in entity_gap_report(
        _df(spark, rows), "e", "ts", 7200
    ).collect()}
    a = out["a"]
    assert a["n_obs"] == 3 and a["n_gaps"] == 1
    assert a["span_s"] == 5 * 3600.0 and a["max_gap_s"] == 4 * 3600.0
    assert a["coverage_frac"] == pytest.approx(1 - 4 / 5)
    b = out["b"]
    assert b["n_obs"] == 1 and b["n_gaps"] == 0
    assert b["span_s"] == 0.0 and b["coverage_frac"] == 1.0


def test_entity_gap_report_duplicate_ts_not_gaps(spark):
    from gdutils_spark.operators.timeseries import entity_gap_report

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
        ("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
        ("a", datetime(2024, 1, 1, 3, 0, 0), 0.0),
    ]
    out = entity_gap_report(_df(spark, rows), "e", "ts", 3600).collect()[0]
    assert out["n_gaps"] == 1 and out["n_obs"] == 3
    with pytest.raises(ValueError, match="gap_threshold"):
        entity_gap_report(_df(spark, rows), "e", "ts", 0)


def test_gap_merge_lemma_matches_whole_corpus(spark, sf_correct):
    """Registers built on arbitrary TIME-DISJOINT slices and merged (in
    either order) must reproduce the whole-corpus gap report exactly."""
    from gdutils_spark.operators.timeseries import (
        entity_gap_report,
        gap_merge,
        gap_registers,
        gap_report_from_registers,
    )
    from gdutils_spark.sources.tables import load_table

    thr = 43200
    e = load_table(spark, sf_correct, "events").where(F.col("user_id") < 30)
    cut1, cut2 = "2024-01-10", "2024-01-20"
    s1 = e.where(F.col("ts") < cut1)
    s2 = e.where((F.col("ts") >= cut1) & (F.col("ts") < cut2))
    s3 = e.where(F.col("ts") >= cut2)
    r1, r2, r3 = (gap_registers(s, "user_id", "ts", thr) for s in (s1, s2, s3))
    # out-of-order merge: (s3 + s1) + s2 — the union defers boundary
    # resolution, so non-adjacent merge order cannot fabricate gaps
    merged = gap_merge(gap_merge(r3, r1), r2)
    got = gap_report_from_registers(merged, thr)
    want = entity_gap_report(e, "user_id", "ts", thr).withColumnRenamed(
        "user_id", "entity"
    )
    g = {r["entity"]: r for r in got.collect()}
    w = {r["entity"]: r for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        for c in ("n_obs", "span_s", "n_gaps", "max_gap_s", "coverage_frac"):
            assert g[k][c] == w[k][c], (k, c, g[k][c], w[k][c])
    assert not any(r["overlapped"] for r in got.collect())


def test_gap_merge_flags_overlap(spark):
    from gdutils_spark.operators.timeseries import gap_merge, gap_registers

    a = _df(spark, [("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
                    ("a", datetime(2024, 1, 1, 4, 0, 0), 0.0)])
    b = _df(spark, [("a", datetime(2024, 1, 1, 2, 0, 0), 0.0)])  # interleaves
    from gdutils_spark.operators.timeseries import gap_report_from_registers

    ra = gap_registers(a, "e", "ts", 3600)
    rb = gap_registers(b, "e", "ts", 3600)
    out = gap_report_from_registers(gap_merge(ra, rb), 3600).collect()[0]
    assert out["overlapped"] is True
    assert out["n_obs"] == 3


def test_gap_merge_self_identity_on_disjoint_boundary(spark):
    """A shared boundary instant is a 0 delta — never a gap, never an
    overlap."""
    from gdutils_spark.operators.timeseries import gap_merge, gap_registers

    a = _df(spark, [("a", datetime(2024, 1, 1, 0, 0, 0), 0.0),
                    ("a", datetime(2024, 1, 1, 1, 0, 0), 0.0)])
    b = _df(spark, [("a", datetime(2024, 1, 1, 1, 0, 0), 0.0),
                    ("a", datetime(2024, 1, 1, 2, 0, 0), 0.0)])
    from gdutils_spark.operators.timeseries import gap_report_from_registers

    out = gap_report_from_registers(
        gap_merge(
            gap_registers(a, "e", "ts", 1800), gap_registers(b, "e", "ts", 1800)
        ),
        1800,
    ).collect()[0]
    assert out["overlapped"] is False
    assert out["n_gaps"] == 2  # the two 1h in-chunk deltas; boundary 0 is not
    assert out["n_obs"] == 4


def test_resample_windows_are_incremental_running_frames(spark):
    """Regression guard for the measured O(n²) hazard: every window
    frame in the physical plan must be a running
    [unboundedPreceding, currentRow] frame — Spark's incremental
    processor — never [currentRow, unboundedFollowing], which
    re-evaluates per row (tools/resample_skew_probe.py)."""
    rows = [("a", datetime(2024, 1, 1, 0, 0, 0), 0.0)]
    plan = resample_interpolate(
        _df(spark, rows), "e", "ts", "v", 3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "unboundedfollowing" not in plan.lower()
    assert plan.lower().count("specifiedwindowframe") >= 2  # both carries windowed
