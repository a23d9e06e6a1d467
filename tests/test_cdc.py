"""MERGE-INTO / SCD2 operator properties (oracle hash-parity for the
registry queries lives in test_queries_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gdutils_spark.operators.cdc import apply_cdc, scd2_history


def test_apply_cdc_upsert_delete_insert(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, v string, x double"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U"),
            (3, None, 0.0, "D"),
            (4, "d", 40.0, "I"),
        ],
        "id long, v string, x double, op string",
    )
    got = {r.id: r for r in apply_cdc(snap, changes, ["id"]).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1].v == "a"          # untouched
    assert got[2].v == "b2" and got[2].x == 25.0  # updated
    assert got[4].v == "d"          # inserted
    # 3 deleted


def test_apply_cdc_latest_change_wins(spark):
    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, "first", "U", 1), (1, "second", "U", 2), (1, "dead", "D", 0)],
        "id long, v string, op string, seq long",
    )
    got = apply_cdc(snap, changes, ["id"], seq_col="seq").collect()
    assert len(got) == 1 and got[0].v == "second"
    # and a delete as the latest change removes the row
    changes2 = spark.createDataFrame(
        [(1, "u", "U", 1), (1, None, "D", 2)], "id long, v string, op string, seq long"
    )
    assert apply_cdc(snap, changes2, ["id"], seq_col="seq").count() == 0


def test_scd2_collapses_runs_and_closes_intervals(spark):
    rows = [
        (1, "x", 10, 100),
        (1, "x", 20, 101),  # same state → collapses
        (1, "y", 30, 102),  # change
        (1, "x", 40, 103),  # change back → NEW interval (not merged)
        (2, "z", 15, 104),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts long, eid long")
    got = sorted(
        scd2_history(df, ["k"], ["attr"], "ts", tiebreak_cols=["eid"]).collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    as_tuples = [(r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in got]
    assert as_tuples == [
        (1, "x", 10, 30, False),
        (1, "y", 30, 40, False),
        (1, "x", 40, None, True),
        (2, "z", 15, None, True),
    ]


def test_scd2_null_transitions_are_changes(spark):
    rows = [(1, None, 10, 1), (1, "a", 20, 2), (1, None, 30, 3)]
    df = spark.createDataFrame(rows, "k long, attr string, ts long, eid long")
    got = scd2_history(df, ["k"], ["attr"], "ts", tiebreak_cols=["eid"]).collect()
    assert len(got) == 3


def test_apply_cdc_rejects_bad_ops(spark):
    """A NULL or unrecognized op must raise — a dirty-feed row would
    otherwise anti-join its snapshot row away (silent delete)."""
    import pytest

    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    for bad_op in [None, "d", "delete", "X"]:
        changes = spark.createDataFrame(
            [(1, "z", bad_op)], "id long, v string, op string"
        )
        with pytest.raises(ValueError, match="ops must be"):
            apply_cdc(snap, changes, ["id"])


def test_apply_cdc_equal_seq_update_beats_delete(spark):
    """Deterministic tie at equal sequences: 'U' > 'D' by op ordering."""
    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, "upd", "U", 5), (1, None, "D", 5)],
        "id long, v string, op string, seq long",
    )
    got = apply_cdc(snap, changes, ["id"], seq_col="seq").collect()
    assert len(got) == 1 and got[0].v == "upd"


def test_scd2_drops_null_timestamps(spark):
    rows = [(1, "a", None, 1), (1, "a", 10, 2), (1, "b", 20, 3)]
    df = spark.createDataFrame(rows, "k long, attr string, ts long, eid long")
    got = sorted(
        scd2_history(df, ["k"], ["attr"], "ts", tiebreak_cols=["eid"]).collect(),
        key=lambda r: r.valid_from,
    )
    # the NULL-ts row contributes nothing; no NULL valid_from interval
    assert [(r.attr, r.valid_from, r.valid_to) for r in got] == [
        ("a", 10, 20),
        ("b", 20, None),
    ]
