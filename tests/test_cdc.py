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


def test_apply_cdc_no_seq_duplicate_keys_raise(spark):
    """Without seq_col there is no latest-change rule: multiple change
    rows for one key would ALL survive the upsert filter and silently
    break snapshot key uniqueness — must raise instead."""
    import pytest

    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, "x", "U"), (1, "y", "U")], "id long, v string, op string"
    )
    with pytest.raises(ValueError, match="seq_col"):
        apply_cdc(snap, changes, ["id"])
    # with a seq the same batch is legal — latest wins
    seq_changes = spark.createDataFrame(
        [(1, "x", "U", 1), (1, "y", "U", 2)],
        "id long, v string, op string, seq long",
    )
    got = apply_cdc(snap, seq_changes, ["id"], seq_col="seq").collect()
    assert len(got) == 1 and got[0].v == "y"


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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_snap_rows = st.lists(
    st.tuples(st.integers(0, 12), st.text("abc", min_size=1, max_size=3)),
    min_size=0,
    max_size=10,
    unique_by=lambda t: t[0],
)
_change_rows = st.lists(
    st.tuples(
        st.integers(0, 12),
        st.text("xyz", min_size=1, max_size=3),
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 5),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: (t[0], t[3]),  # unique (key, seq): the API contract
)


@given(_snap_rows, _change_rows)
@_slow
def test_apply_cdc_matches_python_model(spark, snap_rows, change_rows):
    """Differential test: apply_cdc == a dict-based merge model for any
    snapshot and any valid change batch (unique (key, seq))."""
    snap = spark.createDataFrame(snap_rows or [(99, "z")], "id long, v string")
    if not snap_rows:
        snap = snap.where("id < 0")  # truly empty, schema kept
    changes = spark.createDataFrame(
        change_rows, "id long, v string, op string, seq long"
    )
    got = {
        (r.id, r.v) for r in apply_cdc(snap, changes, ["id"], seq_col="seq").collect()
    }
    model = dict(snap_rows)
    latest: dict[int, tuple] = {}
    for k, v, op, seq in change_rows:
        if k not in latest or seq > latest[k][2] or (
            seq == latest[k][2] and op > latest[k][1]
        ):
            latest[k] = (v, op, seq)
    for k, (v, op, _seq) in latest.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == set(model.items())


_events = st.lists(
    st.tuples(
        st.integers(0, 2),          # key
        st.sampled_from(["a", "b", None]),  # attr
        st.integers(0, 50),         # ts
        st.integers(0, 10 ** 6),    # unique eid
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[3],
)


@given(_events)
@_slow
def test_scd2_matches_python_model(spark, rows):
    """Differential test: scd2_history == a Python run-collapse model
    over any (key, attr, ts, eid) stream (NULL attrs allowed)."""
    df = spark.createDataFrame(rows, "k long, attr string, ts long, eid long")
    def keyfn(t):
        k, a, vf, vt, cur = t
        return (k, vf, a is None, a or "", vt is None, vt or 0)

    got = sorted(
        (
            (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(
                df, ["k"], ["attr"], "ts", tiebreak_cols=["eid"]
            ).collect()
        ),
        key=keyfn,
    )
    model = []
    by_key = {}
    for k, a, ts, eid in rows:
        by_key.setdefault(k, []).append((ts, eid, a))
    _first = object()
    for k, evs in by_key.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        cps = []
        prev = _first
        for ts, _eid, a in evs:
            if prev is _first or a != prev:  # None==None → no change
                cps.append((ts, a))
            prev = a
        for i, (ts, a) in enumerate(cps):
            nxt = cps[i + 1][0] if i + 1 < len(cps) else None
            model.append((k, a, ts, nxt, nxt is None))
    assert got == sorted(model, key=keyfn)


def test_apply_cdc_identical_duplicate_rows_are_idempotent(spark):
    """At-least-once delivery: fully identical duplicate change rows
    (a retried delete or update) collapse instead of raising — only
    CONFLICTING no-seq changes for a key are an error."""
    snap = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    retried = spark.createDataFrame(
        [(1, None, "D"), (1, None, "D"), (2, "b2", "U"), (2, "b2", "U")],
        "id long, v string, op string",
    )
    got = {r.id: r.v for r in apply_cdc(snap, retried, ["id"]).collect()}
    assert got == {2: "b2"}


def test_apply_cdc_validate_false_skips_probes_same_result(spark):
    """The trusted-feed escape hatch: on a clean batch validate=False
    returns the identical merge, with ZERO eager jobs at call time
    (both probes are collect()s — if any ran, the job counter moves)."""
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "b2", "U"), (3, None, "D"), (4, "d", "I")],
        "id long, v string, op string",
    )
    checked = sorted(
        (r.id, r.v) for r in apply_cdc(snap, changes, ["id"]).collect()
    )
    # count a DEDICATED job group — the default group picks up unrelated
    # session activity (flaky under the shared test session)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("cdc-validate-off", "cdc-validate-off")
    try:
        trusted = apply_cdc(snap, changes, ["id"], validate=False)
    finally:
        sc.setJobGroup(None, None)
    ran = len(tracker.getJobIdsForGroup("cdc-validate-off") or [])
    assert ran == 0, "validate=False must not run eager probe jobs"
    assert sorted((r.id, r.v) for r in trusted.collect()) == checked


def test_apply_cdc_validate_false_caller_owns_contract(spark):
    """validate=False does NOT raise on a batch validate=True rejects —
    the documented trade: the caller owns op-domain and key-uniqueness."""
    import pytest

    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    dirty = spark.createDataFrame(
        [(1, "x", "U"), (1, "y", "U")], "id long, v string, op string"
    )
    with pytest.raises(ValueError, match="multiple distinct rows"):
        apply_cdc(snap, dirty, ["id"])
    # trusted path: no probe, both conflicting rows land (documented)
    assert apply_cdc(snap, dirty, ["id"], validate=False).count() == 2


def test_apply_cdc_validate_false_still_collapses_retries(spark):
    """The lazy retry-collapse is NOT part of the escape hatch: identical
    duplicate rows (at-least-once redelivery) collapse even with
    validate=False — only the eager probes are skipped."""
    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    retried = spark.createDataFrame(
        [(1, "a2", "U"), (1, "a2", "U"), (2, "b", "I"), (2, "b", "I")],
        "id long, v string, op string",
    )
    got = {
        r.id: r.v
        for r in apply_cdc(snap, retried, ["id"], validate=False).collect()
    }
    assert got == {1: "a2", 2: "b"}
