"""Property-based checks for the behavior-analytics operators against
pure-Python reference models.

The Catalyst ``aggregate`` fold in ``funnel`` encodes non-trivial strict
first-touch semantics (first step-i event strictly after the step-(i-1)
conversion time); a reference simulation over random event streams is the
guarantee the fixed-corpus oracle cannot give. Likewise cohort retention is
replayed against a dict-of-sets model.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

STEPS = ("view", "click", "purchase")
TYPES = STEPS + ("error", "signup")

_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user_id
        st.integers(min_value=0, max_value=120),  # minute offset
        st.sampled_from(TYPES),
    ),
    min_size=0,
    max_size=40,
)


def _funnel_model(rows: list[tuple[int, int, str]]) -> dict[str, int]:
    """Reference: replay each user's time-ordered step events, advancing
    one strict-ordered state machine (ties on time break by event type,
    matching the engine's sort_array struct ordering)."""
    per_user: dict[int, list[tuple[int, str]]] = {}
    for u, m, typ in rows:
        if typ in STEPS:
            per_user.setdefault(u, []).append((m, typ))
    counts = dict.fromkeys(STEPS, 0)
    for evs in per_user.values():
        state: list[int | None] = [None] * len(STEPS)
        for m, typ in sorted(evs):
            for i, s in enumerate(STEPS):
                if (
                    state[i] is None
                    and typ == s
                    and (i == 0 or (state[i - 1] is not None and m > state[i - 1]))
                ):
                    state[i] = m
                    break
        for i, s in enumerate(STEPS):
            if state[i] is not None:
                counts[s] += 1
    return counts


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_events)
def test_funnel_matches_reference_model(spark, rows):
    from gdutils_spark.operators.behavior import funnel

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + timedelta(minutes=m), typ) for u, m, typ in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {r["step"]: r["n_users"] for r in funnel(df, steps=STEPS).collect()}
    assert got == _funnel_model(rows)


def _windowed_funnel_model(
    rows: list[tuple[int, int, str]], within_minutes: int
) -> dict[str, int]:
    """Reference for the time-bounded funnel: same strict first-touch
    state machine, but step i only converts within `within_minutes` of
    the step-(i-1) conversion."""
    per_user: dict[int, list[tuple[int, str]]] = {}
    for u, m, typ in rows:
        if typ in STEPS:
            per_user.setdefault(u, []).append((m, typ))
    counts = dict.fromkeys(STEPS, 0)
    for evs in per_user.values():
        state: list[int | None] = [None] * len(STEPS)
        for m, typ in sorted(evs):
            for i, s in enumerate(STEPS):
                if (
                    state[i] is None
                    and typ == s
                    and (
                        i == 0
                        or (
                            state[i - 1] is not None
                            and m > state[i - 1]
                            and m <= state[i - 1] + within_minutes
                        )
                    )
                ):
                    state[i] = m
                    break
        for i, s in enumerate(STEPS):
            if state[i] is not None:
                counts[s] += 1
    return counts


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_events, st.integers(min_value=1, max_value=60))
def test_windowed_funnel_matches_reference_model(spark, rows, within_minutes):
    from gdutils_spark.operators.behavior import funnel

    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + timedelta(minutes=m), typ) for u, m, typ in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, steps=STEPS, within=timedelta(minutes=within_minutes)
        ).collect()
    }
    assert got == _windowed_funnel_model(rows, within_minutes)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # user_id
            st.integers(min_value=0, max_value=35),  # day offset
        ),
        min_size=1,
        max_size=25,
    )
)
def test_cohort_retention_matches_reference_model(spark, rows):
    from gdutils_spark.operators.behavior import cohort_retention

    base = datetime(2024, 1, 1)  # a Monday: offsets map to clean weeks
    df = spark.createDataFrame(
        [(u, base + timedelta(days=d)) for u, d in rows],
        "user_id long, ts timestamp",
    )
    # reference: user -> set of week indices (Monday-based)
    weeks: dict[int, set[int]] = {}
    for u, d in rows:
        weeks.setdefault(u, set()).add(d // 7)
    expect: dict[tuple[int, int], int] = {}
    for wk in weeks.values():
        cohort = min(wk)
        for w in wk:
            key = (cohort, w - cohort)
            expect[key] = expect.get(key, 0) + 1
    got = {}
    cohort0 = {}
    for r in cohort_retention(df).collect():
        cw = (r["cohort_week"] - base.date()).days // 7
        got[(cw, r["week_offset"])] = r["n_users"]
        if r["week_offset"] == 0:
            cohort0[cw] = r["n_users"]
    assert got == expect
    # retention_rate denominators are the offset-0 cohort sizes
    for r in cohort_retention(df).collect():
        cw = (r["cohort_week"] - base.date()).days // 7
        assert r["retention_rate"] == r["n_users"] / cohort0[cw]
