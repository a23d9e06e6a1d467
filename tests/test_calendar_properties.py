"""Property-based checks for the calendar operator family (SURVEY §5.3).

The reference's own dense-reindex is a silent no-op bug
(/root/reference/gdutils/__init__.py:166-169) — exactly the class of
defect these invariants catch:

1. mass preservation: the sum of all wide cells equals the input row
   count (count agg) / value sum (sum agg) — pivoting loses nothing;
2. wide/long consistency: every wide cell equals the matching long row;
3. dense spine: calendar_dense emits every month between min and max,
   including empty ones, exactly once.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdutils_spark.operators.calendar import calendar, calendar_dense, calendar_long

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("entity", T.StringType()),
        T.StructField("value", T.LongType()),
    ]
)

timestamps = st.datetimes(
    min_value=dt.datetime(2022, 11, 1), max_value=dt.datetime(2024, 3, 1)
)
rows = st.lists(
    st.tuples(timestamps, st.sampled_from(["a", "b", "c"]), st.integers(0, 100)),
    min_size=1,
    max_size=60,
)

slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data, EVENT_SCHEMA)


@given(data=rows)
@slow
def test_count_mass_preserved(spark, data):
    df = _df(spark, data)
    for variant in ("ymd", "ym", "md"):
        wide = calendar(df, "ts", variant, "count").collect()
        cells = sum(
            v for r in wide for c, v in r.asDict().items() if c.startswith("c")
        )
        assert cells == len(data)


@given(data=rows)
@slow
def test_sum_mass_preserved(spark, data):
    df = _df(spark, data)
    wide = calendar(df, "ts", "ym", "sum", value_col="value").collect()
    cells = sum(v for r in wide for c, v in r.asDict().items() if c.startswith("c"))
    assert cells == sum(v for _, _, v in data)


@given(data=rows)
@slow
def test_wide_matches_long(spark, data):
    df = _df(spark, data)
    wide = {
        (r["year"], r["month"]): r
        for r in calendar(df, "ts", "ymd", "count").collect()
    }
    for r in calendar_long(df, "ts", "ymd", "count", alias="n").collect():
        assert wide[(r["year"], r["month"])][f"c{r['day']:02d}"] == r["n"]


@given(data=rows)
@slow
def test_dense_spine_complete(spark, data):
    df = _df(spark, data)
    out = calendar_dense(df, "ts", "ymd", "count").collect()
    months = [(r["year"], r["month"]) for r in out]
    assert len(months) == len(set(months))  # exactly once
    lo = min(dt.date(y, m, 1) for y, m in months)
    hi = max(dt.date(y, m, 1) for y, m in months)
    want = []
    cur = lo
    while cur <= hi:
        want.append((cur.year, cur.month))
        cur = (cur.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
    assert sorted(months) == want
    # and the spine bounds are the data's month bounds
    ts_list = [t for t, _, _ in data]
    assert lo == min(ts_list).date().replace(day=1)
    assert hi == max(ts_list).date().replace(day=1)


@given(data=rows)
@slow
def test_any_semantics_counts_entities_once(spark, data):
    """'deployments' semantics: each entity counts at most once per cell
    regardless of how many events it has that day (SURVEY §7 trap 2)."""
    df = _df(spark, data)
    wide = calendar(df, "ts", "ym", "any", distinct_col="entity").collect()
    for r in wide:
        for c, v in r.asDict().items():
            if c.startswith("c"):
                assert v <= 3  # at most the 3 distinct entities
