

def test_calendar_null_timestamps_dropped_like_pandas(spark):
    """NULL timestamps must not produce a (NULL, NULL)-keyed calendar
    row — the reference's pandas groupby drops NaT keys (dropna=True
    default), and a NULL row would also poison the dense spine join."""
    from gdutils_spark.operators.calendar import calendar, calendar_long

    df = spark.createDataFrame(
        [("2024-01-05",), (None,), ("2024-02-10",), (None,)],
        "ts string",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts")
    long = calendar_long(df, "ts", "ym").collect()
    assert all(r.year is not None and r.month is not None for r in long)
    assert sum(r.value for r in long) == 2
    wide = calendar(df, "ts", "ym").collect()
    assert all(r.year is not None for r in wide)
    assert len(wide) == 1
