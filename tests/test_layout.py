"""Z-order clustering key properties (oracle hash-parity for the
registry query lives in test_queries_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdutils_spark.operators.layout import (
    zorder_key,
    zorder_layout_stats,
)


def _morton2(a, b, bits):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_morton(spark):
    """The interleave matches a reference Morton encode on already-
    quantized integer cells (lo=0, hi=2^bits → cell == value)."""
    bits = 4
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b",
            zorder_key([("a", 0.0, 16.0), ("b", 0.0, 16.0)], bits).alias("z"),
        ).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton2(a, b, bits), (a, b)
    # bijective over the grid
    assert len(set(got.values())) == 256


def test_zorder_buckets_are_tight_rectangles(spark):
    """The clustering claim: each top-bits bucket's min/max envelope
    covers at most a quarter of EACH dimension's range (16 buckets over
    a 2-d 8-bit grid → 4×4 macro-cells), where a single-column sort
    would leave one dimension at full range."""
    import random

    rng = random.Random(3)
    rows = [
        (i, float(rng.uniform(0, 1000)), float(rng.uniform(0, 100)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    stats = zorder_layout_stats(
        df, [("x", 0.0, 1000.0), ("y", 0.0, 100.0)], bits=8, n_buckets_log2=4
    ).collect()
    assert len(stats) == 16  # dense uniform data hits every macro-cell
    for r in stats:
        assert r.max_x - r.min_x <= 1000.0 / 4 + 1e-6, r
        assert r.max_y - r.min_y <= 100.0 / 4 + 1e-6, r


def test_zorder_validates_bit_budget(spark):
    with pytest.raises(ValueError, match="62"):
        zorder_key([("a", 0.0, 1.0)] * 4, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])


def test_zorder_null_dim_yields_null_key_and_is_excluded(spark):
    """A NULL in any clustered dimension must NOT alias the range
    minimum — the key is NULL and layout stats exclude the row."""
    df = spark.createDataFrame(
        [(0.0, 5.0), (None, 5.0), (3.0, None)], "x double, y double"
    )
    keyed = df.select(
        zorder_key([("x", 0.0, 16.0), ("y", 0.0, 16.0)], 4).alias("z")
    ).collect()
    zs = [r.z for r in keyed]
    assert zs[0] is not None and zs[1] is None and zs[2] is None
    stats = zorder_layout_stats(
        df, [("x", 0.0, 16.0), ("y", 0.0, 16.0)], bits=4, n_buckets_log2=2
    ).collect()
    assert sum(r.n_rows for r in stats) == 1  # only the fully-non-NULL row


def test_zorder_validates_ranges_and_bucket_budget(spark):
    with pytest.raises(ValueError, match="must exceed"):
        zorder_key([("x", 5.0, 5.0)])
    with pytest.raises(ValueError, match="bits"):
        zorder_key([("x", 0.0, 1.0)], bits=0)
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="n_buckets_log2"):
        zorder_layout_stats(df, [("x", 0.0, 1.0)], bits=2, n_buckets_log2=4)


def test_zorder_nan_dim_yields_null_key(spark):
    """A NaN in any clustered dimension must route to the null file like
    a NULL — Spark's floor(NaN)→0L would otherwise silently cluster it
    at the range minimum (and DuckDB's clamp at the maximum)."""
    from gdutils_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(1.0, 1.0), (float("nan"), 1.0), (2.0, float("nan"))],
        "x double, y double",
    )
    got = df.select(
        zorder_key([("x", 0.0, 4.0), ("y", 0.0, 4.0)], bits=2).alias("z")
    ).collect()
    assert got[0].z is not None
    assert got[1].z is None and got[2].z is None


def test_zorder_uncastable_input_yields_null_key(spark):
    """A malformed STRING measurement (non-ANSI CAST → NULL double) must
    NULL the key like a real NULL — guarding only the original column
    would let greatest(NULL, 0) alias it into cell 0 (latent-hunt r10)."""
    from gdutils_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [("1.5", "2.5"), ("garbage", "2.5"), ("1.5", None)],
        "x string, y string",
    )
    got = df.select(
        zorder_key([("x", 0.0, 4.0), ("y", 0.0, 4.0)], bits=2).alias("z")
    ).collect()
    assert got[0].z is not None
    assert got[1].z is None and got[2].z is None


def test_zorder_sql_twin_try_cast_matches(spark):
    """The DuckDB twin NULL-keys uncastable inputs the same way (TRY_CAST
    both in the guard and the cell) and agrees bit-for-bit on numerics."""
    import duckdb

    from gdutils_spark.operators.layout import zorder_key, zorder_key_sql

    rows = [("1.5", "2.5"), ("garbage", "2.5"), ("3.9", "0.1")]
    df = spark.createDataFrame(rows, "x string, y string")
    specs = [("x", 0.0, 4.0), ("y", 0.0, 4.0)]
    got = [
        r.z for r in df.select(zorder_key(specs, bits=3).alias("z")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x VARCHAR, y VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {zorder_key_sql(specs, bits=3)} FROM t"
        ).fetchall()
    ]
    assert got == want


def test_zorder_infinity_and_saturating_floor_match_oracle(spark):
    """r13 latent hunt (VERDICT task 3, layout bit edges): ±inf and
    far-out-of-range finite values must CLAMP to the extreme cells on
    both engines — Spark's floor saturates at Long.MAX (never raises,
    even under ANSI) and the clamp then lands the top cell, matching
    DuckDB's double-space clamp. Pinned so a future floor/cast
    reordering can't reintroduce an ANSI-raise or an engine split."""
    import duckdb

    from gdutils_spark.operators.layout import zorder_key, zorder_key_sql

    df = spark.range(1).select(
        F.lit(float("inf")).alias("pinf"),
        F.lit(float("-inf")).alias("ninf"),
        F.lit(1e30).alias("big"),
        F.lit(-1e30).alias("small"),
    )
    got = {}
    for c in ("pinf", "ninf", "big", "small"):
        got[c] = df.select(
            zorder_key([(c, 0.0, 1.0)], bits=8).alias("z")
        ).collect()[0]["z"]
    assert got == {"pinf": 255, "ninf": 0, "big": 255, "small": 0}
    sql = zorder_key_sql([("x", 0.0, 1.0)], bits=8)
    for val, want in [("CAST('inf' AS DOUBLE)", 255), ("CAST('-inf' AS DOUBLE)", 0),
                      ("1e30", 255), ("-1e30", 0)]:
        r = duckdb.sql(f"SELECT {sql} AS z FROM (SELECT {val} AS x)").fetchone()[0]
        assert r == want
