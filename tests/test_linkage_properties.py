"""Property-based invariants for the round-11 operator family, each
checked against a direct Python model:

1. snapshot_diff == a dict-based diff (random keys, values incl. NULLs);
2. fuzzy_blocked_join (guard off) == the exact token-set Jaccard model,
   and turning the guard ON never changes an emitted score — it can
   only drop pairs whose every shared token is hot;
3. winsorized_summary == the numpy clip-then-mean model;
4. edge_jaccard == the neighbor-set model over random graphs.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from gdutils_spark.operators.cdc import snapshot_diff
from gdutils_spark.operators.graph import edge_jaccard
from gdutils_spark.operators.linkage import fuzzy_blocked_join
from gdutils_spark.operators.summaries import winsorized_summary

slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SNAP = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
    ]
)
snap_rows = st.dictionaries(
    st.integers(0, 15),
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),
        st.one_of(st.none(), st.sampled_from(["x", "y"])),
    ),
    max_size=12,
)


@given(old=snap_rows, new=snap_rows)
@slow
def test_snapshot_diff_matches_dict_model(spark, old, new):
    df_old = spark.createDataFrame([(k, v[0], v[1]) for k, v in old.items()], SNAP)
    df_new = spark.createDataFrame([(k, v[0], v[1]) for k, v in new.items()], SNAP)
    got = {
        r["k"]: (r["change"], r["changed_cols"])
        for r in snapshot_diff(df_old, df_new, ["k"]).collect()
    }
    expect = {}
    for k in set(old) | set(new):
        if k not in old:
            expect[k] = ("added", "")
        elif k not in new:
            expect[k] = ("removed", "")
        elif old[k] != new[k]:
            diffs = [c for c, i in (("a", 0), ("b", 1)) if old[k][i] != new[k][i]]
            expect[k] = ("changed", ",".join(sorted(diffs)))
    assert got == expect


name_strategy = st.lists(
    st.sampled_from(["acme", "inc", "blue", "heron", "rv", "x1", "xy2"]),
    min_size=1,
    max_size=4,
).map(" ".join)
table_rows = st.dictionaries(st.integers(0, 9), name_strategy, min_size=1, max_size=8)


def _tokens(name: str) -> frozenset[str]:
    return frozenset(t for t in re.split(r"[^a-z0-9]+", name.lower()) if t)


@given(a=table_rows, b=table_rows, thr=st.sampled_from([0.3, 0.5, 1.0]))
@slow
def test_fuzzy_join_matches_set_model_and_guard_only_drops(spark, a, b, thr):
    df_a = spark.createDataFrame(list(a.items()), "id long, name string")
    df_b = spark.createDataFrame(list(b.items()), "id long, name string")
    unguarded = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in fuzzy_blocked_join(
            df_a, df_b, "id", "name", "id", "name",
            threshold=thr, max_token_freq=None,
        ).collect()
    }
    expect = {}
    for ka, na in a.items():
        for kb, nb in b.items():
            ta, tb = _tokens(na), _tokens(nb)
            inter = len(ta & tb)
            if inter == 0:
                continue
            j = inter / len(ta | tb)
            if j >= thr:
                expect[(ka, kb)] = j
    assert set(unguarded) == set(expect)
    for pair, j in unguarded.items():
        assert abs(j - expect[pair]) < 1e-12
    guarded = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in fuzzy_blocked_join(
            df_a, df_b, "id", "name", "id", "name",
            threshold=thr, max_token_freq=2,
        ).collect()
    }
    # the guard is candidate-generation-only: every emitted pair exists
    # unguarded with the IDENTICAL exact score
    for pair, j in guarded.items():
        assert pair in unguarded and j == unguarded[pair]


vals = st.lists(
    st.integers(-10_000, 10_000).map(lambda c: c / 100.0),  # 2-decimal feed
    min_size=1,
    max_size=50,
)


@given(v=vals, lo=st.sampled_from([0.0, 0.05, 0.25]))
@slow
def test_winsorized_matches_numpy_clip_model(spark, v, lo):
    import numpy as np

    hi = 1.0 - lo if lo > 0 else 0.95
    df = spark.createDataFrame([("g", x) for x in v], "g string, v double")
    r = winsorized_summary(df, "g", "v", lo, hi).collect()[0]
    arr = np.array(v)
    p_lo, p_hi = np.quantile(arr, lo), np.quantile(arr, hi)
    assert r["n"] == len(v)
    assert r["n_below"] == int((arr < p_lo).sum())
    assert r["n_above"] == int((arr > p_hi).sum())
    assert abs(r["winsorized_mean"] - arr.clip(p_lo, p_hi).mean()) < 1e-9


edges_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
)


@given(edges=edges_strategy)
@slow
def test_edge_jaccard_matches_neighbor_set_model(spark, edges):
    pairs = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not pairs:
        return
    df = spark.createDataFrame(list(pairs), "src long, dst long")
    got = {
        (r["u"], r["v"]): (r["n_common"], r["jaccard"])
        for r in edge_jaccard(df).collect()
    }
    nbrs: dict[int, set[int]] = {}
    for u, v in pairs:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    assert set(got) == pairs
    for u, v in pairs:
        common = nbrs[u] & nbrs[v]
        union = (nbrs[u] | nbrs[v]) - {u, v}
        expect_j = len(common) / len(union) if union else 0.0
        assert got[(u, v)][0] == len(common)
        assert abs(got[(u, v)][1] - expect_j) < 1e-12


# -- round-12 operators -------------------------------------------------------

def _lev(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        cur = [i]
        for j, ct in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cs != ct)))
        prev = cur
    return prev[-1]


@given(
    a_strs=st.lists(st.text(alphabet="abcd", max_size=16), min_size=1, max_size=20),
    b_strs=st.lists(st.text(alphabet="abcd", max_size=16), min_size=1, max_size=20),
    k=st.integers(1, 3),
)
@slow
def test_edit_blocked_join_matches_brute_force(spark, a_strs, b_strs, k):
    from gdutils_spark.operators.linkage import edit_blocked_join

    a = spark.createDataFrame(list(enumerate(a_strs)), "id long, t string")
    b = spark.createDataFrame(list(enumerate(b_strs)), "id long, t string")
    out = sorted(
        map(tuple, edit_blocked_join(a, b, "id", "t", "id", "t", max_dist=k).collect())
    )
    expect = sorted(
        (i, j, _lev(x, y))
        for i, x in enumerate(a_strs)
        for j, y in enumerate(b_strs)
        if _lev(x, y) <= k
    )
    assert out == expect


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(0, 40),
            st.floats(-1e4, 1e4, allow_nan=False).map(lambda v: round(v, 2)),
        ),
        min_size=1,
        max_size=30,
    )
)
@slow
def test_group_trend_matches_numpy_polyfit(spark, rows):
    import numpy as np
    import pytest as _pt

    from gdutils_spark.operators.summaries import group_trend

    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = {r["g"]: r for r in group_trend(df, "g", "x", "y").collect()}
    for g in {r[0] for r in rows}:
        xs = np.array([x for gg, x, _ in rows if gg == g], dtype=float)
        ys = np.array([y for gg, _, y in rows if gg == g])
        r = out[g]
        assert r["n"] == len(xs)
        if len(set(xs)) < 2:
            assert r["slope"] is None and r["intercept"] is None
        else:
            slope, intercept = np.polyfit(xs, ys, 1)
            assert r["slope"] == _pt.approx(slope, rel=1e-6, abs=1e-9)
            assert r["intercept"] == _pt.approx(intercept, rel=1e-6, abs=1e-9)


def test_group_trend_overflow_raises_not_wraps(spark):
    """r12 ADVICE (medium): the y decimal cast was guarded but the long
    sums (Sxx, Sxyc) and the determinant n*Sxx - Sx^2 could wrap int64
    silently under non-ANSI Spark for large |x| or large groups. The
    per-group guard (n^2*max|x|^2 / 2*n^2*max|x|*max|yc|) must raise
    instead of emitting a confidently wrong slope."""
    import pytest as _pt

    from gdutils_spark.operators.summaries import group_trend

    # n=3, max|x|=4e9 -> n^2*mx^2 = 1.44e20 >> 4e18: Sxx=4.8e19 would
    # itself wrap int64 (9.2e18). Under ANSI Spark the x*x multiply
    # raises ARITHMETIC_OVERFLOW during aggregation (also loud — fine);
    # under non-ANSI the sums wrap silently and ONLY the guard saves
    # the result, so either message is the required loud failure.
    bad = [("g", 4_000_000_000 + i, float(i)) for i in range(3)]
    df = spark.createDataFrame(bad, "g string, x long, y double")
    with _pt.raises(
        Exception, match="magnitude bound exceeded|ARITHMETIC_OVERFLOW"
    ):
        group_trend(df, "g", "x", "y").collect()
    # non-ANSI path: the guard itself must fire.
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with _pt.raises(Exception, match="magnitude bound exceeded"):
            group_trend(df, "g", "x", "y").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)

    # a healthy group alongside still computes (guard is per-group in
    # expression form, but raise_error aborts the job — so healthy-only
    # input must be unaffected).
    ok = [("h", i, 2.0 * i + 1.0) for i in range(5)]
    out = group_trend(
        spark.createDataFrame(ok, "g string, x long, y double"), "g", "x", "y"
    ).collect()
    assert out[0]["slope"] == _pt.approx(2.0) and out[0]["intercept"] == _pt.approx(1.0)


def test_edit_blocked_join_long_strings_brute_force(spark):
    """Deterministic extended differential (caught the r12 bucket-range
    bug that the light hypothesis sweep missed: the probe window spans
    up to THREE pos-buckets, and a two-endpoint emission undercounted
    the count filter's tally, killing true pairs on longer strings
    where the count bound is tight)."""
    import random

    from gdutils_spark.operators.linkage import edit_blocked_join

    for seed in (0, 4):
        random.seed(seed)
        alpha = "abcdefgh "
        A = ["".join(random.choice(alpha) for _ in range(random.randint(0, 40)))
             for _ in range(25)]
        B = [
            s if random.random() < 0.4
            else (s[: max(0, len(s) - 3)]
                  + "".join(random.choice(alpha) for _ in range(3)))
            for s in A
        ]
        a = spark.createDataFrame(list(enumerate(A)), "id long, t string")
        b = spark.createDataFrame(list(enumerate(B)), "id long, t string")
        for k in (2, 3):
            out = sorted(
                map(tuple, edit_blocked_join(a, b, "id", "t", "id", "t", max_dist=k).collect())
            )
            exp = sorted(
                (i, j, _lev(x.lower(), y.lower()))
                for i, x in enumerate(A)
                for j, y in enumerate(B)
                if _lev(x.lower(), y.lower()) <= k
            )
            assert out == exp, f"seed={seed} k={k}"
