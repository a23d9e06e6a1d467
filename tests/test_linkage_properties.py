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
