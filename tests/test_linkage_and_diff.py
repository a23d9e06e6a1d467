"""Round-11 operators: fuzzy_blocked_join, snapshot_diff, edge_jaccard,
winsorized_summary — semantics pinned on tiny fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdutils_spark.operators.cdc import snapshot_diff
from gdutils_spark.operators.graph import edge_jaccard
from gdutils_spark.operators.linkage import fuzzy_blocked_join
from gdutils_spark.operators.summaries import winsorized_summary


def test_fuzzy_join_scores_and_threshold(spark):
    a = spark.createDataFrame(
        [(1, "R/V Blue Heron"), (2, "Atlantis"), (3, "noname")],
        "id long, name string",
    )
    b = spark.createDataFrame(
        [(10, "BLUE HERON (R/V)"), (11, "RV Atlantis II")],
        "id long, name string",
    )
    out = {
        (r["a_id"], r["b_id"]): r
        for r in fuzzy_blocked_join(
            a, b, "id", "name", "id", "name", threshold=0.4, max_token_freq=None
        ).collect()
    }
    # {r, v, blue, heron} == {blue, heron, r, v} → jaccard 1.0
    assert out[(1, 10)]["jaccard"] == 1.0
    assert out[(1, 10)]["n_common"] == 4
    # {atlantis} vs {rv, atlantis, ii} → 1/3 < 0.4 → filtered
    assert (2, 11) not in out
    with pytest.raises(ValueError, match="threshold"):
        fuzzy_blocked_join(a, b, "id", "name", "id", "name", threshold=0.0)
    with pytest.raises(ValueError, match="max_token_freq"):
        fuzzy_blocked_join(a, b, "id", "name", "id", "name", max_token_freq=0)


def test_fuzzy_join_hot_token_guard_keeps_scores_exact(spark):
    # every row shares the hot token "inc"; pairs also sharing a cold
    # token survive with the EXACT jaccard (hot token still counted in
    # verification); the pair sharing ONLY "inc" is never considered
    a = spark.createDataFrame(
        [(1, "acme inc"), (2, "zeta inc")], "id long, name string"
    )
    b = spark.createDataFrame(
        [(10, "acme inc"), (11, "omega inc")], "id long, name string"
    )
    out = {
        (r["a_id"], r["b_id"]): r
        for r in fuzzy_blocked_join(
            a, b, "id", "name", "id", "name", threshold=0.1, max_token_freq=1
        ).collect()
    }
    assert out[(1, 10)]["jaccard"] == 1.0  # exact: includes the hot token
    assert (2, 11) not in out  # only-hot overlap → no candidate
    assert (2, 10) not in out and (1, 11) not in out


def test_fuzzy_join_stage_path_identical_pairs(spark, tmp_path):
    # stage_path= (VERDICT r11 task 2) must produce byte-identical pairs
    # to the default cached path — the only difference is WHERE the token
    # tables live (parquet vs executor memory)
    a = spark.createDataFrame(
        [(1, "R/V Blue Heron"), (2, "Atlantis"), (3, "acme inc co")],
        "id long, name string",
    )
    b = spark.createDataFrame(
        [(10, "BLUE HERON (R/V)"), (11, "RV Atlantis II"), (12, "acme co inc")],
        "id long, name string",
    )
    kw = dict(threshold=0.3, max_token_freq=2)
    cached = sorted(
        map(tuple, fuzzy_blocked_join(a, b, "id", "name", "id", "name", **kw).collect())
    )
    staged = sorted(
        map(
            tuple,
            fuzzy_blocked_join(
                a, b, "id", "name", "id", "name",
                stage_path=str(tmp_path / "fuzzy_stage"), **kw
            ).collect(),
        )
    )
    assert cached == staged and len(staged) >= 2
    # the staged token tables are on disk, re-readable columnar files
    assert (tmp_path / "fuzzy_stage" / "tokens_a").exists()
    assert (tmp_path / "fuzzy_stage" / "tokens_b").exists()
    # and NOTHING lingers in executor storage after a staged call —
    # the ADVICE-r11 cache-accumulation fix (the default path caches,
    # which repeated bench invocations would accumulate)
    spark.catalog.clearCache()
    fuzzy_blocked_join(
        a, b, "id", "name", "id", "name",
        stage_path=str(tmp_path / "fuzzy_stage2"), **kw
    ).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 25.0, "X"), (4, 40.0, "D")],
        "k long, price double, status string",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert 1 not in out  # unchanged keys are omitted
    assert out[2]["change"] == "changed"
    assert out[2]["changed_cols"] == "price,status"  # sorted, comma-joined
    assert out[3]["change"] == "removed" and out[3]["changed_cols"] == ""
    assert out[4]["change"] == "added" and out[4]["changed_cols"] == ""


def test_snapshot_diff_null_safe_and_validation(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    # NULL == NULL under eqNullSafe → unchanged → empty diff
    assert snapshot_diff(old, new, ["k"]).count() == 0
    with pytest.raises(ValueError, match="key column"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="missing"):
        snapshot_diff(old, new, ["k"], ["nope"])


def test_snapshot_diff_reserved_key_name_raises(spark):
    df = spark.createDataFrame([(1, "x")], "change long, v string")
    with pytest.raises(ValueError, match="collide"):
        snapshot_diff(df, df, ["change"])


def test_edge_jaccard_triangle_plus_bridge(spark):
    # triangle 1-2-3 plus a pendant bridge 3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {(r["u"], r["v"]): r for r in edge_jaccard(edges).collect()}
    # edge (1,2): common {3}, union {1,2,3}\{1,2} ∪ ... = d1+d2-2-1 = 1
    assert out[(1, 2)]["n_common"] == 1 and out[(1, 2)]["jaccard"] == 1.0
    # edge (1,3): d=2, d=3 → union = 2+3-2-1 = 2 → 0.5
    assert out[(1, 3)]["jaccard"] == 0.5
    # bridge (3,4): no common neighbors → 0.0, present in output
    assert out[(3, 4)]["n_common"] == 0 and out[(3, 4)]["jaccard"] == 0.0
    # degree-1 pair: union empty → defined 0.0
    iso = edge_jaccard(
        spark.createDataFrame([(7, 8)], "src long, dst long")
    ).collect()[0]
    assert iso["jaccard"] == 0.0


def test_winsorized_summary_clamps_tails(spark):
    # 20 values 1..19 plus one 1000 outlier; p05/p95 clamp both tails
    rows = [("t", float(v)) for v in list(range(1, 20)) + [1000]]
    df = spark.createDataFrame(rows, "g string, v double")
    r = winsorized_summary(df, "g", "v", 0.05, 0.95).collect()[0]
    assert r["n"] == 20
    assert r["n_below"] == 1 and r["n_above"] == 1
    # exact replay of the pinned three-term assembly
    import numpy as np

    vals = np.array([v for _, v in rows])
    p_lo, p_hi = np.quantile(vals, 0.05), np.quantile(vals, 0.95)
    assert r["p_lo"] == pytest.approx(p_lo) and r["p_hi"] == pytest.approx(p_hi)
    expect = (vals.clip(p_lo, p_hi)).mean()
    assert r["winsorized_mean"] == pytest.approx(expect)
    with pytest.raises(ValueError, match="lower"):
        winsorized_summary(df, "g", "v", 0.9, 0.1)


def test_winsorized_summary_drops_null_nan(spark):
    rows = [("t", 1.0), ("t", 2.0), ("t", None), (None, 3.0),
            ("t", float("nan"))]
    df = spark.createDataFrame(rows, "g string, v double")
    r = winsorized_summary(df, "g", "v").collect()
    assert len(r) == 1 and r[0]["n"] == 2


def test_winsorized_summary_degenerate_groups(spark):
    # r12 latent-hunt edge cases (VERDICT r11 task 5): single-value
    # group, all-equal (flat) group, and a group where interpolated
    # quantiles leave NO mid-range value (sum_mid is an empty SUM ->
    # NULL -> must coalesce to 0.0, not poison the mean)
    df = spark.createDataFrame(
        [("one", 7.0)]
        + [("flat", 5.0)] * 4
        + [("nomid", 1.0), ("nomid", 2.0)],
        "g string, v double",
    )
    out = {
        r["g"]: r
        for r in winsorized_summary(df, "g", "v", 0.3, 0.6).collect()
    }
    # single value: p_lo == p_hi == v, nothing clamped, mean == v
    assert out["one"]["winsorized_mean"] == 7.0
    assert out["one"]["n_below"] == 0 and out["one"]["n_above"] == 0
    # flat group: everything is "mid", mean is the constant
    assert out["flat"]["winsorized_mean"] == 5.0
    # [1, 2] with p_lo=1.3, p_hi=1.6: BOTH values are tails, zero mid
    import numpy as np

    p_lo, p_hi = np.quantile([1.0, 2.0], 0.3), np.quantile([1.0, 2.0], 0.6)
    assert out["nomid"]["p_lo"] == pytest.approx(p_lo)
    assert out["nomid"]["n_below"] == 1 and out["nomid"]["n_above"] == 1
    assert out["nomid"]["winsorized_mean"] == pytest.approx((p_lo + p_hi) / 2)


def test_winsorized_summary_overflow_raises(spark):
    # non-ANSI Spark nulls a decimal-overflow cast; the guard must turn
    # the silent mid-value drop into a loud error (ADVICE r11)
    df = spark.createDataFrame(
        [("t", 1e17), ("t", 2.0), ("t", 3.0)], "g string, v double"
    )
    with pytest.raises(Exception, match="overflows"):
        winsorized_summary(df, "g", "v", 0.0, 1.0).collect()


def test_edit_join_hot_gram_guard_scores_stay_exact(spark):
    # guard mode drops hot grams from candidate generation (and the
    # count filter, whose bound they'd break) — surviving pairs must
    # still verify with the EXACT distance, and pairs sharing only hot
    # grams are missed (the documented trade)
    from gdutils_spark.operators.linkage import edit_blocked_join

    a = spark.createDataFrame(
        [(1, "prefix-alpha"), (2, "prefix-beta")], "id long, t string"
    )
    b = spark.createDataFrame(
        [(10, "prefix-alphaX"), (11, "prefix-gamma")], "id long, t string"
    )
    out = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in edit_blocked_join(
            a, b, "id", "t", "id", "t", max_dist=2, q=4, max_gram_freq=1
        ).collect()
    }
    # "alph" grams are unique per side -> (1, 10) survives, exact dist 1
    assert out.get((1, 10)) == 1
    # no false positives ever: every emitted dist <= 2 by exact verify
    assert all(d <= 2 for d in out.values())
    with pytest.raises(ValueError, match="max_gram_freq"):
        edit_blocked_join(a, b, "id", "t", "id", "t", max_gram_freq=0)


def test_edit_join_guard_mode_keeps_short_string_recall(spark):
    """r12 ADVICE: many same-length SHORT strings used to make their
    length-bucket row "hot", and the guard-mode anti-join then removed
    the guaranteed-recall path entirely — identical 5-char pairs
    vanished. Bucket rows (pos 0) are now exempt from the census and
    the anti-join."""
    from gdutils_spark.operators.linkage import edit_blocked_join

    # 30 distinct length-5 strings: every \x02len=5-ish bucket row
    # count (30) far exceeds the cap, but bucket rows are exempt
    strs = [f"ab{i:03d}" for i in range(30)]
    a = spark.createDataFrame(list(enumerate(strs)), "id long, t string")
    b = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(strs)], "id long, t string"
    )
    out = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in edit_blocked_join(
            a, b, "id", "t", "id", "t", max_dist=1, q=4, max_gram_freq=2
        ).collect()
    }
    # every identical pair must survive at dist 0
    for i in range(30):
        assert out.get((i, 100 + i)) == 0, f"lost short identical pair {i}"
    assert all(d <= 1 for d in out.values())


def test_edit_join_stage_path_identical_pairs(spark, tmp_path):
    from gdutils_spark.operators.linkage import edit_blocked_join

    a = spark.createDataFrame(
        [(1, "prefix-alpha"), (2, "prefix-beta")], "id long, t string"
    )
    b = spark.createDataFrame(
        [(10, "prefix-alphaX"), (11, "prefix-gamma")], "id long, t string"
    )
    kw = dict(max_dist=2, q=4, max_gram_freq=3)
    plain = sorted(
        map(tuple, edit_blocked_join(a, b, "id", "t", "id", "t", **kw).collect())
    )
    staged = sorted(
        map(
            tuple,
            edit_blocked_join(
                a, b, "id", "t", "id", "t",
                stage_path=str(tmp_path / "edit_stage"), **kw
            ).collect(),
        )
    )
    assert plain == staged and len(staged) >= 1
    assert (tmp_path / "edit_stage" / "grams_a").exists()


def test_fuzzy_between_matches_full_join(spark, tmp_path):
    """fuzzy_blocked_join_between(batch, corpus) must emit exactly the
    full join's rows for the same inputs — computed-corpus, staged-
    corpus (corpus_tokens_path, corpus=None), and guard-on variants."""
    import random

    from gdutils_spark.operators.linkage import (
        corpus_token_table,
        fuzzy_blocked_join,
        fuzzy_blocked_join_between,
    )

    random.seed(7)
    words = ["heron", "blue", "rv", "vessel", "glider", "unit", "alpha",
             "beta", "x9", "dock", "inc"]
    corpus_rows = [
        (i, " ".join(random.sample(words, random.randint(1, 4))))
        for i in range(60)
    ]
    batch_rows = [
        (100 + i, " ".join(random.sample(words, random.randint(1, 4))))
        for i in range(12)
    ]
    corpus = spark.createDataFrame(corpus_rows, "id long, name string")
    batch = spark.createDataFrame(batch_rows, "id long, name string")
    for freq in (None, 8):
        full = sorted(
            map(
                tuple,
                fuzzy_blocked_join(
                    batch, corpus, "id", "name", "id", "name",
                    threshold=0.4, max_token_freq=freq,
                ).collect(),
            )
        )
        betw = sorted(
            map(
                tuple,
                fuzzy_blocked_join_between(
                    batch, corpus, "id", "name", "id", "name",
                    threshold=0.4, max_token_freq=freq,
                ).collect(),
            )
        )
        assert betw == full and len(full) >= 1, f"freq={freq}"
    # staged corpus artifact: corpus never touched at query time
    path = str(tmp_path / "corpus_tokens")
    corpus_token_table(corpus, "id", "name").write.parquet(path)
    staged = sorted(
        map(
            tuple,
            fuzzy_blocked_join_between(
                batch, None, "id", "name",
                threshold=0.4, max_token_freq=8,
                corpus_tokens_path=path, spark=spark,
            ).collect(),
        )
    )
    full8 = sorted(
        map(
            tuple,
            fuzzy_blocked_join(
                batch, corpus, "id", "name", "id", "name",
                threshold=0.4, max_token_freq=8,
            ).collect(),
        )
    )
    assert staged == full8


def test_edit_between_matches_full_join(spark, tmp_path):
    """edit_blocked_join_between == edit_blocked_join for the same
    inputs, across: computed grams, staged grams (same k), staged grams
    built with a LARGER max_dist (wider bucket threshold -> candidate
    superset -> identical verified output), and guard mode."""
    import random

    from gdutils_spark.operators.linkage import (
        corpus_gram_table,
        edit_blocked_join,
        edit_blocked_join_between,
    )

    random.seed(11)
    alpha = "abcdef "
    corpus_strs = [
        "".join(random.choice(alpha) for _ in range(random.randint(0, 24)))
        for _ in range(50)
    ]
    # batch: mutated copies + fresh strings (short ones exercise buckets)
    batch_strs = [
        (s[: max(0, len(s) - 2)] + "zz") if random.random() < 0.5 else s
        for s in random.sample(corpus_strs, 10)
    ] + ["ab", "", "abcd"]
    corpus = spark.createDataFrame(
        list(enumerate(corpus_strs)), "id long, t string"
    )
    batch = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(batch_strs)], "id long, t string"
    )
    kw = dict(max_dist=2, q=3)
    full = sorted(
        map(
            tuple,
            edit_blocked_join(batch, corpus, "id", "t", "id", "t", **kw).collect(),
        )
    )
    assert len(full) >= 3  # the fixture must actually exercise matching
    betw = sorted(
        map(
            tuple,
            edit_blocked_join_between(
                batch, corpus, "id", "t", "id", "t", **kw
            ).collect(),
        )
    )
    assert betw == full
    # staged at the SAME k and at a LARGER k
    for stage_k in (2, 4):
        path = str(tmp_path / f"grams_k{stage_k}")
        corpus_gram_table(corpus, "id", "t", q=3, max_dist=stage_k).write.parquet(
            path
        )
        staged = sorted(
            map(
                tuple,
                edit_blocked_join_between(
                    batch, corpus, "id", "t", "id", "t",
                    corpus_grams_path=path, **kw,
                ).collect(),
            )
        )
        assert staged == full, f"stage_k={stage_k}"
    # guard mode: between == full under the same cap (count filter off,
    # bucket rows exempt on both)
    kwg = dict(max_dist=1, q=3, max_gram_freq=4)
    fullg = sorted(
        map(
            tuple,
            edit_blocked_join(batch, corpus, "id", "t", "id", "t", **kwg).collect(),
        )
    )
    betwg = sorted(
        map(
            tuple,
            edit_blocked_join_between(
                batch, corpus, "id", "t", "id", "t", **kwg
            ).collect(),
        )
    )
    assert betwg == fullg


def test_edit_between_guard_mode_with_staged_grams(spark, tmp_path):
    """Guard mode + staged corpus grams together (the nightly-ingest
    combination): census restricted to batch gram values over the
    STAGED parquet, bucket rows exempt, output == the full join's."""
    from gdutils_spark.operators.linkage import (
        corpus_gram_table,
        edit_blocked_join,
        edit_blocked_join_between,
    )

    corpus_strs = [f"entry {i:04d} common tail" for i in range(40)]
    batch_strs = ["entry 0003 common tail", "entry 9999 common tail", "ab"]
    corpus = spark.createDataFrame(
        list(enumerate(corpus_strs)), "id long, t string"
    )
    batch = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(batch_strs)], "id long, t string"
    )
    path = str(tmp_path / "grams")
    corpus_gram_table(corpus, "id", "t", q=4, max_dist=2).write.parquet(path)
    kw = dict(max_dist=2, q=4, max_gram_freq=5)
    full = sorted(
        map(
            tuple,
            edit_blocked_join(batch, corpus, "id", "t", "id", "t", **kw).collect(),
        )
    )
    staged = sorted(
        map(
            tuple,
            edit_blocked_join_between(
                batch, corpus, "id", "t", "id", "t",
                corpus_grams_path=path, **kw,
            ).collect(),
        )
    )
    assert staged == full and len(full) >= 1


def test_stage_corpus_grams_sidecar_validation(spark, tmp_path):
    """r13 ADVICE medium: a staged gram table carries a (q, max_dist)
    sidecar and edit_blocked_join_between RAISES on q mismatch or a
    query max_dist above the staged build — never a silently-empty
    result. Matching parameters still produce the full join's output."""
    import json
    import os

    from gdutils_spark.operators.linkage import (
        GRAM_META_NAME,
        edit_blocked_join,
        edit_blocked_join_between,
        stage_corpus_grams,
    )

    corpus = spark.createDataFrame(
        [(i, f"record {i:03d} tail") for i in range(20)], "id long, t string"
    )
    batch = spark.createDataFrame(
        [(100, "record 003 tail"), (101, "ab")], "id long, t string"
    )
    path = str(tmp_path / "grams")
    stage_corpus_grams(corpus, "id", "t", path, q=3, max_dist=2)
    with open(os.path.join(path, GRAM_META_NAME)) as f:
        assert json.load(f) == {"q": 3, "max_dist": 2}
    # matching parameters: staged == fresh == full
    kw = dict(max_dist=2, q=3)
    full = sorted(
        map(
            tuple,
            edit_blocked_join(batch, corpus, "id", "t", "id", "t", **kw).collect(),
        )
    )
    staged = sorted(
        map(
            tuple,
            edit_blocked_join_between(
                batch, corpus, "id", "t", "id", "t",
                corpus_grams_path=path, **kw,
            ).collect(),
        )
    )
    assert staged == full and len(full) >= 1
    # q mismatch raises (the stage-linkage --q 3 / edit-match-between
    # default q=4 trap the advisor called out)
    with pytest.raises(ValueError, match="q=3 but the query uses q=4"):
        edit_blocked_join_between(
            batch, corpus, "id", "t", "id", "t",
            max_dist=2, q=4, corpus_grams_path=path,
        )
    # query max_dist above the staged build raises
    with pytest.raises(ValueError, match="max_dist=2 < query max_dist=3"):
        edit_blocked_join_between(
            batch, corpus, "id", "t", "id", "t",
            max_dist=3, q=3, corpus_grams_path=path,
        )
    # smaller query max_dist is fine (candidate superset, identical verify)
    edit_blocked_join_between(
        batch, corpus, "id", "t", "id", "t",
        max_dist=1, q=3, corpus_grams_path=path,
    ).collect()


def test_legacy_staged_grams_probe_catches_wrong_q(spark, tmp_path):
    """Sidecar-less artifacts (staged before the sidecar existed) still
    fail loudly on a q mismatch via the bounded gram-length probe."""
    from gdutils_spark.operators.linkage import (
        corpus_gram_table,
        edit_blocked_join_between,
    )

    corpus = spark.createDataFrame(
        [(i, f"record {i:03d} tail") for i in range(10)], "id long, t string"
    )
    batch = spark.createDataFrame([(100, "record 003 tail")], "id long, t string")
    path = str(tmp_path / "grams_legacy")
    corpus_gram_table(corpus, "id", "t", q=3, max_dist=2).write.parquet(path)
    with pytest.raises(ValueError, match="grams of length 3"):
        edit_blocked_join_between(
            batch, corpus, "id", "t", "id", "t",
            max_dist=2, q=4, corpus_grams_path=path,
        )


def test_fuzzy_between_requires_batch(spark):
    """r13 ADVICE: batch=None raises a named error up front, not an
    AttributeError fifteen frames deep."""
    from gdutils_spark.operators.linkage import fuzzy_blocked_join_between

    corpus = spark.createDataFrame([(1, "a b")], "id long, t string")
    with pytest.raises(ValueError, match="batch is required"):
        fuzzy_blocked_join_between(None, corpus, "id", "t")
