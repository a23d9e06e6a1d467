"""HLL sketch: mergeability (the property that makes it a 100 TB
operator), rank correctness vs a pure-Python model, and estimator
sanity."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gdutils_spark.operators.sketches import (
    DEFAULT_P,
    hll_merge,
    hll_registers,
    hll_report,
)

slow = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

values = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6), min_size=1, max_size=30
)


def _df(spark, vals, grp="g"):
    return spark.createDataFrame(
        [(grp, v) for v in vals], "src string, v string"
    )


def _model_registers(vals, p=DEFAULT_P):
    regs: dict[int, int] = {}
    width = 60 - p
    for v in set(vals):
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        bucket = h % (1 << p)
        w = h >> p
        rho = (width + 1) if w == 0 else (width + 1 - w.bit_length())
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


@given(values)
@slow
def test_registers_match_python_model(spark, vals):
    got = {
        r.bucket: r.reg
        for r in hll_registers(_df(spark, vals), "v", "src").collect()
    }
    assert got == _model_registers(vals)


@given(values, values)
@slow
def test_merge_equals_union_sketch(spark, a, b):
    """register(A ∪ B) == elementwise-max(register(A), register(B)) —
    the mergeability invariant incremental ingest relies on."""
    ra = hll_registers(_df(spark, a), "v", "src")
    rb = hll_registers(_df(spark, b), "v", "src")
    merged = {
        (r.grp, r.bucket): r.reg for r in hll_merge(ra, rb).collect()
    }
    union = {
        (r.grp, r.bucket): r.reg
        for r in hll_registers(_df(spark, a + b), "v", "src").collect()
    }
    assert merged == union


def test_estimate_within_error_bound(spark):
    """Raw HLL with m=256 has ~6.5% standard error; 5k distinct values
    must land within 4 sigma."""
    vals = [f"tok-{i}" for i in range(5000)]
    row = hll_report(_df(spark, vals), "v", "src").collect()[0]
    assert row.n_exact == 5000
    assert abs(row.rel_error) < 4 * 1.04 / (256**0.5)


def test_report_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", f"x{i}") for i in range(100)] + [("b", f"y{i}") for i in range(7)],
        "src string, v string",
    )
    rows = {r.grp: r for r in hll_report(df, "v", "src").collect()}
    assert rows["a"].n_exact == 100 and rows["b"].n_exact == 7
    # a tiny group cannot inflate past its bucket count's implied bound
    assert rows["b"].n_buckets_hit <= 7


def test_null_values_are_skipped(spark):
    """A NULL value must not seed a NULL-bucket register (which would
    NULL-poison the report fold); semantics match count_distinct's
    NULL-skipping."""
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b"), ("h", None)],
        "src string, v string",
    )
    regs = hll_registers(df, "v", "src").collect()
    assert all(r.bucket is not None and r.reg is not None for r in regs)
    assert {r.grp for r in regs} == {"g"}  # all-NULL group has no registers
    rows = {r.grp: r for r in hll_report(df, "v", "src").collect()}
    assert rows["g"].n_exact == 2
    assert rows["g"].hll_estimate is not None
    assert rows["g"].rel_error is not None


def test_small_range_correction_beats_raw(spark):
    """Linear counting must sharply improve small-cardinality estimates
    (the raw harmonic-mean form biases high when most registers are
    empty) and leave large cardinalities untouched."""
    from gdutils_spark.operators.sketches import hll_corrected

    small = [f"s{i}" for i in range(20)]
    big = [f"b{i}" for i in range(5000)]
    df = spark.createDataFrame(
        [("small", v) for v in small] + [("big", v) for v in big],
        "src string, v string",
    )
    rows = {r.grp: r for r in hll_corrected(hll_report(df, "v", "src")).collect()}
    s = rows["small"]
    assert abs(s.corrected_rel_error) < 0.15
    assert abs(s.corrected_rel_error) <= abs(s.rel_error)
    b = rows["big"]
    assert b.hll_corrected == b.hll_estimate  # out of linear-counting regime


@given(st.integers(min_value=1, max_value=300))
@slow
def test_correction_accuracy_across_cardinalities(spark, n):
    """Property: in the small-range regime the corrected estimate lands
    within 4x the linear-counting std error sqrt(m·(e^t − t − 1))/t·... —
    use the practical bound: ≤ max(2, 15% of n)."""
    from gdutils_spark.operators.sketches import hll_corrected

    vals = [f"v{i}" for i in range(n)]
    row = hll_corrected(hll_report(_df(spark, vals), "v", "src")).collect()[0]
    assert row.n_exact == n
    assert abs(row.hll_corrected - n) <= max(2.0, 0.15 * n)


def test_cms_overestimates_and_merges(spark):
    """CMS invariants: estimate >= exact for every value (min-of-counters
    never undercounts), and sketches of a split corpus merged by
    elementwise sum equal the whole-corpus sketch."""
    from gdutils_spark.operators.sketches import (
        cms_estimate,
        cms_merge,
        cms_registers,
    )

    vals = [f"t{i % 37}" for i in range(500)] + ["hot"] * 200
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    reg = cms_registers(df, "v")
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("exact"))
    est = {r.v: r for r in cms_estimate(reg, exact, "v").collect()}
    for v, r in est.items():
        assert r.cms_est >= r.exact, v
    assert est["hot"].cms_est >= 200
    # total mass per row == N (each occurrence lands once per row)
    per_row = {r.row: r.s for r in reg.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert all(s == len(vals) for s in per_row.values())
    # mergeability
    half = len(vals) // 2
    a = cms_registers(spark.createDataFrame([(v,) for v in vals[:half]], "v string"), "v")
    b = cms_registers(spark.createDataFrame([(v,) for v in vals[half:]], "v string"), "v")
    merged = {(r.row, r.col): r.cnt for r in cms_merge(a, b).collect()}
    whole = {(r.row, r.col): r.cnt for r in reg.collect()}
    assert merged == whole


def test_cms_null_and_weighted(spark):
    from gdutils_spark.operators.sketches import cms_estimate, cms_registers

    df = spark.createDataFrame(
        [("a", 3), (None, 5), ("a", 2), ("b", 1)], "v string, w int"
    )
    reg = cms_registers(df, "v", weight_col="w")
    probes = spark.createDataFrame([("a",), ("b",)], "v string")
    est = {r.v: r.cms_est for r in cms_estimate(reg, probes, "v").collect()}
    assert est["a"] >= 5 and est["b"] >= 1  # weights summed, NULLs skipped
    total = reg.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert all(r.s == 6 for r in total)


def test_bloom_no_false_negatives_and_merge(spark):
    from gdutils_spark.operators.sketches import (
        bloom_bits,
        bloom_merge,
        bloom_might_contain,
    )

    present = [f"in-{i}" for i in range(300)]
    absent = [f"out-{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in present], "v string")
    words = bloom_bits(df, "v")
    probes = spark.createDataFrame([(v,) for v in present + absent], "v string")
    got = {r.v: r.might_contain for r in bloom_might_contain(words, probes, "v").collect()}
    assert all(got[v] for v in present)  # NO false negatives, ever
    fp = sum(got[v] for v in absent) / len(absent)
    # m=4096, k=4, n=300 → fp ≈ (1-e^(-0.293))^4 ≈ 0.4%; allow slack
    assert fp < 0.05, fp
    # mergeability: OR of half-sketches == whole-corpus sketch
    a = bloom_bits(spark.createDataFrame([(v,) for v in present[:150]], "v string"), "v")
    b = bloom_bits(spark.createDataFrame([(v,) for v in present[150:]], "v string"), "v")
    merged = {(r.word, r.bits) for r in bloom_merge(a, b).collect()}
    whole = {(r.word, r.bits) for r in words.collect()}
    assert merged == whole


def test_null_probe_values_are_definitive(spark):
    """NULL probe values: builders skip NULLs, so probes answer
    'definitely absent' — bloom might_contain=false (not NULL, which
    would match neither branch downstream) and cms_est=0."""
    from gdutils_spark.operators.sketches import (
        bloom_bits,
        bloom_might_contain,
        cms_estimate,
        cms_registers,
    )

    df = spark.createDataFrame([("a",), ("b",)], "v string")
    probes = spark.createDataFrame([("a",), (None,)], "v string")
    words = bloom_bits(df, "v")
    got = {
        r.v: r.might_contain
        for r in bloom_might_contain(words, probes, "v").collect()
    }
    assert got["a"] is True
    assert got[None] is False  # false, never NULL
    reg = cms_registers(df, "v")
    est = {r.v: r.cms_est for r in cms_estimate(reg, probes, "v").collect()}
    assert est["a"] >= 1
    assert est[None] == 0


def test_probe_column_collisions_raise(spark):
    """Probe relations carrying sketch-internal column names must fail
    fast instead of producing ambiguous-reference errors downstream."""
    import pytest

    from gdutils_spark.operators.sketches import (
        bloom_bits,
        bloom_might_contain,
        cms_estimate,
        cms_registers,
    )

    df = spark.createDataFrame([("a",)], "v string")
    reg = cms_registers(df, "v")
    bad = spark.createDataFrame([("a", 1)], "v string, row int")
    with pytest.raises(ValueError, match="collide"):
        cms_estimate(reg, bad, "v")
    words = bloom_bits(df, "v")
    bad2 = spark.createDataFrame([("a", 1)], "v string, word int")
    with pytest.raises(ValueError, match="collide"):
        bloom_might_contain(words, bad2, "v")


def test_hist_registers_merge_equals_whole(spark):
    """Histogram mergeability: hist_merge of two half-corpus register
    tables == the whole-corpus register table (exact integer counts)."""
    from gdutils_spark.operators.sketches import hist_merge, hist_registers

    vals = [(i, float(i % 97)) for i in range(500)] + [(500, None)]
    df = spark.createDataFrame(vals, "id long, v double")
    whole = {
        (r.bin, r.cnt)
        for r in hist_registers(df, "v", 0.0, 100.0, 50).collect()
    }
    a = hist_registers(df.where("id % 2 = 0"), "v", 0.0, 100.0, 50)
    b = hist_registers(df.where("id % 2 = 1"), "v", 0.0, 100.0, 50)
    merged = {(r.bin, r.cnt) for r in hist_merge(a, b).collect()}
    assert merged == whole
    assert sum(c for _, c in whole) == 500  # NULL skipped


def test_hist_registers_clamps_out_of_range(spark):
    from gdutils_spark.operators.sketches import hist_registers

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (99.9,), (100.0,), (250.0,)], "v double"
    )
    got = {r.bin: r.cnt for r in hist_registers(df, "v", 0.0, 100.0, 10).collect()}
    assert got[0] == 2  # -5 clamped in, 0.0 in bin 0
    assert got[9] == 3  # 99.9 in last bin; 100.0 and 250.0 clamped in


def test_hist_quantiles_exact_on_bin_centers(spark):
    """With every value on a distinct bin's left edge and one value per
    bin, the uniform-in-bin interpolation is exact: est(q) == the
    quantile_cont value for integer ranks."""
    from gdutils_spark.operators.sketches import hist_quantiles, hist_registers

    # values 0..9 with lo=0 hi=10 n_bins=10 → one per bin, cnt=1 each
    df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    reg = hist_registers(df, "v", 0.0, 10.0, 10)
    got = {r.q: r.est for r in hist_quantiles(reg, [0.0, 0.5, 1.0], 0.0, 10.0, 10).collect()}
    # t = q*(N-1): q=0 → 0th value = 0.0; q=0.5 → rank 4.5 → 4.5;
    # q=1 → rank 9 → 9.0 (within bin 9: 9 + (9-9)/1 = 9.0)
    assert got[0.0] == 0.0
    assert got[0.5] == 4.5
    assert got[1.0] == 9.0


def test_hist_quantiles_error_bounded_by_bin_width(spark):
    """On a dense uniform-ish corpus the estimate should sit within one
    bin width of the exact quantile — the resolution n_bins buys."""
    from pyspark.sql import functions as F

    from gdutils_spark.operators.sketches import hist_quantiles, hist_registers

    df = spark.range(2000).select(
        ((F.col("id") * 37 % 1000).cast("double") / 10.0).alias("v")
    )
    reg = hist_registers(df, "v", 0.0, 100.0, 100)
    ests = {r.q: r.est for r in hist_quantiles(reg, [0.5, 0.9, 0.99], 0.0, 100.0, 100).collect()}
    exact = df.agg(
        *[F.percentile("v", F.lit(q)).alias(str(q)) for q in (0.5, 0.9, 0.99)]
    ).collect()[0]
    for q in (0.5, 0.9, 0.99):
        assert abs(ests[q] - exact[str(q)]) <= 1.0 + 1e-9, (q, ests[q], exact[str(q)])


def test_hist_outliers_clamp_to_edge_bins_not_int_wrap(spark):
    """A far outlier (e.g. an epoch-millis value against a small range)
    must land in the documented edge bin — clamping happens on the LONG
    floor result BEFORE the int cast, so int32 wraparound can't scatter
    it into an arbitrary interior bin."""
    from gdutils_spark.operators.sketches import hist_registers

    df = spark.createDataFrame(
        [(3.0e9,), (-3.0e9,), (50.0,)], "v double"
    )
    got = {r.bin: r.cnt for r in hist_registers(df, "v", 0.0, 100.0, 10).collect()}
    assert got == {9: 1, 0: 1, 5: 1}


def test_hist_validates_inputs(spark):
    import pytest

    from gdutils_spark.operators.sketches import (
        hist_quantiles,
        hist_registers,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="must exceed"):
        hist_registers(df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError, match="must be positive"):
        hist_registers(df, "v", 0.0, 1.0, 0)
    reg = hist_registers(df, "v", 0.0, 10.0, 10)
    with pytest.raises(ValueError, match="outside"):
        hist_quantiles(reg, [0.5, 1.5], 0.0, 10.0, 10)


def test_hll_estimate_from_merged_registers_matches_report(spark):
    """hll_estimate over a hll_merge'd register table == hll_report's
    estimate over the combined corpus — the sketch-algebra invariant
    that makes union (and inclusion-exclusion intersection) estimates
    valid without rescanning either side."""
    from gdutils_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
        hll_report,
    )

    a = [f"x{i}" for i in range(400)]
    b = [f"x{i}" for i in range(200, 700)]  # genuine overlap
    df_a = spark.createDataFrame([("g", v) for v in a], "src string, v string")
    df_b = spark.createDataFrame([("g", v) for v in b], "src string, v string")
    both = spark.createDataFrame(
        [("g", v) for v in a + b], "src string, v string"
    )
    merged = hll_merge(
        hll_registers(df_a, "v", "src"), hll_registers(df_b, "v", "src")
    )
    est = hll_estimate(merged).collect()[0]
    rep = hll_report(both, "v", "src").collect()[0]
    assert est.hll_estimate == rep.hll_estimate
    assert est.n_buckets_hit == rep.n_buckets_hit
    assert est.sum_inv == rep.sum_inv


def test_bottomk_merge_equals_whole_sample(spark):
    """KMV mergeability: bottom-k of two half-corpus samples merged ==
    bottom-k of the whole corpus (min-k of a union)."""
    from gdutils_spark.operators.sketches import bottomk_merge, bottomk_sample

    df = spark.createDataFrame(
        [(i, float(i % 83)) for i in range(1000)], "id long, v double"
    )
    whole = [
        (r.hk, r.val) for r in bottomk_sample(df, "id", "v", 64).collect()
    ]
    a = bottomk_sample(df.where("id % 2 = 0"), "id", "v", 64)
    b = bottomk_sample(df.where("id % 2 = 1"), "id", "v", 64)
    merged = [(r.hk, r.val) for r in bottomk_merge(a, b, 64).collect()]
    assert sorted(merged) == sorted(whole)
    assert len(whole) == 64


def test_bottomk_quantiles_track_population(spark):
    """On a large uniform-ish population the k=256 sample quantiles land
    within a few rank-percent of the exact quantiles."""
    from pyspark.sql import functions as F

    from gdutils_spark.operators.sketches import bottomk_quantiles, bottomk_sample

    df = spark.range(5000).select(
        F.col("id"), ((F.col("id") * 41 % 5000).cast("double") / 50.0).alias("v")
    )
    s = bottomk_sample(df, "id", "v", 256)
    ests = {r.q: r.est for r in bottomk_quantiles(s, [0.5, 0.9]).collect()}
    exact = df.agg(
        F.percentile("v", F.lit(0.5)).alias("m"),
        F.percentile("v", F.lit(0.9)).alias("n"),
    ).collect()[0]
    # rank error ~1/sqrt(256) ≈ 6%; values span [0, 100) so allow ~8 units
    assert abs(ests[0.5] - exact.m) < 8.0
    assert abs(ests[0.9] - exact.n) < 8.0
    import pytest

    with pytest.raises(ValueError, match="outside"):
        bottomk_quantiles(s, [2.0])


def test_bottomk_sample_skips_nulls_and_plans_takeordered(spark):
    from gdutils_spark.operators.sketches import bottomk_sample
    from gdutils_spark.plans import formatted_plan

    df = spark.createDataFrame(
        [(1, 5.0), (None, 1.0), (3, None), (4, 2.0)], "id long, v double"
    )
    s = bottomk_sample(df, "id", "v", 10)
    assert s.count() == 2  # NULL key and NULL value rows skipped
    assert "TakeOrderedAndProject" in formatted_plan(s)


def test_hist_grouped_registers_and_quantiles(spark):
    """Grouped histogram: per-group registers merge per group and the
    per-group quantile estimates are independent across groups."""
    from gdutils_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_registers,
    )

    rows = [("a", float(i % 10)) for i in range(100)] + [
        ("b", 50.0 + float(i % 10)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    reg = hist_registers(df, "v", 0.0, 100.0, 100, group_col="g")
    assert set(reg.columns) == {"grp", "bin", "cnt"}
    # merge of group-split halves == whole (per group)
    a = hist_registers(df.where("v < 50"), "v", 0.0, 100.0, 100, group_col="g")
    b = hist_registers(df.where("v >= 50"), "v", 0.0, 100.0, 100, group_col="g")
    merged = {(r.grp, r.bin, r.cnt) for r in hist_merge(a, b).collect()}
    whole = {(r.grp, r.bin, r.cnt) for r in reg.collect()}
    assert merged == whole
    ests = {
        (r.grp, r.q): r.est
        for r in hist_quantiles(reg, [0.5], 0.0, 100.0, 100).collect()
    }
    assert 0.0 <= ests[("a", 0.5)] <= 10.0
    assert 50.0 <= ests[("b", 0.5)] <= 60.0


# ---------------------------------------------------------------------------
# KMV distinct-value sketch: set algebra (union merge, Jaccard,
# intersection) on md5-pinned bottom-k member sets.
# ---------------------------------------------------------------------------


def test_kmv_merge_equals_whole_set_sketch(spark):
    """Sketch of the union == merge of per-shard sketches (member-exact,
    not just estimate-close) — the incremental property."""
    from gdutils_spark.operators.sketches import kmv_merge, kmv_sketch

    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").alias("v"))
    whole = a.unionByName(b)
    k = 64
    merged = sorted(
        r.hk for r in kmv_merge(kmv_sketch(a, "v", k), kmv_sketch(b, "v", k), k).collect()
    )
    direct = sorted(r.hk for r in kmv_sketch(whole, "v", k).collect())
    assert merged == direct and len(direct) == k


def test_kmv_estimate_exact_under_capacity_and_bounded_at_capacity(spark):
    from gdutils_spark.operators.sketches import kmv_estimate, kmv_sketch

    small = spark.range(0, 40).select(F.col("id").alias("v"))
    row = kmv_estimate(kmv_sketch(small, "v", 256), 256).collect()[0]
    assert row.n_hashes == 40 and row.est_distinct == 40.0
    big = spark.range(0, 20000).select(F.col("id").alias("v"))
    est = kmv_estimate(kmv_sketch(big, "v", 256), 256).collect()[0]
    # rel error ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est.est_distinct - 20000) / 20000 < 0.25


def test_kmv_overlap_report_tracks_exact_sets(spark):
    from gdutils_spark.operators.sketches import kmv_overlap_report

    a = spark.range(0, 8000).select(F.col("id").alias("v"))
    b = spark.range(4000, 12000).select(F.col("id").alias("v"))
    r = kmv_overlap_report(a, b, "v", k=256).collect()[0]
    assert (r.n_a_exact, r.n_b_exact, r.n_inter_exact) == (8000, 8000, 4000)
    # true jaccard = 4000/12000 = 1/3; binomial error on 256 members
    assert abs(r.jaccard_est - 1 / 3) < 0.15
    assert abs(r.est_intersection - 4000) / 4000 < 0.45
    assert abs(r.est_union - 12000) / 12000 < 0.25
    # skips NULLs like every builder
    an = a.select(F.when(F.col("v") < 0, F.col("v")).alias("v"))
    rn = kmv_overlap_report(an, b, "v", k=256).collect()[0]
    assert rn.n_a_exact == 0 and rn.n_inter_exact == 0


def test_mad_outlier_summary_flags_known_outliers(spark):
    from gdutils_spark.operators.summaries import mad_outlier_summary

    rows = [("a", float(v)) for v in range(1, 22)] + [
        ("a", 1000.0),            # obvious outlier
        ("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 99.0),  # MAD = 0 group
        ("c", None),
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {r.grp: r for r in mad_outlier_summary(df, "v", "grp").collect()}
    # group a: median 11.5, MAD ~5.5 → only 1000 crosses 3.5·MAD/0.6745
    assert got["a"].n == 22 and got["a"].n_outliers == 1
    # group b: MAD = 0 → anything off-median is an outlier, no div crash
    assert got["b"].mad == 0.0 and got["b"].n_outliers == 1
    # NULL-only group dropped entirely
    assert "c" not in got


def test_bottomk_grouped_sample_merge_and_quantiles(spark):
    """Per-group bottom-k: the sample is the k smallest hashed keys
    WITHIN each group, per-group merge of shard samples equals the
    whole-corpus grouped sample, and quantiles come out per group."""
    from gdutils_spark.operators.dedup import _md5_int64
    from gdutils_spark.operators.sketches import (
        bottomk_merge,
        bottomk_quantiles,
        bottomk_sample,
    )

    rows = [(i, float(i % 97), "a" if i % 3 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v double, g string")
    k = 16
    got = bottomk_sample(df, "id", "v", k, group_col="g")
    # python model: per group, k smallest (md5(id), v)
    hashed = {
        r.id: r.hk
        for r in df.select(
            "id", _md5_int64(F.col("id").cast("string")).alias("hk")
        ).collect()
    }
    by_g = {}
    for i, v, g in rows:
        by_g.setdefault(g, []).append((hashed[i], v))
    want = {
        g: sorted(pairs)[:k] for g, pairs in by_g.items()
    }
    got_rows = sorted((r.grp, r.hk, r.val) for r in got.collect())
    want_rows = sorted(
        (g, hk, v) for g, pairs in want.items() for hk, v in pairs
    )
    assert got_rows == want_rows
    # merge lemma per group: shard samples combine to the whole sample
    sa = bottomk_sample(df.where(F.col("id") % 2 == 0), "id", "v", k, group_col="g")
    sb = bottomk_sample(df.where(F.col("id") % 2 == 1), "id", "v", k, group_col="g")
    merged = sorted(
        (r.grp, r.hk, r.val) for r in bottomk_merge(sa, sb, k).collect()
    )
    assert merged == want_rows
    # per-group quantiles: one (grp, q, est) row per group per q
    qs = bottomk_quantiles(got, [0.5])
    est = {(r.grp, r.q): r.est for r in qs.collect()}
    assert set(est) == {("a", 0.5), ("b", 0.5)}
    import statistics

    for g in ("a", "b"):
        vals = [v for _hk, v in want[g]]
        assert est[(g, 0.5)] == statistics.median(vals)


def test_bottomk_grouped_skips_null_groups(spark):
    from gdutils_spark.operators.sketches import bottomk_sample

    df = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, None), (3, 3.0, "a")],
        "id long, v double, g string",
    )
    got = bottomk_sample(df, "id", "v", 8, group_col="g").collect()
    assert all(r.grp == "a" for r in got) and len(got) == 2


def test_cms_heavy_hitters_no_false_negatives_and_merge(spark):
    """Every true heavy hitter in the candidate set survives the cut
    (CMS never undercounts); the report off MERGED half-corpus sketches
    equals the whole-corpus report; threshold is validated."""
    import pytest

    from gdutils_spark.operators.sketches import (
        cms_heavy_hitters,
        cms_merge,
        cms_registers,
    )

    # zipf-ish: token t_i appears ~ 600 // (i + 1) times
    rows = [(f"t{i}",) for i in range(40) for _ in range(600 // (i + 1))]
    df = spark.createDataFrame(rows, "tok string")
    reg = cms_registers(df, "tok")
    exact = df.groupBy("tok").agg(F.count(F.lit(1)).alias("exact"))
    threshold = 60
    got = cms_heavy_hitters(reg, exact, "tok", threshold)
    hitters = {r.tok: r.cms_est for r in got.collect()}
    truth = {r.tok: r.exact for r in exact.collect()}
    for tok, n in truth.items():
        if n >= threshold:
            assert tok in hitters, f"true hitter {tok} missed"
            assert hitters[tok] >= n  # never undercounts
    # merged shard sketches give the identical report
    ra = cms_registers(df.where(F.length("tok") % 2 == 0), "tok")
    rb = cms_registers(df.where(F.length("tok") % 2 == 1), "tok")
    merged = cms_heavy_hitters(cms_merge(ra, rb), exact, "tok", threshold)
    assert sorted((r.tok, r.cms_est) for r in merged.collect()) == sorted(
        hitters.items()
    )
    with pytest.raises(ValueError, match="threshold"):
        cms_heavy_hitters(reg, exact, "tok", 0)


def test_hist_registers_skip_nan_like_null(spark):
    """NaN values are skipped (Spark floor(NaN)→0L would land them in
    bin 0 while an oracle clamp sends them to the top bin — neither is
    right; the NULL rule applies)."""
    from gdutils_spark.operators.sketches import hist_registers

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (None,), (2.0,)], "v double"
    )
    regs = hist_registers(df, "v", 0.0, 4.0, 4)
    assert sum(r.cnt for r in regs.collect()) == 2


def test_hist_quantiles_rejects_mismatched_geometry(spark):
    """A register table whose bins fall outside [0, n_bins) proves the
    declared geometry is not the build's — fail fast, not silently
    wrong estimates."""
    import pytest

    from gdutils_spark.operators.sketches import hist_quantiles

    bad = spark.createDataFrame([(0, 5), (700, 3)], "bin int, cnt long")
    with pytest.raises(ValueError, match="outside"):
        hist_quantiles(bad, [0.5], 0.0, 1.0, n_bins=512)


def test_cms_estimate_rejects_mismatched_geometry(spark):
    """Registers built bigger than the declared depth x width would make
    the probe join miss cells and UNDER-estimate (breaking the
    never-undercount guarantee) — fail fast instead."""
    import pytest

    from gdutils_spark.operators.sketches import cms_estimate

    big = spark.createDataFrame(
        [(0, 5, 3), (5, 2000, 7)], "row int, col int, cnt long"
    )
    probes = spark.createDataFrame([("x",)], "tok string")
    with pytest.raises(ValueError, match="geometry"):
        cms_estimate(big, probes, "tok")  # default depth=4, width covers neither


def test_cms_estimate_validate_false_skips_probe_same_result(spark):
    """The trusted-caller escape hatch (the apply_cdc convention): on a
    clean register table validate=False returns identical estimates with
    ZERO eager jobs at call time (the geometry probe is a collect() —
    if it ran, the dedicated job-group counter moves)."""
    from gdutils_spark.operators.sketches import cms_estimate, cms_registers

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",), ("c",), ("c",)], "tok string"
    )
    reg = cms_registers(df, "tok").localCheckpoint()
    probes = spark.createDataFrame([("a",), ("c",), ("zzz",)], "tok string")
    checked = {
        r.tok: r.cms_est for r in cms_estimate(reg, probes, "tok").collect()
    }
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("cms-validate-off", "cms-validate-off")
    try:
        trusted = cms_estimate(reg, probes, "tok", validate=False)
    finally:
        sc.setJobGroup(None, None)
    ran = len(tracker.getJobIdsForGroup("cms-validate-off") or [])
    assert ran == 0, "validate=False must not run the eager geometry probe"
    assert {r.tok: r.cms_est for r in trusted.collect()} == checked
    assert checked["a"] >= 2 and checked["c"] >= 3 and checked["zzz"] >= 0


def test_cms_estimate_validate_false_caller_owns_geometry(spark):
    """validate=False does NOT raise on registers validate=True rejects —
    the documented trade: the caller owns the build geometry."""
    from gdutils_spark.operators.sketches import cms_estimate

    big = spark.createDataFrame(
        [(0, 5, 3), (5, 2000, 7)], "row int, col int, cnt long"
    )
    probes = spark.createDataFrame([("x",)], "tok string")
    # trusted path: no probe action, the (documented) under-estimate risk
    # is the caller's — the call itself must not raise
    assert cms_estimate(big, probes, "tok", validate=False).count() == 1


def test_hist_quantiles_validate_false_skips_probe_same_result(spark):
    """hist_quantiles' validate=False twin: identical estimates, zero
    eager jobs at call time."""
    from gdutils_spark.operators.sketches import hist_quantiles, hist_registers

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    reg = hist_registers(df, "v", 0.0, 100.0, 10).localCheckpoint()
    checked = {
        r.q: r.est
        for r in hist_quantiles(reg, [0.25, 0.5], 0.0, 100.0, 10).collect()
    }
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    sc.setJobGroup("hist-validate-off", "hist-validate-off")
    try:
        trusted = hist_quantiles(
            reg, [0.25, 0.5], 0.0, 100.0, 10, validate=False
        )
    finally:
        sc.setJobGroup(None, None)
    ran = len(tracker.getJobIdsForGroup("hist-validate-off") or [])
    assert ran == 0, "validate=False must not run the eager geometry probe"
    assert {r.q: r.est for r in trusted.collect()} == checked


def test_cms_heavy_hitters_validate_flag_threads_through(spark):
    """cms_heavy_hitters forwards validate= to the underlying estimate:
    the bad-geometry register table raises by default, passes trusted."""
    import pytest

    from gdutils_spark.operators.sketches import cms_heavy_hitters

    big = spark.createDataFrame(
        [(0, 5, 3), (5, 2000, 7)], "row int, col int, cnt long"
    )
    cands = spark.createDataFrame([("x",)], "tok string")
    with pytest.raises(ValueError, match="geometry"):
        cms_heavy_hitters(big, cands, "tok", threshold=1)
    cms_heavy_hitters(big, cands, "tok", threshold=1, validate=False).count()


def test_hist_drift_report_identical_and_disjoint(spark):
    """The two fixed points: identical cohorts score chi2 == 0 and
    tv == 0; fully disjoint distributions score tv == 1."""
    from gdutils_spark.operators.sketches import (
        hist_drift_report,
        hist_registers,
    )

    lows = spark.createDataFrame([(float(i % 10),) for i in range(100)], "v double")
    highs = spark.createDataFrame([(50.0 + i % 10,) for i in range(80)], "v double")
    ra = hist_registers(lows, "v", 0.0, 100.0, 20)
    same = hist_drift_report(ra, ra, 20).collect()[0]
    assert same.n_a == 100 and same.n_b == 100
    assert same.chi2 == 0.0 and same.tv_distance == 0.0
    rb = hist_registers(highs, "v", 0.0, 100.0, 20)
    disjoint = hist_drift_report(ra, rb, 20).collect()[0]
    assert disjoint.n_b == 80
    assert disjoint.tv_distance == 1.0
    assert disjoint.chi2 > 0.0


def test_hist_drift_report_matches_python_model(spark):
    """Differential vs a pure-Python two-sample chi-square /
    total-variation model over the same binned counts."""
    import random

    import pytest

    from gdutils_spark.operators.sketches import (
        hist_drift_report,
        hist_registers,
    )

    rng = random.Random(23)
    a_vals = [rng.gauss(40, 10) for _ in range(400)]
    b_vals = [rng.gauss(55, 15) for _ in range(300)]
    da = spark.createDataFrame([(v,) for v in a_vals], "v double")
    db = spark.createDataFrame([(v,) for v in b_vals], "v double")
    got = hist_drift_report(
        hist_registers(da, "v", 0.0, 100.0, 25),
        hist_registers(db, "v", 0.0, 100.0, 25),
        25,
    ).collect()[0]

    def binof(v):
        return int(min(max((v - 0.0) * 25 / 100.0, 0), 24))

    ca, cb = {}, {}
    for v in a_vals:
        ca[binof(v)] = ca.get(binof(v), 0) + 1
    for v in b_vals:
        cb[binof(v)] = cb.get(binof(v), 0) + 1
    na, nb = len(a_vals), len(b_vals)
    bins = sorted(set(ca) | set(cb))
    chi = sum(
        (ca.get(i, 0) * nb - cb.get(i, 0) * na) ** 2
        / (ca.get(i, 0) + cb.get(i, 0))
        for i in bins
    ) / (na * nb)
    tv = 0.5 * sum(
        abs(ca.get(i, 0) / na - cb.get(i, 0) / nb) for i in bins
    )
    assert got.n_a == na and got.n_b == nb
    assert got.n_bins_used == len(bins)
    assert got.chi2 == pytest.approx(chi, rel=1e-12)
    assert got.tv_distance == pytest.approx(tv, rel=1e-12)


def test_hist_drift_report_geometry_and_empty(spark):
    """Mismatched geometry raises (comparing different binnings is
    meaningless); an empty cohort reports NULL statistics, not
    NaN/Infinity."""
    import pytest as _pytest

    from gdutils_spark.operators.sketches import (
        hist_drift_report,
        hist_registers,
    )

    df = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    ra = hist_registers(df, "v", 0.0, 50.0, 10)
    big = spark.createDataFrame([(700, 3)], "bin int, cnt long")
    with _pytest.raises(ValueError, match="geometry"):
        hist_drift_report(ra, big, 10)
    empty = spark.createDataFrame([], "v double")
    row = hist_drift_report(
        ra, hist_registers(empty, "v", 0.0, 50.0, 10), 10
    ).collect()[0]
    assert row.n_b == 0
    assert row.chi2 is None and row.tv_distance is None


def test_hist_drift_report_grouped_and_duplicate_bins(spark):
    """Grouped register tables are REJECTED (a bin-only join would
    cross-multiply groups into garbage counts); duplicate bins from an
    unioned-but-unmerged table pre-aggregate to hist_merge semantics."""
    import pytest

    from gdutils_spark.operators.sketches import (
        hist_drift_report,
        hist_merge,
        hist_registers,
    )

    df = spark.createDataFrame(
        [(float(i % 10), i % 2) for i in range(80)], "v double, g int"
    )
    grouped = hist_registers(df, "v", 0.0, 10.0, 10, group_col="g")
    flat = hist_registers(df, "v", 0.0, 10.0, 10)
    with pytest.raises(ValueError, match="GROUPED"):
        hist_drift_report(grouped, flat, 10)
    with pytest.raises(ValueError, match="GROUPED"):
        hist_drift_report(flat, grouped, 10)
    # unmerged union of two half-sketches == the merged sketch
    half_a = hist_registers(df.where("g = 0"), "v", 0.0, 10.0, 10)
    half_b = hist_registers(df.where("g = 1"), "v", 0.0, 10.0, 10)
    unmerged = half_a.unionByName(half_b)
    got = hist_drift_report(unmerged, flat, 10).collect()[0]
    want = hist_drift_report(
        hist_merge(half_a, half_b), flat, 10
    ).collect()[0]
    assert got == want
    assert got.n_a == 80 and got.chi2 == 0.0


def test_hist_drift_report_both_empty_single_row(spark):
    """Both cohorts empty must still yield EXACTLY one (0, 0, 0, NULL,
    NULL) row — a nightly gate doing collect()[0] must not IndexError
    on the night both feeds die."""
    from gdutils_spark.operators.sketches import (
        hist_drift_report,
        hist_registers,
    )

    empty = spark.createDataFrame([], "v double")
    ra = hist_registers(empty, "v", 0.0, 10.0, 10)
    rows = hist_drift_report(ra, ra, 10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_a, r.n_b, r.n_bins_used) == (0, 0, 0)
    assert r.chi2 is None and r.tv_distance is None


def test_hist_drift_report_by_group_matches_global_per_group(spark):
    """The grouped report must equal running the GLOBAL report on each
    group's registers separately — and reject ungrouped inputs."""
    import pytest

    from gdutils_spark.operators.sketches import (
        hist_drift_report,
        hist_drift_report_by_group,
        hist_registers,
    )

    import random

    rng = random.Random(31)
    rows = [
        ("x" if i % 2 == 0 else "y", rng.gauss(40 + 20 * (i % 2), 10), i % 3)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, v double, c int")
    ra = hist_registers(df.where("c = 0"), "v", 0.0, 100.0, 20, group_col="g")
    rb = hist_registers(df.where("c <> 0"), "v", 0.0, 100.0, 20, group_col="g")
    got = {
        r.grp: (r.n_a, r.n_b, r.n_bins_used, r.chi2, r.tv_distance)
        for r in hist_drift_report_by_group(ra, rb, 20).collect()
    }
    assert set(got) == {"x", "y"}
    for g in ("x", "y"):
        want = hist_drift_report(
            hist_registers(
                df.where(f"c = 0 AND g = '{g}'"), "v", 0.0, 100.0, 20
            ),
            hist_registers(
                df.where(f"c <> 0 AND g = '{g}'"), "v", 0.0, 100.0, 20
            ),
            20,
        ).collect()[0]
        assert got[g] == (
            want.n_a, want.n_b, want.n_bins_used, want.chi2,
            want.tv_distance,
        ), g
    flat = hist_registers(df, "v", 0.0, 100.0, 20)
    with pytest.raises(ValueError, match="no grp column"):
        hist_drift_report_by_group(flat, ra, 20)


def test_hist_drift_report_by_group_one_sided_group(spark):
    """A group present in only one cohort reports against an empty
    counterpart: tv == 1, chi2/tv NULL only when ITS OWN side is the
    empty one (n_a or n_b == 0 -> NULL stats for that group)."""
    from gdutils_spark.operators.sketches import (
        hist_drift_report_by_group,
        hist_registers,
    )

    df = spark.createDataFrame(
        [("only_a", float(i % 5), 0) for i in range(40)]
        + [("both", float(i % 5), i % 2) for i in range(40)],
        "g string, v double, c int",
    )
    ra = hist_registers(df.where("c = 0"), "v", 0.0, 10.0, 10, group_col="g")
    rb = hist_registers(df.where("c = 1"), "v", 0.0, 10.0, 10, group_col="g")
    got = {r.grp: r for r in hist_drift_report_by_group(ra, rb, 10).collect()}
    assert got["only_a"].n_b == 0
    assert got["only_a"].chi2 is None and got["only_a"].tv_distance is None
    assert got["both"].chi2 == 0.0 and got["both"].tv_distance == 0.0


def test_bottomk_sample_drops_nan_values(spark):
    # r12 latent-hunt regression: NaN is not NULL — an unfiltered NaN
    # would enter the sample and poison percentile downstream
    from gdutils_spark.operators.sketches import bottomk_quantiles, bottomk_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, float("nan")), (4, 3.0)],
        "id long, v double",
    )
    s = bottomk_sample(df, "id", "v", 10)
    vals = [r.val for r in s.collect()]
    assert sorted(vals) == [1.0, 2.0, 3.0]
    q = {r.q: r.est for r in bottomk_quantiles(s, [0.5]).collect()}
    assert q[0.5] == 2.0


def test_kmv_overlap_empty_inputs_null_jaccard(spark):
    """r13 empty-fixture hunt: both inputs empty -> empty union sketch
    -> jaccard is UNDEFINED (NULL via try_divide), never an ANSI
    DIVIDE_BY_ZERO that kills the job."""
    from gdutils_spark.operators.sketches import kmv_overlap_report

    empty = spark.createDataFrame([], "v string")
    r = kmv_overlap_report(empty, empty, "v").collect()[0]
    assert r["n_union_sketch"] == 0
    assert r["jaccard_est"] is None and r["est_intersection"] is None
