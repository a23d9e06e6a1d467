"""Mergeable sketch operators for corpus-scale profiling.

At 100 TB the only viable shape for "how many distinct X per group" over
a sharded corpus is a MERGEABLE sketch: each executor folds its partition
into fixed-size state, partial states combine associatively (map-side
combine → one tiny shuffle), and yesterday's sketch merges with today's
without touching yesterday's data. HyperLogLog (Flajolet et al. 2007) is
the canonical instance; Spark's built-in ``approx_count_distinct`` is an
HLL++ too, but its estimate is engine-internal and not reproducible by
any oracle. This implementation is **deterministic and engine-parity by
construction**:

* hash = first 15 hex chars of md5 → non-negative 60-bit int64 (same
  construction as the dedup family — any engine with ``md5`` replays it);
* register index = low ``p`` bits, rank ``rho`` = leading-zero count of
  the remaining 60−p bits + 1, computed via integer ``bin()`` string
  length (no floating log2);
* the harmonic-mean denominator folds ``2^-register`` terms — each term
  an EXACT power-of-two double built as ``1.0 / (1 << reg)``, never
  ``pow`` — in ascending register order on both engines (sum order is
  the only rounding freedom, so it is pinned);
* the bias constant ``alpha_m · m²`` is precomputed in Python and
  inlined as one literal, leaving a single final IEEE division.

The raw-estimate form (no small/large-range correction) is reported with
its components plus the exact distinct count, so the registry query is
simultaneously a correctness check of the sketch machinery and an error
report for the estimator — the small-range linear-counting correction
needs ``ln`` (libm-ulp territory) and belongs to the consumer, not the
determinism contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdutils_spark.operators.dedup import MD5_INT64_DOMAIN

DEFAULT_P = 8  # 2^8 = 256 registers ≈ 6.5% standard error


def _alpha_m2(p: int) -> float:
    """alpha_m * m^2 for the raw HLL estimate, as one double literal."""
    m = 1 << p
    if p == 4:
        alpha = 0.673
    elif p == 5:
        alpha = 0.697
    elif p == 6:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m


def hll_rho(hash_col: Column, p: int = DEFAULT_P) -> Column:
    """Rank of the (60−p)-bit suffix: leading zeros + 1, via the binary
    string length of the non-negative remainder (``bin`` has no leading
    zeros, so bit-length = string length; all-zero suffix ⇒ max rank)."""
    width = 60 - p
    w = F.shiftright(hash_col, p)
    return F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Per-group HLL register table ``(group, bucket, reg)``: one
    map-side-combinable ``max`` aggregate over the hashed value stream.
    This IS the mergeable state: registers of a union of corpora are the
    element-wise max of their register tables (property-tested), so
    incremental ingest unions register tables and re-aggregates —
    yesterday's corpus is never rescanned."""
    from gdutils_spark.operators.dedup import _md5_int64

    # cast-to-string before hashing (md5 wants BINARY/STRING): identity
    # for string columns, and for numerics it matches the SQL replay
    # md5(CAST(v AS VARCHAR)) — same convention as shard_assign
    h = _md5_int64(F.col(value_col).cast("string"))
    # NULL values hash to NULL and would seed a NULL-bucket register that
    # NULL-poisons the hll_report fold; count_distinct skips NULLs, so the
    # sketch must too
    df = df.where(F.col(value_col).isNotNull())
    hashed = df.select(
        F.col(group_col).alias("grp"),
        (h % (1 << p)).alias("bucket"),
        hll_rho(h, p).alias("rho"),
    )
    return hashed.groupBy("grp", "bucket").agg(F.max("rho").alias("reg"))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register tables (same ``p``): element-wise max. The
    union is register-table-sized — merging N daily sketches costs
    N · groups · m rows, independent of corpus size."""
    return (
        a.unionByName(b)
        .groupBy("grp", "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Per-group distinct-count report: exact count, HLL raw estimate
    and its relative error, plus the sketch internals (buckets hit,
    harmonic-mean denominator) that make the estimate reproducible.

    Plan shape: the register aggregate and the exact-distinct aggregate
    each shuffle the (group, value)-collapsed stream once; the fold over
    registers is group×m-sized driver-free work. The exact count exists
    to grade the estimator — a production 100 TB run drops it and keeps
    only the sketch path.
    """
    # the fold lives in ONE place — hll_estimate — so the determinism-
    # critical arithmetic can't drift between the report and the
    # register-table (merged-sketch) consumer
    ests = hll_estimate(hll_registers(df, value_col, group_col, p), p)
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .groupBy("grp")
        .agg(F.count_distinct("v").alias("n_exact"))
    )
    out = exact.join(ests, "grp").select(
        "grp", "n_exact", "n_buckets_hit", "sum_inv", "hll_estimate"
    )
    return out.select(
        "*",
        (
            (F.col("hll_estimate") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("rel_error"),
    )


def hll_estimate(registers: DataFrame, p: int = DEFAULT_P) -> DataFrame:
    """Raw HLL estimate from a REGISTER TABLE ``(grp, bucket, reg)`` —
    the fold of :func:`hll_report` without the exact-count corpus scan.
    This is the consumer for merged/staged sketches: estimate a union by
    folding :func:`hll_merge` output, or yesterday's persisted registers,
    without touching the data that built them. Same determinism contract
    as the report (exact power-of-two doubles, pinned ascending-bucket
    fold, one inlined bias literal), so the estimate hash-verifies
    cross-engine. Register-table-sized work."""
    m = 1 << p
    with_inv = registers.select(
        "grp", "bucket", F.expr("1.0D / shiftleft(1L, reg)").alias("inv")
    )
    folded = with_inv.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_buckets_hit"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "inv"))),
            F.lit(0.0),
            lambda acc, x: acc + x["inv"],
        ).alias("sum_present"),
    )
    c = _alpha_m2(p)
    sum_inv = (
        F.col("sum_present")
        + (F.lit(m) - F.col("n_buckets_hit")).cast("double")
    ).alias("sum_inv")
    out = folded.select("grp", "n_buckets_hit", sum_inv)
    return out.select(
        "grp",
        "n_buckets_hit",
        "sum_inv",
        (F.lit(c) / F.col("sum_inv")).alias("hll_estimate"),
    )


def hll_corrected(report: DataFrame, p: int = DEFAULT_P) -> DataFrame:
    """Consumer-side small-range correction (Flajolet et al. 2007 §4):
    when the raw estimate is below ``2.5·m`` and some registers are
    still empty, linear counting ``m·ln(m / V)`` (V = empty registers)
    is the better estimator — the raw harmonic mean biases high in that
    regime. Adds ``hll_corrected`` and ``corrected_rel_error`` columns
    to a :func:`hll_report` result.

    This lives OUTSIDE the determinism contract on purpose: ``ln`` is
    libm-ulp territory, so the correction is property-tested (accuracy
    bounds vs exact counts) rather than hash-compared — the sketch
    machinery underneath it stays oracle-verified. Columnar arithmetic
    over the (groups-sized) report: free at any corpus scale.
    """
    m = 1 << p
    empty = (F.lit(m) - F.col("n_buckets_hit")).cast("double")
    corrected = (
        F.when(
            (F.col("hll_estimate") <= 2.5 * m) & (empty > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
        )
        .otherwise(F.col("hll_estimate"))
        .alias("hll_corrected")
    )
    out = report.select("*", corrected)
    return out.select(
        "*",
        (
            (F.col("hll_corrected") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double")
        ).alias("corrected_rel_error"),
    )


CMS_PRIME = 2147483647  # 2^31-1, matches the minhash permutation domain
CMS_DEPTH = 4
CMS_WIDTH = 256


def _affine_positions(h: Column, n: int, modulus: int) -> list[Column]:
    """``((h·a_i + b_i) mod P) mod modulus`` for the ``n`` md5-seeded
    affine rows — THE expression that defines cross-engine hash parity
    for the CMS and Bloom sketches, built in one place so a sketch's
    build and probe paths can never desynchronize."""
    from gdutils_spark.operators.dedup import _perm_constants

    a, b = _perm_constants(n)
    return [((h * a[i] + b[i]) % CMS_PRIME) % modulus for i in range(n)]


def _guard_probe_columns(probes: DataFrame, reserved: set[str], fn: str) -> None:
    """Probe relations ride through the sketch-probe plans next to
    internal working columns; a same-named probe column would make the
    downstream join/groupBy ambiguous — fail fast instead."""
    clash = sorted(c for c in probes.columns if c in reserved)
    if clash:
        raise ValueError(
            f"{fn}: probe column(s) {clash} collide with the sketch's "
            f"working/register columns ({sorted(reserved)}); rename them "
            f"before probing"
        )


def cms_registers(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch register table ``(row, col, cnt)`` (Cormode &
    Muthukrishnan 2005): ``depth`` pairwise-independent hash rows of
    ``width`` counters; every occurrence increments one counter per row.
    Point-frequency estimates (:func:`cms_estimate`) take the MIN over
    rows — always an over-estimate, with error ≤ 2N/width at confidence
    1 − 2^-depth.

    The HLL counterpart for FREQUENCY (not cardinality), and the same
    100 TB shape: registers are one map-side-combinable ``sum``
    aggregate; sketches of corpus parts merge by elementwise ADD
    (:func:`cms_merge`) — yesterday's stream is never rescanned. All
    arithmetic is exact integers: row hashes are the md5-seeded affine
    permutations the MinHash family inlines into its oracles, so any
    engine reproduces every counter bit-for-bit.

    ``weight_col``: sum that column instead of counting occurrences
    (e.g. token counts pre-aggregated per document).
    """
    from gdutils_spark.operators.dedup import _md5_int64

    base = df.where(F.col(value_col).isNotNull())
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    hashed = base.select(
        (_md5_int64(F.col(value_col).cast("string")) % CMS_PRIME).alias("_h"),
        w.alias("_w"),
    )
    cols = _affine_positions(F.col("_h"), depth, width)
    cells = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), c.cast("int").alias("col")
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("_rc"),
        "_w",
    )
    return (
        cells.select(
            F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"), "_w"
        )
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS register tables (same depth/width/hash family):
    elementwise sum — register-table-sized work, corpus never rescanned."""
    return a.unionByName(b).groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    registers: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    validate: bool = True,
) -> DataFrame:
    """Point-frequency estimates for each probe value: MIN over the
    ``depth`` counters the value hashes to. Adds ``cms_est`` to the
    probe relation (whose columns must not collide with the working
    names — guarded). Probe rows whose ``value_col`` is NULL report
    ``cms_est=0`` — the builder skips NULLs, so zero occurrences is the
    consistent (and deliberate) answer. The register table is
    aggregate-sized — broadcast — so probing is a map + one probe-keyed
    aggregate.

    ``validate=False`` skips the eager geometry probe (one extra Spark
    action per call) for callers whose registers are clean by
    construction — same-session :func:`cms_registers` output with the
    same ``depth``/``width`` — mirroring the :func:`~gdutils_spark.
    operators.cdc.apply_cdc` convention. Keep the default for staged or
    merged register tables: a geometry mismatch silently UNDER-estimates."""
    from gdutils_spark.operators.dedup import _md5_int64

    keep = list(probes.columns)
    _guard_probe_columns(
        probes, {"_h", "_rc", "row", "col", "cnt", "cms_est"}, "cms_estimate"
    )
    if validate:
        # the geometry probe below is a SEPARATE action from the
        # estimate's broadcast join, and shuffle reuse does not span
        # actions — without a pin, the probe would run the whole
        # register-build lineage once and the join would run it AGAIN
        # (doubling the dominant aggregate for every uncached caller);
        # the table is broadcast-sized, so the lazy checkpoint costs one
        # tiny materialization. validate=False is single-action — no pin.
        registers = registers.localCheckpoint(eager=False)
        # fail-fast geometry probe (the hist_quantiles convention): a
        # register built with a LARGER width/depth than declared here
        # puts cells where no probe position can reach them — the
        # (row, col) join misses, COALESCE fills 0, and MIN
        # UNDER-estimates, silently breaking the sketch's
        # never-undercount guarantee (and with it cms_heavy_hitters'
        # no-false-negatives cut). LIMIT-bounded over the sketch-sized
        # register table. The converse (built SMALLER) still
        # over-estimates — safe — and stays the caller's contract.
        bad_cell = (
            registers.where(
                (F.col("row") < 0)
                | (F.col("row") >= depth)
                | (F.col("col") < 0)
                | (F.col("col") >= width)
            )
            .limit(1)
            .collect()
        )
        if bad_cell:
            raise ValueError(
                f"cms_estimate: register cell (row={bad_cell[0]['row']}, "
                f"col={bad_cell[0]['col']}) outside depth={depth} x "
                f"width={width} — the register table was not built with "
                "this geometry (or mixed-geometry sketches were merged); "
                "probing it would silently UNDER-estimate"
            )
    h = (_md5_int64(F.col(value_col).cast("string")) % CMS_PRIME).alias("_h")
    cols = _affine_positions(F.col("_h"), depth, width)
    cells = probes.select("*", h).select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), c.cast("int").alias("col")
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("_rc"),
    )
    return (
        cells.select(
            *keep, F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col")
        )
        .join(F.broadcast(registers), ["row", "col"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est"))
    )


def cms_heavy_hitters(
    registers: DataFrame,
    candidates: DataFrame,
    value_col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    validate: bool = True,
) -> DataFrame:
    """Frequent-items (heavy hitters) report from a CMS register table:
    the candidate values whose estimated frequency reaches ``threshold``
    (the φ·N cut of Cormode & Muthukrishnan §4.2), with the estimate
    attached as ``cms_est`` — the surface frequency-sketch users
    actually want ("which items are hot?"), built on the point-estimate
    primitive (:func:`cms_estimate`).

    The CMS never undercounts, so every TRUE heavy hitter whose value
    appears in ``candidates`` survives the cut — NO FALSE NEGATIVES,
    the property that makes the sketch a safe pre-filter; false
    positives (overcounted near-misses) are bounded by the usual
    2N/width error and are verified exactly downstream if they matter.
    The candidate relation is what bounds the probe cost: at 100 TB pass
    a pruned candidate set (e.g. a per-partition local top-k union, or
    yesterday's hitters plus today's new values) — the register table
    itself cannot enumerate values, that is the sketch trade-off.

    Probe-sized work on top of a broadcast register table (the
    :func:`cms_estimate` plan); all-integer arithmetic, so the report
    hash-verifies cross-engine."""
    if threshold < 1:
        raise ValueError(
            f"cms_heavy_hitters: threshold={threshold} must be >= 1 "
            "(a zero threshold keeps every candidate — not a cut)"
        )
    est = cms_estimate(
        registers, candidates, value_col, depth, width, validate=validate
    )
    return est.where(F.col("cms_est") >= threshold)


BLOOM_BITS = 4096
BLOOM_HASHES = 4


def bloom_bits(
    df: DataFrame,
    value_col: str,
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Bloom filter as a packed word table ``(word, bits)`` (Bloom 1970):
    each value sets ``n_hashes`` bit positions (md5-affine row hashes —
    the same deterministic family as the CMS/MinHash oracles); position
    ``p`` lives in word ``p >> 5`` at bit ``p & 31`` (32 bits per
    64-bit word — bit 63 would overflow DuckDB's checked ``<<`` and flip
    the sign bit in Spark's, so the packing stays in the safe range). The third
    mergeable sketch: HLL answers "how many distinct", CMS "how often",
    Bloom "have I seen this" — at 100 TB the membership question behind
    decontamination and incremental-dedup probes, with NO join against
    the historical corpus.

    One map-side-combinable ``bit_or`` aggregate; sketches of corpus
    parts merge by elementwise OR (:func:`bloom_merge`). All integer
    arithmetic — any engine with ``bit_or`` replays the words exactly.
    No false negatives ever; false-positive rate ≈
    ``(1 − e^(−k·n/m))^k``.
    """
    from gdutils_spark.operators.dedup import _md5_int64

    h = (_md5_int64(F.col(value_col).cast("string")) % CMS_PRIME).alias("_h")
    hashed = df.where(F.col(value_col).isNotNull()).select(h)
    pos = hashed.select(
        F.explode(
            F.array(*_affine_positions(F.col("_h"), n_hashes, n_bits))
        ).alias("_p")
    )
    words = pos.select(
        F.shiftright(F.col("_p"), 5).alias("word"),
        F.expr("shiftleft(1L, CAST(_p & 31 AS INT))").alias("_bit"),
    )
    return words.groupBy("word").agg(F.bit_or("_bit").alias("bits"))


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two Bloom word tables (same geometry): elementwise OR."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    words: DataFrame,
    probes: DataFrame,
    value_col: str,
    n_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Membership probe: adds ``might_contain`` to the probe relation —
    true iff ALL ``n_hashes`` positions are set (no false negatives, so
    ``false`` is definitive). Probe rows whose ``value_col`` is NULL get
    ``might_contain=false`` — the builder skips NULLs (they were never
    inserted), so "definitely absent" is the consistent answer, not a
    NULL that matches neither branch downstream. Probe columns must not
    collide with the working names (guarded). The word table is
    sketch-sized — broadcast — making the probe a map + one probe-keyed
    aggregate, never a join against the original corpus."""
    from gdutils_spark.operators.dedup import _md5_int64

    keep = list(probes.columns)
    _guard_probe_columns(
        probes,
        {"_h", "_p", "_bit", "_hit", "word", "bits", "might_contain"},
        "bloom_might_contain",
    )
    h = (_md5_int64(F.col(value_col).cast("string")) % CMS_PRIME).alias("_h")
    cells = probes.select(*keep, h).select(
        *keep,
        F.explode(
            F.array(*_affine_positions(F.col("_h"), n_hashes, n_bits))
        ).alias("_p"),
    )
    checked = (
        cells.select(
            *keep,
            F.shiftright(F.col("_p"), 5).alias("word"),
            F.expr("shiftleft(1L, CAST(_p & 31 AS INT))").alias("_bit"),
        )
        .join(F.broadcast(words), "word", "left")
        .select(
            *keep,
            (
                F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(
                    F.col("_bit")
                )
                != 0
            ).alias("_hit"),
        )
    )
    return checked.groupBy(*keep).agg(
        # NULL probe value → every _hit is NULL → min is NULL; coalesce
        # to false (never inserted, so definitively absent)
        F.coalesce(
            F.min(F.col("_hit").cast("int")).cast("boolean"), F.lit(False)
        ).alias("might_contain")
    )


HIST_BINS = 512


def hist_registers(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = HIST_BINS,
    group_col: str | None = None,
) -> DataFrame:
    """Fixed-bin histogram as a register table ``(bin, cnt)`` — the
    fourth mergeable sketch: HLL answers "how many distinct", CMS "how
    often", Bloom "have I seen this", the histogram "how is it
    DISTRIBUTED" (quantiles, :func:`hist_quantiles`). Same 100 TB shape
    as the others: one map-side-combinable ``count`` aggregate into
    ``n_bins`` integer counters; sketches of corpus parts merge by
    elementwise ADD (:func:`hist_merge`) — yesterday's stream is never
    rescanned, which is exactly what exact ``percentile`` (full value
    set per group) cannot do.

    Bounds ``[lo, hi)`` are DECLARED, the fixed-bin trade-off (a KLL /
    t-digest removes it at the cost of randomized or engine-internal
    state — Spark's own ``approx_percentile`` is such a sketch but its
    estimate is not oracle-reproducible). Values are clamped into the
    edge bins, so out-of-range mass is visible there rather than
    dropped; NULLs are skipped like every builder in this module — and
    so are NaNs, explicitly: Spark's ``floor(NaN)`` casts to ``0L``
    (bin 0) while an oracle's clamp sends NaN (which sorts above every
    value) to the TOP bin, so letting NaN through would silently break
    the module's cross-engine bit-parity; a not-a-number measurement
    belongs in neither tail. The bin rule
    ``floor((x − lo) · n_bins / (hi − lo))`` is two IEEE ops +
    a floor — deterministic and engine-replayable bit-for-bit.

    ``group_col``: per-group registers ``(grp, bin, cnt)`` — the
    per-segment distribution report (p50/p90 per event type, per
    source, ...); state is groups × n_bins counters, still one
    map-combinable aggregate.
    """
    if hi <= lo:
        raise ValueError(f"hist_registers: hi={hi} must exceed lo={lo}")
    if n_bins <= 0:
        raise ValueError(f"hist_registers: n_bins={n_bins} must be positive")
    x = F.col(value_col).cast("double")
    raw = F.floor(
        (x - F.lit(float(lo)))
        * F.lit(float(n_bins))
        / (F.lit(float(hi)) - F.lit(float(lo)))
    )
    # clamp the LONG floor result BEFORE the int cast: a far outlier
    # (e.g. an epoch-millis value against a [0, 500) range) would wrap
    # around int32 into an arbitrary interior bin — or throw under ANSI
    # mode — instead of landing in the documented edge bin
    b = F.least(
        F.greatest(raw, F.lit(0).cast("long")),
        F.lit(n_bins - 1).cast("long"),
    ).cast("int")
    cols = ([F.col(group_col).alias("grp")] if group_col else []) + [
        b.alias("bin")
    ]
    names = (["grp"] if group_col else []) + ["bin"]
    return (
        df.where(x.isNotNull() & ~F.isnan(x))
        .select(*cols)
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two histogram register tables (same lo/hi/n_bins geometry):
    elementwise sum — register-table-sized work, corpus never rescanned.
    Grouped register tables (a ``grp`` column) merge per group."""
    keys = [c for c in a.columns if c != "cnt"]
    return a.unionByName(b).groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    registers: DataFrame,
    qs: "list[float]",
    lo: float,
    hi: float,
    n_bins: int = HIST_BINS,
    validate: bool = True,
) -> DataFrame:
    """Quantile estimates from a histogram register table: for each
    ``q`` the continuous rank ``t = q·(N−1)`` (the ``quantile_cont``
    convention) lands in exactly one bin by cumulative count, and the
    estimate interpolates uniformly inside it:
    ``lo + width·(bin + (t − cum_below)/cnt)``. Returns ``(q, est)``.

    All register-table-sized work (one window cumsum over ``n_bins``
    rows + a quantile-list cross join); every arithmetic step is a
    pinned IEEE expression, so any engine replays the estimates
    bit-for-bit. Estimate error is bounded by the in-bin uniformity
    assumption — at most ~one bin width when mass is spread, which is
    the knob ``n_bins`` buys. ``registers`` must be non-empty."""
    from pyspark.sql import Window

    bad_q = [q for q in qs if not 0.0 <= float(q) <= 1.0]
    if bad_q:
        # an out-of-range q would bracket no bin and its output row
        # would silently VANISH, misaligning consumers that zip
        # estimates to requested quantiles
        raise ValueError(f"hist_quantiles: quantiles outside [0, 1]: {bad_q}")
    # fail-fast geometry probe (the knn_ivf_pq staged-index convention):
    # lo/hi/n_bins are re-declared here independently of how the
    # register table was built, and a mismatch — or merging registers
    # built with different bins — silently yields wrong estimates. A
    # register outside [0, n_bins) proves the declared geometry is not
    # the build's; LIMIT-bounded over the (sketch-sized) register table.
    # The converse gap remains the caller's contract: registers built
    # with FEWER bins all land inside the declared range undetected —
    # keep (lo, hi, n_bins) with the staged sketch. validate=False skips
    # the probe (one eager action) for clean-by-construction callers —
    # same-session hist_registers output with the same n_bins (the
    # apply_cdc / cms_estimate convention).
    if validate:
        _probe_bin_geometry(registers, n_bins, "hist_quantiles")
    spark = registers.sparkSession
    # a grouped register table (grp column) yields per-group estimates
    grouped = "grp" in registers.columns
    w_base = Window.partitionBy("grp") if grouped else Window.partitionBy()
    w_cum = w_base.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    w_all = w_base.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    keep = ["grp"] if grouped else []
    cum = registers.select(
        *keep,
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0).cast("long")).alias(
            "cum_below"
        ),
        F.sum("cnt").over(w_all).alias("total"),
    )
    q_df = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    width = (F.lit(float(hi)) - F.lit(float(lo))) / F.lit(float(n_bins))
    t = F.col("q") * (F.col("total").cast("double") - F.lit(1.0))
    est = F.lit(float(lo)) + width * (
        F.col("bin").cast("double")
        + (t - F.col("cum_below").cast("double"))
        / F.col("cnt").cast("double")
    )
    return (
        cum.join(F.broadcast(q_df))
        .where(
            (F.col("cum_below").cast("double") <= t)
            & (t < (F.col("cum_below") + F.col("cnt")).cast("double"))
        )
        .select(*keep, "q", est.alias("est"))
    )


def _probe_bin_geometry(regs: DataFrame, n_bins: int, fn: str) -> None:
    """The histogram family's shared fail-fast geometry probe: a
    register bin outside ``[0, n_bins)`` proves the table was not built
    with the declared geometry (or mixed-geometry tables were merged).
    LIMIT-bounded; every caller gates it behind its ``validate`` flag."""
    bad = (
        regs.where((F.col("bin") < 0) | (F.col("bin") >= n_bins))
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"{fn}: register bin {bad[0]['bin']} outside [0, {n_bins}) — "
            "the register table was not built with this n_bins (or "
            "mixed-geometry registers were merged)"
        )


def hist_drift_report(
    a: DataFrame,
    b: DataFrame,
    n_bins: int = HIST_BINS,
    validate: bool = True,
) -> DataFrame:
    """Distribution-DRIFT report between two histogram register tables
    (same :func:`hist_registers` geometry — e.g. yesterday's feed vs
    today's): one row ``(n_a, n_b, n_bins_used, chi2, tv_distance)``
    where ``chi2`` is the two-sample chi-square statistic over the
    binned counts and ``tv_distance`` the total-variation distance
    ``0.5·Σ|a_i/N_a − b_i/N_b|`` — the nightly data-quality gate a
    training pipeline runs before letting a new batch in (a schema
    didn't change, but did the DISTRIBUTION?). Compare ``chi2`` to a
    χ² quantile at ``n_bins_used − 1`` degrees of freedom, or trend
    ``tv_distance`` directly (0 = identical, 1 = disjoint).

    Works at sketch cost by construction: the inputs are the mergeable
    register tables (built map-side, merged nightly), so the report
    never rescans either corpus — it is a bin-sized full-outer join +
    one ascending-bin ordered fold. Determinism contract: the chi-square
    numerator ``a_i·N_b − b_i·N_a`` is exact BIGINT arithmetic (wraps
    past ~9.2e18 under Spark's non-ANSI mode — at that corpus scale,
    downsample the registers), each per-bin term is a fixed IEEE
    expression, and both sums fold in ascending bin order
    (``list_sum(list(t ORDER BY bin))`` replays them bit-for-bit).
    Empty cohorts report NULL statistics rather than NaN/Infinity.

    ``validate=True`` runs the family's LIMIT-bounded geometry probe on
    both tables (a register outside ``[0, n_bins)`` proves a geometry
    mismatch — comparing histograms built with different bins is
    meaningless); ``validate=False`` for same-session registers.
    GROUPED register tables (a ``grp`` column) are rejected — a
    bin-only join over them would cross-multiply groups into garbage
    counts; run per-group drift by filtering one group per call (or
    ``hist_merge`` the groups deliberately). Duplicate bins from an
    unioned-but-unmerged table are pre-aggregated (the
    :func:`hist_merge` sum), so a ``unionByName`` of part-sketches
    reads as the merged sketch it means."""
    for name, regs in (("a", a), ("b", b)):
        if "grp" in regs.columns:
            raise ValueError(
                f"hist_drift_report: register table {name} is GROUPED "
                "(grp column) — a bin-only comparison over it would "
                "cross-multiply groups into meaningless counts; filter "
                "one group per call (or hist_merge the groups first)"
            )
    if validate:
        # pin BEFORE probing: the probe is a separate action and shuffle
        # reuse does not span actions (the cms_estimate convention) —
        # without the pin each register-build lineage would run twice
        a = a.localCheckpoint(eager=False)
        b = b.localCheckpoint(eager=False)
        _probe_bin_geometry(a, n_bins, "hist_drift_report (table a)")
        _probe_bin_geometry(b, n_bins, "hist_drift_report (table b)")
    # bin-level pre-aggregate == hist_merge semantics: tolerates a
    # unioned-but-unmerged register table (duplicate bins) on either
    # side; a no-op single pass for already-merged inputs
    asum = a.groupBy("bin").agg(F.sum("cnt").alias("_ca"))
    bsum = b.groupBy("bin").agg(F.sum("cnt").alias("_cb"))
    j = (
        asum.join(bsum, "bin", "full")
        .select(
            "bin",
            F.coalesce(F.col("_ca"), F.lit(0).cast("long")).alias("ca"),
            F.coalesce(F.col("_cb"), F.lit(0).cast("long")).alias("cb"),
        )
        .where(F.col("ca") + F.col("cb") > 0)
        .localCheckpoint(eager=False)  # feeds totals AND terms (no reuse)
    )
    # global aggregates (no groupBy) so the report is ALWAYS exactly one
    # row — both-cohorts-empty yields (0, 0, 0, NULL, NULL), not zero
    # rows that would IndexError the nightly gate on the night both
    # feeds die (exactly when it matters)
    totals = j.agg(
        F.coalesce(F.sum("ca"), F.lit(0).cast("long")).alias("n_a"),
        F.coalesce(F.sum("cb"), F.lit(0).cast("long")).alias("n_b"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )
    d = F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
    t_chi = (d.cast("double") * d.cast("double")) / (
        F.col("ca") + F.col("cb")
    ).cast("double")
    # per-term division guards: with an EMPTY cohort the total is 0 and
    # a bare division would raise under ANSI mode before the final
    # NULL-stats guard ever ran (CASE WHEN short-circuits, so the
    # division is only evaluated on the taken branch)
    ratio = lambda c, n: F.when(
        F.col(n) > 0, F.col(c).cast("double") / F.col(n).cast("double")
    ).otherwise(F.lit(0.0))
    t_tv = F.abs(ratio("ca", "n_a") - ratio("cb", "n_b"))
    totals = totals.localCheckpoint(eager=False)  # feeds terms AND wide
    terms = j.crossJoin(F.broadcast(totals)).select(
        "bin", t_chi.alias("_tc"), t_tv.alias("_tt")
    )
    fold = lambda field: F.aggregate(
        F.array_sort(F.collect_list(F.struct("bin", F.col(field).alias("t")))),
        F.lit(0.0),
        lambda acc, s: acc + s["t"],
    )
    wide = terms.agg(
        fold("_tc").alias("_chi_raw"), fold("_tt").alias("_tv_raw")
    ).crossJoin(F.broadcast(totals))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return wide.select(
        "n_a",
        "n_b",
        "n_bins_used",
        F.when(
            ok,
            F.col("_chi_raw")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        ).alias("chi2"),
        F.when(ok, F.lit(0.5) * F.col("_tv_raw")).alias("tv_distance"),
    )


def hist_drift_report_by_group(
    a: DataFrame,
    b: DataFrame,
    n_bins: int = HIST_BINS,
    validate: bool = True,
) -> DataFrame:
    """Per-GROUP distribution drift between two GROUPED histogram
    register tables (``hist_registers(group_col=...)`` output — ``(grp,
    bin, cnt)``): one row per group present in either cohort, with the
    same ``(n_a, n_b, n_bins_used, chi2, tv_distance)`` statistics as
    :func:`hist_drift_report` computed WITHIN each group — "which
    segment's distribution moved?", the per-source/per-language nightly
    gate (a global drift score can hide one domain shifting while
    another compensates). Groups present in only one cohort report NULL
    ``chi2``/``tv_distance`` (the ``n_a > 0 AND n_b > 0`` guard —
    matching :func:`hist_drift_report` on an empty cohort: a one-sided
    comparison has no defined two-sample statistic); their ``n_a``/
    ``n_b`` row still appears so the gate can flag the appearance or
    disappearance itself. All joins, folds and normalizations are
    per-group twins of the global report's, so the whole relation
    hash-verifies. Bin-sized × groups work throughout;
    duplicate (grp, bin) rows pre-aggregate with ``hist_merge``
    semantics."""
    for name, regs in (("a", a), ("b", b)):
        if "grp" not in regs.columns:
            raise ValueError(
                f"hist_drift_report_by_group: register table {name} has "
                "no grp column — build it with "
                "hist_registers(group_col=...), or use hist_drift_report "
                "for ungrouped tables"
            )
    if validate:
        a = a.localCheckpoint(eager=False)
        b = b.localCheckpoint(eager=False)
        _probe_bin_geometry(a, n_bins, "hist_drift_report_by_group (table a)")
        _probe_bin_geometry(b, n_bins, "hist_drift_report_by_group (table b)")
    asum = a.groupBy("grp", "bin").agg(F.sum("cnt").alias("_ca"))
    bsum = b.groupBy("grp", "bin").agg(F.sum("cnt").alias("_cb"))
    j = (
        asum.join(bsum, ["grp", "bin"], "full")
        .select(
            "grp",
            "bin",
            F.coalesce(F.col("_ca"), F.lit(0).cast("long")).alias("ca"),
            F.coalesce(F.col("_cb"), F.lit(0).cast("long")).alias("cb"),
        )
        .where(F.col("ca") + F.col("cb") > 0)
        .localCheckpoint(eager=False)  # feeds totals AND terms
    )
    totals = j.groupBy("grp").agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.count(F.lit(1)).alias("n_bins_used"),
    )
    d = F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")
    t_chi = (d.cast("double") * d.cast("double")) / (
        F.col("ca") + F.col("cb")
    ).cast("double")
    ratio = lambda c, n: F.when(
        F.col(n) > 0, F.col(c).cast("double") / F.col(n).cast("double")
    ).otherwise(F.lit(0.0))
    t_tv = F.abs(ratio("ca", "n_a") - ratio("cb", "n_b"))
    terms = j.join(F.broadcast(totals), "grp").select(
        "grp", "bin", "n_a", "n_b", "n_bins_used",
        t_chi.alias("_tc"), t_tv.alias("_tt"),
    )
    fold = lambda field: F.aggregate(
        F.array_sort(F.collect_list(F.struct("bin", F.col(field).alias("t")))),
        F.lit(0.0),
        lambda acc, s: acc + s["t"],
    )
    wide = terms.groupBy("grp", "n_a", "n_b", "n_bins_used").agg(
        fold("_tc").alias("_chi_raw"), fold("_tt").alias("_tv_raw")
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return wide.select(
        "grp",
        "n_a",
        "n_b",
        "n_bins_used",
        F.when(
            ok,
            F.col("_chi_raw")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        ).alias("chi2"),
        F.when(ok, F.lit(0.5) * F.col("_tv_raw")).alias("tv_distance"),
    )


BOTTOMK_K = 512


def bottomk_sample(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = BOTTOMK_K,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic mergeable uniform row sample ``(hk, val)``: the
    ``k`` rows whose md5-hashed key is smallest (a KMV / bottom-k
    sketch). Because md5 is a fixed function of the key, the "random"
    sample is REPRODUCIBLE by any engine, incrementally stable, and
    MERGEABLE: the bottom-k of a union is the bottom-k of the combined
    bottom-k's (:func:`bottomk_merge`) — so per-shard samples combine
    without rescanning any shard. This is the complement of
    :func:`hist_registers` for quantiles: no declared [lo, hi) bounds,
    at the cost of sampling error ~1/sqrt(k) in RANK terms
    (:func:`bottomk_quantiles`).

    ``key_col`` should be row-unique (an event/row id); duplicate keys
    tie on ``hk`` and are then ordered by value, keeping the cut
    deterministic. NULL keys and NULL values are skipped like every
    builder in this module. Plan shape: a global ordered LIMIT — Spark
    plans TakeOrderedAndProject (per-partition top-k, single tiny
    merge), never a full sort.

    ``group_col``: a PER-GROUP sample ``(grp, hk, val)`` — k smallest
    hashed keys within each group, the unbounded-domain per-segment
    quantile path (latency percentiles per tenant / per event type)
    that the fixed-bin histogram's declared [lo, hi) cannot cover
    (mirrors ``hist_registers(group_col=)``). Rows with a NULL group are
    skipped like NULL keys. Plan shape: one shuffle on the group key +
    a per-group rank cut (window row_number) — state is
    groups × k rows, still mergeable per group."""
    from pyspark.sql import Window

    from gdutils_spark.operators.dedup import _md5_int64

    # NaN is not NULL: an unfiltered NaN row would ride into the sample
    # and poison every percentile downstream (hist_registers' policy,
    # r12 latent-hunt)
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    )
    hk = _md5_int64(F.col(key_col).cast("string")).alias("hk")
    val = F.col(value_col).cast("double").alias("val")
    if group_col is None:
        return base.select(hk, val).orderBy("hk", "val").limit(k)
    w = Window.partitionBy("grp").orderBy("hk", "val")
    return (
        base.where(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("grp"), hk, val)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_merge(a: DataFrame, b: DataFrame, k: int = BOTTOMK_K) -> DataFrame:
    """Merge two bottom-k samples (same key hashing): bottom-k of the
    union — sample-sized work, the shards are never rescanned. Grouped
    samples (a ``grp`` column) merge per group (both inputs must be
    grouped the same way — unionByName raises on a shape mismatch)."""
    from pyspark.sql import Window

    u = a.unionByName(b)
    if "grp" not in u.columns:
        return u.orderBy("hk", "val").limit(k)
    w = Window.partitionBy("grp").orderBy("hk", "val")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_quantiles(sample: DataFrame, qs: "list[float]") -> DataFrame:
    """Quantile estimates from a bottom-k sample: exact ``percentile``
    over the sampled values, one ``(q, est)`` row per requested
    quantile — per group when the sample carries a ``grp`` column
    (``(grp, q, est)``). The sample is uniform over rows (md5 keys), so
    the sample quantile converges to the population quantile with rank
    error ~1/sqrt(k). Sample-sized work; the percentile interpolation is
    the engine-parity `quantile_cont` convention."""
    bad_q = [q for q in qs if not 0.0 <= float(q) <= 1.0]
    if bad_q:
        raise ValueError(f"bottomk_quantiles: quantiles outside [0, 1]: {bad_q}")
    # ONE aggregate for all quantiles, melted to rows — a union of
    # per-q aggregates would re-execute the whole sample subtree
    # (corpus scan + TakeOrdered) once per quantile: Catalyst plans no
    # subtree reuse
    aggs = [
        F.percentile(F.col("val"), F.lit(float(q))).alias(f"_p{i}")
        for i, q in enumerate(qs)
    ]
    grouped = "grp" in sample.columns
    wide = sample.groupBy("grp").agg(*aggs) if grouped else sample.agg(*aggs)
    parts = ", ".join(
        f"CAST('{float(q)!r}' AS DOUBLE), _p{i}" for i, q in enumerate(qs)
    )
    keep = ["grp"] if grouped else []
    return wide.select(
        *keep, F.expr(f"stack({len(qs)}, {parts}) AS (q, est)")
    )


KMV_K = 256


def kmv_sketch(df: DataFrame, value_col: str, k: int = KMV_K) -> DataFrame:
    """Bottom-k DISTINCT-VALUE sketch (KMV — Bar-Yossef et al. 2002,
    RANDOM, "Counting distinct elements in a data stream"): the ``k``
    smallest md5-int64 hashes of the column's distinct values, one
    ``(hk)`` row each. Where :func:`bottomk_sample` samples ROWS (for
    quantiles), this sketches the distinct-value SET — and unlike an HLL
    register table it supports set ALGEBRA beyond union: because every
    engine hashes a value to the same point, two sketches share hash
    members exactly where the underlying sets share values, so Jaccard
    and intersection sizes fall out of member overlap
    (:func:`kmv_overlap_report`) — the inclusion-exclusion-free
    alternative to :func:`hll_estimate` cohort overlap.

    Deterministic (md5, no RNG), MERGEABLE (:func:`kmv_merge`), and
    oracle-replayable. NULL values are skipped like every builder in
    this module. Plan shape: map-side hash projection, one distinct
    shuffle, then a global ordered LIMIT — TakeOrderedAndProject
    (per-partition top-k + one tiny merge), never a full sort; the
    sketch is k rows regardless of corpus size."""
    from gdutils_spark.operators.dedup import _md5_int64

    return (
        df.where(F.col(value_col).isNotNull())
        .select(_md5_int64(F.col(value_col).cast("string")).alias("hk"))
        .distinct()
        .orderBy("hk")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge two KMV sketches (same hash function): the bottom-k of the
    member union IS the sketch of the set union — sketch-sized work,
    the corpora are never rescanned."""
    return a.unionByName(b).distinct().orderBy("hk").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: one row
    ``(n_hashes, kth_frac, est_distinct)``. With fewer than ``k``
    members the sketch IS the distinct value set (estimate exact); at
    capacity the classic unbiased estimator ``(k−1) / U(k)`` applies,
    ``U(k)`` = the k-th smallest hash normalized to (0, 1). Relative
    error ~1/sqrt(k−2). The normalization and division are single IEEE
    ops on exactly-representable inputs (60-bit hash, power-of-two
    domain), so the estimate hash-verifies cross-engine."""
    n = F.col("n_hashes")
    kth = F.col("kth_frac")
    return (
        sketch.agg(
            F.count(F.lit(1)).alias("n_hashes"),
            (F.max("hk").cast("double") / F.lit(MD5_INT64_DOMAIN)).alias(
                "kth_frac"
            ),
        )
        .select(
            "n_hashes",
            "kth_frac",
            F.when(n < k, n.cast("double"))
            .otherwise(F.lit(float(k - 1)) / kth)
            .alias("est_distinct"),
        )
    )


def kmv_overlap_report(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Two-set KMV algebra report, one row: per-set and union
    distinct-count estimates, the member-overlap Jaccard estimate
    ``|K(A∪B) ∩ A ∩ B| / |K(A∪B)|`` (Beyer et al. 2007, SIGMOD), and
    the intersection-size estimate ``jaccard · est_union`` — plus the
    exact distinct/intersection counts computed alongside to grade the
    sketch (a production run drops the exact columns; the
    :func:`hll_report` convention).

    Plan shape: each input is scanned once for its sketch and once for
    the exact grading counts; everything downstream is sketch-sized
    (≤ 3k rows) with single-row cross-joined aggregates — the 100 TB
    cost is the two corpus scans, exactly like the HLL overlap path,
    but the Jaccard needs no inclusion-exclusion subtraction (better
    conditioned for small intersections)."""
    ska = kmv_sketch(a, value_col, k).localCheckpoint(eager=False)
    skb = kmv_sketch(b, value_col, k).localCheckpoint(eager=False)
    sku = kmv_merge(ska, skb, k).localCheckpoint(eager=False)
    est_a = kmv_estimate(ska, k).select(
        F.col("est_distinct").alias("est_a")
    )
    est_b = kmv_estimate(skb, k).select(
        F.col("est_distinct").alias("est_b")
    )
    est_u = kmv_estimate(sku, k).select(
        F.col("est_distinct").alias("est_union")
    )
    shared = (
        sku.join(ska, "hk", "left_semi")
        .join(skb, "hk", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    usize = sku.agg(F.count(F.lit(1)).alias("n_union_sketch"))
    exact_a = a.where(F.col(value_col).isNotNull()).agg(
        F.count_distinct(value_col).alias("n_a_exact")
    )
    exact_b = b.where(F.col(value_col).isNotNull()).agg(
        F.count_distinct(value_col).alias("n_b_exact")
    )
    exact_i = (
        a.select(F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .distinct()
        .join(
            b.select(F.col(value_col).alias("_v"))
            .where(F.col("_v").isNotNull())
            .distinct(),
            "_v",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_inter_exact"))
    )
    row = (
        est_a.crossJoin(est_b)
        .crossJoin(est_u)
        .crossJoin(shared)
        .crossJoin(usize)
        .crossJoin(exact_a)
        .crossJoin(exact_b)
        .crossJoin(exact_i)
    )
    # try_divide: BOTH inputs empty -> empty union sketch -> 0/0 must be
    # an undefined (NULL) jaccard, not an ANSI DIVIDE_BY_ZERO mid-job
    # (r13 empty-fixture hunt; the DuckDB oracle's double division gives
    # NaN, which the driver-compare treats as the same undefined)
    jac = F.try_divide(
        F.col("n_shared").cast("double"), F.col("n_union_sketch").cast("double")
    )
    return row.select(
        "n_a_exact",
        "n_b_exact",
        "n_inter_exact",
        "est_a",
        "est_b",
        "est_union",
        "n_shared",
        "n_union_sketch",
        jac.alias("jaccard_est"),
        (jac * F.col("est_union")).alias("est_intersection"),
    )
