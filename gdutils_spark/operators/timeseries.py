"""Time-series operators: grid resampling with linear interpolation,
rolling-origin backtest folds, and per-entity feed-health gap reports
(batch + mergeable-register streaming form).

Beyond-reference operator in the reference's own domain — glider/GTS
feeds are irregular in time (``/root/reference/gdutils/osmc/__init__.py``
fetches raw fixes; ``/root/reference/gdutils/__init__.py:770-805`` raw
sensor series), and every downstream consumer (gridded products, model
assimilation, feature windows for training) wants a regular grid. The
pandas idiom is ``resample().interpolate()`` per entity; here it is one
relational plan.

Spark-first shape (the as-of union trick, shared with
``operators/joins.asof_join``): observations and grid points UNION into
one relation, ONE shuffle on the entity key, and within each partition a
time-ordered window carries the previous/next observation to every grid
point — no range join, no per-entity loop, no pair blow-up. All
arithmetic is integer epoch-micros plus one double division, so results
are bit-identical across engines (IEEE ops in a pinned order).

At 100 TB the window per entity is the only dense structure: state is a
single carried struct, and partitions hold one entity's obs+grid rows.
A single hot entity with billions of observations would bottleneck its
one window partition — for that shape, pre-chunk time into ranges that
overlap by one observation on each side and window per (entity, chunk),
same as any ordered-scan skew fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_interpolate(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Per-entity regular grid at ``step_seconds`` with linear
    interpolation: one output row per grid instant between each entity's
    first and last observation (grid aligned to the epoch, so instants
    are comparable ACROSS entities), value linearly interpolated between
    the surrounding observations — exact passthrough when a grid instant
    coincides with an observation.

    Determinism contract: duplicate-timestamp observations collapse to
    their ``max`` (order-insensitive) before interpolation; the interp
    itself is ``v0 + (v1-v0) * ((t-t0)/(t1-t0))`` with the time deltas
    computed as exact integer micros, then ONE double division and one
    fused multiply-add-free multiply+add — the same expression order in
    any IEEE engine reproduces the bits, so the whole relation
    hash-verifies against a SQL oracle.

    Output: ``(entity_col, ts, v_interp)``.
    """
    if step_seconds < 1:
        raise ValueError(f"resample_interpolate: step_seconds={step_seconds} must be >= 1")
    step_us = int(step_seconds) * 1_000_000
    obs = (
        df.select(
            F.col(entity_col).alias("__e"),
            F.unix_micros(F.col(ts_col)).alias("__t"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .where(F.col("__e").isNotNull() & F.col("__t").isNotNull() & F.col("__v").isNotNull())
        .groupBy("__e", "__t")
        .agg(F.max("__v").alias("__v"))
    )
    # ceil/floor-to-step via exact long modulo (never a double division:
    # epoch micros near 2^51 would round at the double mantissa edge).
    # pmod, not %: Spark's % keeps the dividend's sign, so `x - x % step`
    # rounds toward zero for pre-1970 timestamps (negative epoch micros)
    # and the grid would misalign or skip instants; pmod is always
    # non-negative, giving true floor alignment on the full epoch line.
    x0 = F.min("__t") + F.lit(step_us - 1)
    x1 = F.max("__t")
    bounds = obs.groupBy("__e").agg(
        (x0 - F.pmod(x0, F.lit(step_us))).alias("__g0"),
        (x1 - F.pmod(x1, F.lit(step_us))).alias("__g1"),
    )
    grid = bounds.where(F.col("__g0") <= F.col("__g1")).select(
        "__e",
        F.explode(F.sequence("__g0", "__g1", F.lit(step_us))).alias("__t"),
    )
    u = obs.select(
        "__e", "__t", F.lit(0).alias("__side"), F.col("__t").alias("__ot"), "__v"
    ).unionByName(
        grid.select(
            "__e",
            "__t",
            F.lit(1).alias("__side"),
            F.lit(None).cast("long").alias("__ot"),
            F.lit(None).cast("double").alias("__v"),
        )
    )
    # obs sort BEFORE the co-timed grid row (side 0 < 1): the backward
    # carry then includes it (exact passthrough) and the forward carry,
    # which starts at the grid row itself, does not.
    #
    # BOTH carries run as [unboundedPreceding, currentRow] frames — the
    # forward one over the REVERSED (t desc, side desc) order, which
    # selects exactly the original [currentRow, unboundedFollowing] row
    # set (same-t obs still excluded: side 0 sorts after side 1 under
    # desc). This is a measured scale requirement, not style: Spark's
    # running-frame processor is incremental (O(n) per entity), while
    # an [currentRow, unboundedFollowing] frame re-evaluates its
    # aggregate from scratch at every row — O(n²), and a 500k-obs hub
    # entity pins one core for minutes (tools/resample_skew_probe.py).
    # Same partitioning either way: one exchange, two in-partition sorts.
    w_back = (
        Window.partitionBy("__e")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__e")
        .orderBy(F.col("__t").desc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__e",
        "__t",
        "__side",
        F.last("__ot", ignorenulls=True).over(w_back).alias("__t0"),
        F.last("__v", ignorenulls=True).over(w_back).alias("__v0"),
        F.last("__ot", ignorenulls=True).over(w_fwd).alias("__t1"),
        F.last("__v", ignorenulls=True).over(w_fwd).alias("__v1"),
    )
    interp = F.when(F.col("__t") == F.col("__t0"), F.col("__v0")).otherwise(
        F.col("__v0")
        + (F.col("__v1") - F.col("__v0"))
        * (
            (F.col("__t") - F.col("__t0")).cast("double")
            / (F.col("__t1") - F.col("__t0")).cast("double")
        )
    )
    # a grid instant co-timed with the LAST observation has no forward
    # neighbor but needs none — exact passthrough keeps it
    return carried.where(
        (F.col("__side") == 1)
        & F.col("__t0").isNotNull()
        & (F.col("__t1").isNotNull() | (F.col("__t0") == F.col("__t")))
    ).select(
        F.col("__e").alias(entity_col),
        F.timestamp_micros(F.col("__t")).alias("ts"),
        interp.alias("v_interp"),
    )


def rolling_origin_folds(
    df: DataFrame,
    ts_col: str,
    n_folds: int,
    horizon_seconds: int,
) -> DataFrame:
    """Rolling-origin backtest manifest — the time-series analogue of
    k-fold CV (Tashman 2000, "Out-of-sample tests of forecasting
    accuracy"): ``n_folds`` adjacent test windows of ``horizon_seconds``
    ending at the corpus max timestamp, each trained on everything at or
    before its window's start. Output one row per fold:
    ``(fold, train_end, test_end, n_train, n_test)`` — the split
    manifest a training pipeline materializes BEFORE shuffling any data,
    so leakage checks and fold sizing are a metadata query, not a pass
    per fold.

    Fold k (1-based) tests on ``(t1 - (n-k+1)·h, t1 - (n-k)·h]`` and
    trains on ``ts <= t1 - (n-k+1)·h``; windows are disjoint and
    adjacent, so EVERY row belongs to at most one test window and the
    whole manifest derives from ONE conditional histogram: each row maps
    to an integer bucket (exact micros arithmetic), one
    map-side-combinable groupBy counts the buckets (<= n+1 groups), and
    the per-fold train counts are a prefix sum over the fold spine —
    the corpus is scanned once and never duplicated per fold. The 1-row
    bounds aggregate broadcasts back onto the scan (never a driver
    collect)."""
    if n_folds < 1:
        raise ValueError(f"rolling_origin_folds: n_folds={n_folds} must be >= 1")
    if horizon_seconds < 1:
        raise ValueError(
            f"rolling_origin_folds: horizon_seconds={horizon_seconds} must be >= 1"
        )
    h_us = int(horizon_seconds) * 1_000_000
    base = df.select(F.unix_micros(F.col(ts_col)).alias("__t")).where(
        F.col("__t").isNotNull()
    )
    bounds = base.agg(F.max("__t").alias("__t1"))
    # bucket b (0-based) covers (t1-(n-b)h, t1-(n-b-1)h]; pre-window -> -1.
    # ceil(rel/h)-1 in pure integer arithmetic (long div — no doubles).
    bucket = F.when(F.col("__rel") <= 0, F.lit(-1)).otherwise(
        F.expr(f"(__rel + {h_us - 1}) div {h_us}") - 1
    ).cast("int")
    hist = (
        base.join(F.broadcast(bounds))
        .withColumn(
            "__rel",
            F.col("__t") - (F.col("__t1") - F.lit(int(n_folds)) * F.lit(h_us)),
        )
        .select(bucket.alias("__b"), "__t1")
        .groupBy("__b", "__t1")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    spine = (
        df.sparkSession.range(1, n_folds + 1)
        .select(F.col("id").cast("int").alias("fold"))
        .join(F.broadcast(bounds))
    )
    # n_test_k = hist[b = k-1]; n_train_k = all buckets b <= k-2 (incl. -1)
    joined = spine.join(
        F.broadcast(hist.drop("__t1")), spine["fold"] - 1 == hist["__b"], "left"
    ).select(
        "fold",
        "__t1",
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_test"),
    )
    w_cum = Window.orderBy("fold").rowsBetween(Window.unboundedPreceding, -1)
    pre = hist.where(F.col("__b") == -1).agg(
        F.coalesce(F.sum("__n"), F.lit(0)).alias("__pre")
    )
    return (
        joined.join(F.broadcast(pre))
        .select(
            "fold",
            F.timestamp_micros(
                F.col("__t1") - (F.lit(n_folds) - F.col("fold") + 1) * F.lit(h_us)
            ).alias("train_end"),
            F.timestamp_micros(
                F.col("__t1") - (F.lit(n_folds) - F.col("fold")) * F.lit(h_us)
            ).alias("test_end"),
            (
                F.col("__pre")
                + F.coalesce(F.sum("n_test").over(w_cum), F.lit(0))
            ).alias("n_train"),
            "n_test",
        )
    )


def entity_gap_report(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_threshold_seconds: int,
) -> DataFrame:
    """Per-entity reporting-gap summary — ``(entity, n_obs, span_s,
    n_gaps, max_gap_s, coverage_frac)`` where a gap is a
    consecutive-observation delta exceeding ``gap_threshold_seconds``
    and ``coverage_frac`` is the share of the entity's span NOT lost to
    such gaps. The quantitative twin of the reference's deployment-days
    calendar (``/root/reference/gdutils/__init__.py:587-589`` answers
    "was the glider out?"; this answers "was it REPORTING, and how much
    did we lose?") — the feed-health gate a 100 TB ingest runs per
    platform per night.

    Plan shape: ONE shuffle on the entity key serves a single lag
    window, then a map-side-combinable per-entity aggregate — gaps are
    exact integer micros, the only double is the final coverage
    division, so the relation hash-verifies cross-engine.
    Single-observation entities report a 0 span with coverage 1.0 (a
    span of nothing is fully covered; the n_obs column is the signal
    there). Duplicate timestamps contribute 0-length deltas and never
    count as gaps."""
    if gap_threshold_seconds < 1:
        raise ValueError(
            f"entity_gap_report: gap_threshold_seconds={gap_threshold_seconds} must be >= 1"
        )
    thr_us = int(gap_threshold_seconds) * 1_000_000
    base = df.select(
        F.col(entity_col).alias("__e"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
    ).where(F.col("__e").isNotNull() & F.col("__t").isNotNull())
    w = Window.partitionBy("__e").orderBy("__t")
    lagged = base.select(
        "__e",
        "__t",
        (F.col("__t") - F.lag("__t").over(w)).alias("__d"),
    )
    agg = lagged.groupBy("__e").agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.max("__t") - F.min("__t")).alias("__span_us"),
        F.sum((F.col("__d") > thr_us).cast("long")).alias("n_gaps"),
        F.coalesce(F.max("__d"), F.lit(0)).alias("__max_gap_us"),
        F.coalesce(
            F.sum(F.when(F.col("__d") > thr_us, F.col("__d"))), F.lit(0)
        ).alias("__lost_us"),
    )
    return agg.select(
        F.col("__e").alias(entity_col),
        "n_obs",
        (F.col("__span_us") / F.lit(1_000_000)).cast("double").alias("span_s"),
        F.coalesce(F.col("n_gaps"), F.lit(0)).alias("n_gaps"),
        (F.col("__max_gap_us") / F.lit(1_000_000)).cast("double").alias("max_gap_s"),
        F.when(F.col("__span_us") == 0, F.lit(1.0))
        .otherwise(
            F.lit(1.0)
            - F.col("__lost_us").cast("double") / F.col("__span_us").cast("double")
        )
        .alias("coverage_frac"),
    )


def gap_registers(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_threshold_seconds: int,
) -> DataFrame:
    """MERGEABLE per-entity gap-register table — the sketch form of
    :func:`entity_gap_report`: one row per entity summarizing ONE
    time-contiguous chunk of its observations, ``(entity, c_min_us,
    c_max_us, n_obs, n_gaps, max_gap_us, lost_us, overlapped)``.

    Gap statistics are ASSOCIATIVE over time-disjoint chunks: merging
    chunk A=[a0,a1] and B=[b0,b1] with a1 <= b0 adds exactly one
    boundary delta (b0 - a1) to A's and B's internal stats. That makes
    this the ``build`` half of a
    :func:`~gdutils_spark.streaming.stream_merge_sketch` pair (the
    hll_merge/cms_merge convention): per-night (or per-micro-batch)
    registers fold into the corpus report WITHOUT revisiting history,
    at one-row-per-entity state. ``overlapped`` is always false here;
    :func:`gap_merge` sets it when chunks interleave (see there)."""
    if gap_threshold_seconds < 1:
        raise ValueError(
            f"gap_registers: gap_threshold_seconds={gap_threshold_seconds} must be >= 1"
        )
    thr_us = int(gap_threshold_seconds) * 1_000_000
    base = df.select(
        F.col(entity_col).alias("entity"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
    ).where(F.col("entity").isNotNull() & F.col("__t").isNotNull())
    w = Window.partitionBy("entity").orderBy("__t")
    lagged = base.select(
        "entity", "__t", (F.col("__t") - F.lag("__t").over(w)).alias("__d")
    )
    return lagged.groupBy("entity").agg(
        F.min("__t").alias("c_min_us"),
        F.max("__t").alias("c_max_us"),
        F.count(F.lit(1)).alias("n_obs"),
        F.coalesce(
            F.sum((F.col("__d") > thr_us).cast("long")), F.lit(0)
        ).alias("n_gaps"),
        F.coalesce(F.max("__d"), F.lit(0)).alias("max_gap_us"),
        F.coalesce(
            F.sum(F.when(F.col("__d") > thr_us, F.col("__d"))), F.lit(0)
        ).alias("lost_us"),
        F.lit(False).alias("overlapped"),
    )


def gap_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two :func:`gap_registers` tables — a plain UNION of chunk
    rows, which is what makes the merge trivially associative,
    commutative and order-invariant: a chunk's gap statistics are final
    the moment it is built, and the boundary deltas BETWEEN chunks are
    deliberately NOT resolved here, because whether two chunks are
    adjacent is unknowable until every chunk has arrived (an eagerly
    folded boundary between batch 3 and batch 1 becomes a fake gap the
    moment batch 2 lands in between — caught by
    tests/test_timeseries.py::test_gap_merge_lemma_matches_whole_corpus).
    Boundary resolution happens once, at presentation, in
    :func:`gap_report_from_registers`, where the full chunk set sorts
    into its global order.

    State size: one row per (entity, chunk) — a chunk per micro-batch
    or nightly slice that touched the entity, compacted only at read
    time. Deterministic under replay (union of deterministic builds),
    satisfying the ``stream_merge_sketch`` replay contract."""
    return a.unionByName(b)


def gap_report_from_registers(
    regs: DataFrame, gap_threshold_seconds: int
) -> DataFrame:
    """Resolve a register table into :func:`entity_gap_report`'s exact
    schema plus a sticky ``overlapped`` flag: per entity the chunks sort
    by ``c_min_us`` and fold left-to-right with a Catalyst ``aggregate``
    (the pinned-order collect_list + array_sort convention) — each
    boundary contributes one delta (next chunk's min minus the running
    max), judged against the threshold exactly like an in-chunk delta.

    Contract: chunks must be time-DISJOINT per entity (true for
    time-partitioned feeds — each file/micro-batch covers its own time
    slice; a shared boundary instant is fine, the delta is 0). On such
    registers the result is bit-identical to the batch
    :func:`entity_gap_report` over the combined observations (the merge
    lemma, asserted in tests and by the streaming oracle query). If
    chunks INTERLEAVE, boundary deltas are no longer exact — totals stay
    conservative (negative deltas contribute nothing) and the
    ``overlapped`` flag raises so the inexactness is VISIBLE, never
    silent."""
    if gap_threshold_seconds < 1:
        raise ValueError(
            f"gap_report_from_registers: gap_threshold_seconds="
            f"{gap_threshold_seconds} must be >= 1"
        )
    thr_us = int(gap_threshold_seconds) * 1_000_000
    chunks = regs.groupBy("entity").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "c_min_us", "c_max_us", "n_obs", "n_gaps",
                    "max_gap_us", "lost_us", "overlapped",
                )
            )
        ).alias("__cs")
    )
    acc0 = F.struct(
        F.lit(None).cast("long").alias("c_min_us"),
        F.lit(None).cast("long").alias("c_max_us"),
        F.lit(0).cast("long").alias("n_obs"),
        F.lit(0).cast("long").alias("n_gaps"),
        F.lit(0).cast("long").alias("max_gap_us"),
        F.lit(0).cast("long").alias("lost_us"),
        F.lit(False).alias("overlapped"),
    )

    def fold(acc, c):
        first = acc["c_max_us"].isNull()
        d = c["c_min_us"] - acc["c_max_us"]  # null on first
        gap = ~first & (d > thr_us)
        overlap = ~first & (d < 0)
        return F.struct(
            F.when(first, c["c_min_us"]).otherwise(acc["c_min_us"]).alias("c_min_us"),
            F.greatest(F.coalesce(acc["c_max_us"], c["c_max_us"]), c["c_max_us"]).alias("c_max_us"),
            (acc["n_obs"] + c["n_obs"]).alias("n_obs"),
            (acc["n_gaps"] + c["n_gaps"] + gap.cast("long")).alias("n_gaps"),
            F.greatest(
                acc["max_gap_us"],
                c["max_gap_us"],
                F.coalesce(F.when(~first & (d > 0), d), F.lit(0)),
            ).alias("max_gap_us"),
            (acc["lost_us"] + c["lost_us"] + F.coalesce(F.when(gap, d), F.lit(0))).alias("lost_us"),
            (acc["overlapped"] | c["overlapped"] | overlap).alias("overlapped"),
        )

    folded = chunks.select(
        "entity", F.aggregate("__cs", acc0, fold).alias("__r")
    ).select("entity", "__r.*")
    span = F.col("c_max_us") - F.col("c_min_us")
    return folded.select(
        "entity",
        "n_obs",
        (span / F.lit(1_000_000)).cast("double").alias("span_s"),
        "n_gaps",
        (F.col("max_gap_us") / F.lit(1_000_000)).cast("double").alias("max_gap_s"),
        F.when(span == 0, F.lit(1.0))
        .otherwise(
            F.lit(1.0) - F.col("lost_us").cast("double") / span.cast("double")
        )
        .alias("coverage_frac"),
        "overlapped",
    )
