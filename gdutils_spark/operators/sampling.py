"""Deterministic sampling and sequence packing for training-data pipelines.

Beyond-reference extensions. Both operators avoid RNG entirely — sampling
decisions and batch assignments derive from md5 arithmetic on stable ids,
so (a) every engine reproduces them bit-for-bit (oracle-testable), (b)
re-running the pipeline over a grown corpus keeps previous decisions
stable (critical for incremental 100 TB ingestion: a document's
keep/drop fate never flips when unrelated data arrives).

* **stratified_sample**: per-stratum keep rates (e.g. downsample English,
  keep all low-resource languages). ``keep ⇔ md5int60(salt‖id) mod 10000
  < rate·10000``. Pure map over the scan — no shuffle, pushdown-friendly.
* **pack_sequences**: assign documents to token-budgeted training batches.
  Documents are sharded by id-hash (parallelism knob), ordered by id
  within the shard, and batched by cumulative token count: a document
  belongs to the batch in which its cumulative count *ends*, so batches
  are contiguous and may overflow the budget by at most one document
  (standard streaming-fill packing; bin-perfect packing is NP-hard and
  order-unstable). One window per shard — scales with shard count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gdutils_spark.operators.dedup import MD5_INT64_DOMAIN

SAMPLE_BUCKETS = 10_000


def _hash_bucket(id_col: Column, salt: str) -> Column:
    key = F.concat(F.lit(salt), id_col.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return h % SAMPLE_BUCKETS


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff its id-hash bucket falls under its stratum's
    rate. Rates are exact per-10k thresholds (0.1 → 1000 of 10000
    buckets); strata not listed use ``default_rate``."""
    bucket = _hash_bucket(F.col(id_col), salt)
    threshold = None
    for stratum, rate in rates.items():
        cut = F.lit(int(round(rate * SAMPLE_BUCKETS)))
        threshold = (
            F.when(F.col(strata_col) == stratum, cut)
            if threshold is None
            else threshold.when(F.col(strata_col) == stratum, cut)
        )
    threshold = (
        threshold.otherwise(F.lit(int(round(default_rate * SAMPLE_BUCKETS))))
        if threshold is not None
        else F.lit(int(round(default_rate * SAMPLE_BUCKETS)))
    )
    return df.where(bucket < threshold)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic WEIGHTED sample without replacement of size ``k``
    (priority sampling — Duffield, Lund & Thorup 2007, JACM
    "Priority sampling for estimation of arbitrary subset sums"): each
    row draws ``u = md5-frac(id) ∈ [0, 1)`` and gets priority
    ``u / w``; the ``k`` SMALLEST priorities are kept, so a row's
    inclusion odds scale with its weight — sample long/high-quality
    documents more, without ever materializing per-row RNG state. The
    md5 draw makes the "random" sample REPRODUCIBLE by any engine,
    incrementally STABLE (a doc's fate never flips when unrelated data
    arrives — the module invariant), and MERGEABLE: the bottom-k by
    priority of a union is the bottom-k of the combined per-shard
    bottom-k's, the :func:`~gdutils_spark.operators.sketches
    .bottomk_sample` lemma with weighted keys.

    Returns ``(id, weight, priority)`` for the kept rows — ``weight``
    passes through with its ORIGINAL column type (consumers keep their
    schema), while the priority divides by its DOUBLE cast, so integer
    token counts and fractional quality scores in (0, 1) both weight
    correctly (no silent integer truncation). Rows with NULL ids or
    NULL/NaN/non-positive weights are SKIPPED (a zero weight divides to
    +inf — never sampled anyway; negative weights have no sampling
    meaning; NaN compares false to everything in Spark but would sort
    ABOVE everything in an oracle's clamp — the hist_registers NaN
    rule). A hash of exactly 0 gives priority 0.0 — still
    deterministic via the id tie-break. Cross-engine parity rests on
    two facts, both already load-bearing elsewhere in the repo: the
    60-bit hash→DOUBLE cast rounds identically in Spark and DuckDB
    (IEEE round-to-nearest — the KMV estimator's convention; 60 bits
    EXCEED the 53-bit mantissa, so this is rounding parity, not exact
    representability), and the two sequential divisions are single IEEE
    ops applied in the same order in both engines. Plan shape: map +
    global ordered LIMIT — TakeOrderedAndProject (per-partition top-k,
    one tiny merge), never a full sort.

    ``group_col``: a PER-GROUP weighted sample ``(grp, id, weight,
    priority)`` — k smallest priorities within each group, the
    per-stratum quota the mixture builders want ("k docs per language,
    length-weighted") where :func:`stratified_sample` keeps a RATE, not
    a count. Rows with a NULL group are skipped like NULL ids. Plan
    shape: one shuffle on the group key + a per-group rank cut — the
    grouped ``bottomk_sample`` convention."""
    from gdutils_spark.operators.dedup import _md5_int64

    if k < 1:
        raise ValueError(f"priority_sample: k={k} must be >= 1")
    u = _md5_int64(F.col(id_col).cast("string")).cast("double") / F.lit(
        MD5_INT64_DOMAIN
    )
    w = F.col(weight_col).cast("double")
    base = df.where(
        F.col(id_col).isNotNull()
        & w.isNotNull()
        & ~F.isnan(w)
        & (w > 0)
    )
    cols = [
        F.col(id_col).alias("id"),
        F.col(weight_col).alias("weight"),
        (u / w).alias("priority"),
    ]
    if group_col is None:
        return base.select(*cols).orderBy("priority", "id").limit(k)
    win = Window.partitionBy("grp").orderBy("priority", "id")
    return (
        base.where(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("grp"), *cols)
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def priority_sample_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Merge two :func:`priority_sample` outputs into the size-``k``
    sample of their union — the bottom-k-by-priority lemma (Duffield et
    al. §3): the k smallest priorities of A ∪ B are among the union of
    each side's k smallest, so per-shard (or per-night) samples combine
    WITHOUT revisiting either corpus. Associative and deterministic
    (priorities are md5-derived, ties break on id), which makes it a
    valid ``merge`` for :func:`~gdutils_spark.streaming
    .stream_merge_sketch` — a weighted reservoir over a stream at
    sample-sized state. Inputs are sample-sized, so the union + ordered
    LIMIT is a TakeOrderedAndProject over ≤ 2k rows.

    Idempotent under population overlap: samples drawn from
    NON-disjoint populations (or a sample merged with itself) repeat
    ids, and because priority is a pure function of (id, weight) the
    repeats are bit-identical rows — ``distinct()`` collapses them
    before the cut so a duplicate can never occupy two of the k slots.
    The same id sampled under DIFFERENT weights is two distinct
    (id, weight, priority) rows and both legitimately compete (the
    lemma requires weight stability per id; reweighted re-draws are a
    new population)."""
    if k < 1:
        raise ValueError(f"priority_sample_merge: k={k} must be >= 1")
    return a.unionByName(b).distinct().orderBy("priority", "id").limit(k)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 8,
) -> DataFrame:
    """Assign every document a ``(shard, batch_idx)`` training-batch id.

    ``shard = md5int60(id) mod shards``; within a shard, documents are
    taken in id order and ``batch_idx = (cumulative_tokens - 1) div
    budget`` — integer-exact, reproducible anywhere.
    """
    if budget < 1:
        raise ValueError(f"pack_sequences: budget={budget} must be >= 1")
    if shards < 1:
        raise ValueError(f"pack_sequences: shards={shards} must be >= 1")
    shard = (_hash_bucket(F.col(id_col), "shard:") % shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.select(F.col(id_col), F.col(token_col), shard)
        .withColumn("cum_tokens", cum)
        .withColumn(
            "batch_idx",
            F.floor(
                F.greatest(F.col("cum_tokens") - 1, F.lit(0)) / F.lit(budget)
            ).cast("long"),
        )
    )


def pack_stats(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 8,
) -> DataFrame:
    """Per-batch summary of :func:`pack_sequences` — the shape a trainer's
    data loader consumes (batch manifest)."""
    packed = pack_sequences(df, id_col, token_col, budget, shards)
    return packed.groupBy("shard", "batch_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("sum_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "",
) -> DataFrame:
    """Deterministic hash-shard assignment for training-data export:
    ``shard = md5int60(salt‖id) mod n_shards``.

    The md5-derived shard (rather than ``id mod n``) decorrelates shard
    membership from id-assignment order, so time-ordered or
    source-clustered id ranges spread evenly — each shard is an unbiased
    corpus sample a downstream trainer can stream independently. Pure
    map over the scan, no shuffle; a partitioned write
    (``df.write.partitionBy("shard")``, see sources/staging.py) turns
    the column into the physical export layout. Same incremental-
    stability property as :func:`stratified_sample`: a document's shard
    never changes when unrelated data arrives.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return df.withColumn("shard", (h % n_shards).cast("int"))


def shard_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str | None = None,
    n_shards: int = 16,
    salt: str = "",
) -> DataFrame:
    """Per-shard balance report over :func:`shard_assign`: row count,
    id extent, and (optionally) total payload size — the skew check an
    export pipeline runs before writing shards. One map-side-combinable
    hash aggregate; output is n_shards rows."""
    sharded = shard_assign(df, id_col, n_shards, salt)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return sharded.groupBy("shard").agg(*aggs)


def domain_mix_rates(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    target_weight: Column,
    budget_frac: float,
) -> DataFrame:
    """Per-stratum sampling rates that steer the corpus toward a target
    domain mix — the "mixture weights" step of training-data curation
    (cf. the DoReMi/Pile practice of reweighting sources): given an
    unnormalized per-row ``target_weight`` expression (constant within a
    stratum) and a global budget of ``budget_frac`` of the corpus, emit
    for each stratum the keep-rate that hits its share of the budget,
    capped at 1.0 (a stratum can't be upsampled by a filter — the
    shortfall is visible in ``expected_weight``).

    Every output is either an exact integer aggregate or a fixed-order
    IEEE expression over them (share = w/W, rate = min(1, share·budget /
    stratum_weight)), so any engine reproduces the rates bit-for-bit.
    Plan shape: ONE hash agg on the stratum key over the corpus; the
    strata then pack into a single row where both totals fold from the
    SAME array (exact integer folds, order-insensitive) — a naive
    ``per.agg(...)`` + join-back duplicates the aggregate subtree and
    scans the corpus twice. Rows never shuffle.
    """
    if not budget_frac > 0.0:
        raise ValueError(f"domain_mix_rates: budget_frac={budget_frac} must be > 0")
    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col)).alias("total_weight"),
        F.max(target_weight).alias("_tw"),
    )
    # fold zeros typed from the aggregated columns (a long-typed zero
    # breaks DOUBLE weight columns), and NULL stratum totals coalesced
    # away so one all-NULL stratum can't poison every other stratum's
    # rate — matching F.sum's NULL-skipping semantics
    w_type = per.schema["total_weight"].dataType
    tw_type = per.schema["_tw"].dataType
    packed = per.agg(
        F.array_sort(
            F.collect_list(F.struct("stratum", "n_docs", "total_weight", "_tw"))
        ).alias("_a")
    ).select(
        "_a",
        F.aggregate(
            "_a",
            F.lit(0).cast(w_type),
            lambda acc, x: acc
            + F.coalesce(x["total_weight"], F.lit(0).cast(w_type)),
        ).alias("_corpus"),
        # a stratum with NO usable weight contributes to neither total:
        # counting its target weight in _W would dilute every other
        # stratum's share and silently under-fill the budget (its own
        # rate is NULL, so its budget slice is unspendable) — consistent
        # with temperature_mix_rates, whose NULL stratum drops out of _S
        F.aggregate(
            "_a",
            F.lit(0).cast(tw_type),
            lambda acc, x: acc
            + F.when(
                x["total_weight"].isNull(), F.lit(0).cast(tw_type)
            ).otherwise(F.coalesce(x["_tw"], F.lit(0).cast(tw_type))),
        ).alias("_W"),
    )
    x = F.col("_x")
    share = x["_tw"].cast("double") / F.col("_W").cast("double")
    budget = F.col("_corpus").cast("double") * F.lit(float(budget_frac))
    # zero/NULL-weight stratum: rate is UNDEFINED (NULL -> the sampler
    # keeps nothing), never an ANSI DIVIDE_BY_ZERO that kills the job
    # (r13 null-fixture hunt; the when() guard also covers NULL since
    # NULL > 0 is NULL). Oracle twin: the CASE in _MIX_RATE_SQL.
    rate = F.when(
        x["total_weight"].cast("double") > 0,
        F.least(F.lit(1.0), share * budget / x["total_weight"].cast("double")),
    )
    return packed.select(F.explode("_a").alias("_x"), "_corpus", "_W").select(
        x["stratum"].alias("stratum"),
        x["n_docs"].alias("n_docs"),
        x["total_weight"].alias("total_weight"),
        share.alias("target_share"),
        rate.alias("rate"),
        (rate * x["total_weight"].cast("double")).alias("expected_weight"),
    )


def domain_mix_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: DataFrame,
    salt: str = "",
) -> DataFrame:
    """Apply :func:`domain_mix_rates` output to the corpus: keep a row
    iff its id-hash bucket falls under its stratum's rate threshold
    (``floor(rate·10000 + 0.5)`` — half-up, engine-identical). The rates
    table is stratum-cardinality-sized and broadcasts; the decision is
    the same RNG-free md5 rule as :func:`stratified_sample`, so the
    sample is reproducible and stable under corpus growth. No collect:
    rates flow executor-side, so the plan works when the mix is computed
    and applied in one job at 100 TB.
    """
    thr = F.floor(F.col("rate") * F.lit(float(SAMPLE_BUCKETS)) + F.lit(0.5)).cast(
        "long"
    )
    r = rates.select(F.col("stratum"), thr.alias("_thr"))
    bucket = _hash_bucket(F.col(id_col), salt)
    return (
        df.join(F.broadcast(r), df[strata_col] == F.col("stratum"))
        .where(bucket < F.col("_thr"))
        .drop("stratum", "_thr")
    )


def temperature_mix_rates(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture rates (the mT5/multilingual practice):
    stratum share ∝ (stratum weight)^α, flattening the head and lifting
    the tail as α → 0 — the standard fix for a corpus where two
    languages dwarf the rest. Complements :func:`domain_mix_rates`,
    which takes explicit target weights; here the target is derived
    from the observed distribution itself.

    Determinism: for the default α = 0.5 the exponent is ``sqrt`` —
    IEEE-correctly-rounded in every engine, unlike ``pow`` (libm-ulp
    territory; other α values use ``pow`` and are property-tested, not
    oracle-compared). The share denominator folds the per-stratum roots
    in ascending stratum order (the one rounding freedom), and every
    other term is an exact integer aggregate or a fixed-order IEEE
    expression — bit-identical cross-engine.

    Plan shape: ONE stratum-keyed hash agg over the corpus, then the
    strata pack into a single row (``collect_list``) where the corpus
    total and the share denominator both fold from the SAME array — a
    naive ``per.agg(...)`` + join-back would re-derive the stratum
    aggregate and scan the corpus twice (plan-asserted single scan).
    Rows never shuffle. Feed the rates to :func:`domain_mix_sample`'s
    md5 rule to apply them RNG-free.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not budget_frac > 0.0:
        raise ValueError(
            f"temperature_mix_rates: budget_frac={budget_frac} must be > 0"
        )
    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col)).alias("total_weight"),
    )
    tw = F.col("total_weight").cast("double")
    root = F.sqrt(tw) if alpha == 0.5 else F.pow(tw, F.lit(alpha))
    per = per.select("stratum", "n_docs", "total_weight", root.alias("_r"))
    # fold zero typed from the weight column (long zero breaks DOUBLE
    # weights); NULL stratum totals coalesced so they can't poison the
    # corpus total (F.sum semantics)
    w_type = per.schema["total_weight"].dataType
    packed = per.agg(
        F.array_sort(
            F.collect_list(F.struct("stratum", "n_docs", "total_weight", "_r"))
        ).alias("_a")
    ).select(
        "_a",
        F.aggregate(
            "_a",
            F.lit(0).cast(w_type),
            lambda acc, x: acc
            + F.coalesce(x["total_weight"], F.lit(0).cast(w_type)),
        ).alias("_corpus"),
        F.aggregate(
            "_a", F.lit(0.0), lambda acc, x: acc + F.coalesce(x["_r"], F.lit(0.0))
        ).alias("_S"),
    )
    x = F.col("_x")
    # the zero/NULL-weight-stratum guard of domain_mix_rates: share and
    # rate are NULL (undefined), not a DIVIDE_BY_ZERO
    share = F.when(F.col("_S") > 0, x["_r"] / F.col("_S"))
    rate = F.when(
        x["total_weight"].cast("double") > 0,
        F.least(
            F.lit(1.0),
            share
            * (F.col("_corpus").cast("double") * F.lit(float(budget_frac)))
            / x["total_weight"].cast("double"),
        ),
    )
    return packed.select(
        F.explode("_a").alias("_x"), "_corpus", "_S"
    ).select(
        x["stratum"].alias("stratum"),
        x["n_docs"].alias("n_docs"),
        x["total_weight"].alias("total_weight"),
        share.alias("temp_share"),
        rate.alias("rate"),
        (rate * x["total_weight"].cast("double")).alias("expected_weight"),
    )
