"""Similarity search over embedding columns (array<float>).

* **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus scan, compute cosine as a left-to-right
  double fold (zip_with + aggregate: pure Catalyst, codegen'd, and
  bit-reproducible in any engine that folds in index order), then
  row_number per query. At 100 TB the corpus side stays partitioned; cost
  is one scan × |queries|.
* **Sign-LSH bucketing** — the scale path: project each vector onto R
  deterministic Rademacher hyperplanes (component j of plane p is ±1 by a
  bit of md5(p:j) — reproducible, no stored model), bucket by the sign
  pattern, and only score pairs sharing a bucket.
* **Near-dup pairs** — all candidate pairs with cosine >= threshold.

Execution notes (measured, sf0.1, local[32]):

* Spark's higher-order functions (``zip_with``/``aggregate``) are
  CodegenFallback — interpreted per row. A 64-dim fold inside an O(N²)
  pair loop costs ~11 s for 2M pairs.
* Unrolling the fold to ``a[0]*b[0] + a[1]*b[1] + ...`` compiles into
  whole-stage codegen, but a 64-term tree generates a method past the
  JVM JIT's bytecode limit — HotSpot leaves it interpreted and it's
  *slower* (~35 s) than the fold. Small unrolls (≤16 terms) JIT fine.
* The hot path (all-pairs scoring) therefore uses an **Arrow-batched
  pandas UDF** whose inner loop is vectorized across pairs and
  sequential across dims: per-row accumulation order is exactly
  j = 0..d-1, so each score is bit-identical to a sequential
  left-to-right double fold (IEEE-754 ops are deterministic; engine
  parity with DuckDB's list_cosine_similarity holds).
* Per-row expressions (norms, LSH plane projections, small top-k scans)
  stay JVM-side as unrolled codegen'd arithmetic.
"""

from __future__ import annotations

import hashlib
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIMS = 64


def dot(a: Column, b: Column, dims: int | None = DEFAULT_DIMS) -> Column:
    """Index-ordered double sum of the elementwise product.

    With static ``dims``, unrolled for codegen; ``dims=None`` falls back to
    the higher-order fold for dynamic-length arrays.
    """
    if dims is None:
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
    return reduce(
        lambda acc, i: acc + a[i].cast("double") * b[i].cast("double"),
        range(1, dims),
        a[0].cast("double") * b[0].cast("double"),
    )


def norm(a: Column, dims: int | None = DEFAULT_DIMS) -> Column:
    if dims is None:
        return F.sqrt(
            F.aggregate(
                a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
            )
        )
    return F.sqrt(
        reduce(
            lambda acc, i: acc + a[i].cast("double") * a[i].cast("double"),
            range(1, dims),
            a[0].cast("double") * a[0].cast("double"),
        )
    )


def cosine(a: Column, b: Column, dims: int | None = DEFAULT_DIMS) -> Column:
    return dot(a, b, dims) / (norm(a, dims) * norm(b, dims))


def _well_formed(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Entry filter applied by EVERY public similarity operator (r13
    null-fixture hunt): rows with a NULL id, a NULL vector, or any
    NULL/NaN element are excluded up front — one malformed vector
    otherwise crashes np.stack mid-job ("all input arrays must have the
    same shape"), poisons cosine/PQ math with NaN, and DuckDB's
    list_cosine_similarity refuses NULL outright, so the oracles pin
    the identical contract (their e-CTEs carry the same WHERE)."""
    v = F.col(vec_col)
    return df.where(
        F.col(id_col).isNotNull()
        & v.isNotNull()
        & ~F.exists(v, lambda x: x.isNull() | F.isnan(x))
    )


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dims: int | None = None,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Default ``dims=None`` keeps the scoring as a higher-order fold: the
    |queries|·N pair count is small, and an unrolled 64-term expression
    would cost more in codegen compilation than interpretation saves.

    queries is broadcast (always small relative to the corpus —
    ``max_query_rows`` fail-fasts an accidental corpus-as-queries swap);
    scoring is a map over the corpus scan; top-k is one shuffle on
    query_id. Ties break on neighbor id for determinism.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    queries = _well_formed(queries, id_col, vec_col)
    return _knn_topk(
        vectors, queries, id_col, vec_col, k, dims, max_query_rows,
        "knn_bruteforce",
    )


def _knn_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dims: int | None,
    max_query_rows: int,
    fn: str,
    filter_col: str | None = None,
) -> DataFrame:
    """Shared exact-kNN kernel for :func:`knn_bruteforce` (cross join)
    and :func:`knn_filtered` (attribute equi-join) — ONE copy of the
    norm hoist, cosine expression and tie-broken top-k window, so a
    scoring or tie-break fix can never drift between them. The only
    varying piece is candidate generation: with ``filter_col`` the
    broadcast join is KEYED on the attribute (each corpus row scored
    only against queries that can accept it); without it, every
    (query, corpus) pair is scored."""
    from pyspark.sql import Window

    _guard_query_rows(queries, id_col, max_query_rows, fn)
    fq = [F.col(filter_col).alias("_fq")] if filter_col else []
    fv = [F.col(filter_col).alias("_fv")] if filter_col else []
    # hoist each side's norm out of the pair computation: computed once
    # per row at scan time, not once per (query, neighbor) pair
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *fq,
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col), dims).alias("q_norm"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        *fv,
        F.col(vec_col).alias("v_vec"),
        norm(F.col(vec_col), dims).alias("v_norm"),
    )
    joined = (
        v.join(F.broadcast(q), F.col("_fv") == F.col("_fq"))
        if filter_col
        else v.crossJoin(F.broadcast(q))
    )
    scored = joined.where(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("q_vec"), F.col("v_vec"), dims)
            / (F.col("q_norm") * F.col("v_norm"))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def knn_filtered(
    vectors: DataFrame,
    queries: DataFrame,
    filter_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dims: int | None = None,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """ATTRIBUTE-FILTERED exact kNN: top-k cosine neighbors per query
    among corpus rows sharing the query's ``filter_col`` value — the
    "nearest documents in the same language / same domain / same
    license" search every curation pipeline runs (production vector
    stores call this filtered or faceted ANN). Returns
    ``(query_id, neighbor_id, score)``, self-matches excluded, ties
    broken on neighbor id.

    The filter is applied INSIDE the candidate generation, not on the
    result: the :func:`knn_bruteforce` cross join becomes an EQUI-JOIN
    on ``filter_col``, so Catalyst plans a broadcast hash join keyed on
    the attribute and each corpus row is scored only against the
    queries that can accept it — with Q queries over L distinct
    attribute values, that is ~Q/L scorings per row instead of Q. A
    post-filter on the unfiltered top-k would instead silently return
    FEWER than k (or zero) matching neighbors. NULL attributes match
    nothing on either side (equi-join semantics — a NULL-labeled row
    can't be "the same language" as anything)."""
    vectors = _well_formed(vectors, id_col, vec_col)
    queries = _well_formed(queries, id_col, vec_col)
    return _knn_topk(
        vectors, queries, id_col, vec_col, k, dims, max_query_rows,
        "knn_filtered", filter_col=filter_col,
    )


def knn_hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_pos: int = 5,
    n_neg: int = 5,
    dims: int | None = None,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    corpus rows ranked ``(k_pos, k_pos + n_neg]`` by exact cosine — the
    nearest NON-neighbors, the negatives just below the positive cut
    that carry the most gradient signal (cf. DPR, Karpukhin et al.
    2020). Returns ``(query_id, neighbor_id, score, neg_rank)`` with
    ``neg_rank`` 1-based within the negative band.

    Identical plan shape to :func:`knn_bruteforce` (broadcast queries,
    corpus-scan scoring, ONE query-keyed top-(k+n) shuffle): mining
    negatives costs exactly one brute-force pass, and at scale the same
    IVF/PQ candidate generators substitute for the exact ranking."""
    vectors = _well_formed(vectors, id_col, vec_col)
    queries = _well_formed(queries, id_col, vec_col)
    from pyspark.sql import Window

    _guard_query_rows(queries, id_col, max_query_rows, "knn_hard_negatives")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col), dims).alias("q_norm"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_vec"),
        norm(F.col(vec_col), dims).alias("v_norm"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("q_vec"), F.col("v_vec"), dims)
                / (F.col("q_norm") * F.col("v_norm"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") > k_pos) & (F.col("rn") <= k_pos + n_neg))
        .select(
            "query_id",
            "neighbor_id",
            "score",
            (F.col("rn") - F.lit(k_pos)).cast("int").alias("neg_rank"),
        )
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    dims: int | None = 64,
    max_broadcast_rows: int = 100_000,
) -> DataFrame:
    """All pairs (d1 < d2) with cosine >= threshold — exact brute force.

    Block-broadcast execution: the corpus matrix is broadcast once to
    every task (exactly what a broadcast join would ship), and each
    mapInPandas batch scores its rows against the full matrix with a
    dim-sequential vectorized loop, emitting ONLY the qualifying pairs.
    Nothing O(N²) ever crosses the Arrow boundary or a shuffle — the
    N²·d flops run inside one scan-shaped stage that parallelizes over
    the corpus partitions.

    Per-pair accumulation order is j = 0..d-1, so scores are
    bit-identical to a sequential double fold (DuckDB oracle parity).

    This is the *baseline/verification* operator: it assumes the corpus
    fits a broadcast (same constraint as any broadcast join), and it
    REFUSES to run past ``max_broadcast_rows`` (default 100k rows ≈
    50 MB of float64 at 64 dims — comfortably broadcast-sized) so the
    exact baseline can't be pointed at an entity-scale corpus by
    accident. For anything larger use :func:`lsh_near_dup_pairs`, the
    bucketed scale path that never materializes the corpus anywhere.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    spark = vectors.sparkSession
    base = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    # cheap pruned + LIMIT-bounded probe BEFORE the driver collect, so an
    # oversized corpus fails fast (scanning at most threshold+1 rows)
    # instead of OOMing the driver — or paying a full count just to pass
    n_rows = base.select("_id").limit(max_broadcast_rows + 1).count()
    if n_rows > max_broadcast_rows:
        raise ValueError(
            f"embedding_near_dup_pairs is the broadcast-sized exact baseline: "
            f"corpus exceeds max_broadcast_rows={max_broadcast_rows}. "
            f"Use lsh_near_dup_pairs (banded sign-LSH candidates + exact "
            f"verification) for corpora that don't fit a broadcast, or raise "
            f"max_broadcast_rows explicitly if you really mean it."
        )
    pdf_all = base.toPandas()
    if pdf_all.empty:
        # no vectors -> no pairs: a well-formed empty relation, not an
        # np.stack crash (r13 empty-fixture hunt)
        return vectors.sparkSession.createDataFrame(
            [], "d1 long, d2 long, score double"
        )
    ids_all = pdf_all["_id"].to_numpy()
    M = np.stack(pdf_all["_v"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast((ids_all, M))

    def _norms(X):
        acc = X[:, 0] * X[:, 0]
        for j in range(1, X.shape[1]):
            acc = acc + X[:, j] * X[:, j]
        return np.sqrt(acc)

    def score_blocks(batches):
        ids_b, Mb = bc.value
        nb = _norms(Mb)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            aids = pdf["_id"].to_numpy()
            acc = A[:, [0]] * Mb[:, 0][None, :]
            for j in range(1, A.shape[1]):
                acc = acc + A[:, [j]] * Mb[:, j][None, :]
            # clamp like DuckDB's list_cosine_similarity: FP rounding can
            # push a (near-)parallel pair epsilon past ±1
            scores = np.clip(acc / (_norms(A)[:, None] * nb[None, :]), -1.0, 1.0)
            keep = (scores >= threshold) & (aids[:, None] < ids_b[None, :])
            ii, kk = np.nonzero(keep)
            yield pd.DataFrame(
                {"d1": aids[ii], "d2": ids_b[kk], "score": scores[ii, kk]}
            )

    return base.mapInPandas(score_blocks, "d1 long, d2 long, score double")


def quantize_embeddings(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """Per-vector scalar quantization to ``levels+1`` integer codes —
    the standard 4× memory cut before ANN indexing (float32 → uint8).

    Each vector maps through its own [min, max] range:
    ``q_j = floor((v_j - vmin) * levels / (vmax - vmin) + 0.5)`` —
    half-up rounding spelled as ``floor(x + 0.5)`` so every engine
    rounds identically (a bare ``round`` would pit half-even against
    half-up). A constant vector (vmax == vmin) codes to all zeros.
    Emits the codes plus the (vmin, vmax) pair needed to dequantize:
    ``v_j ≈ vmin + q_j * (vmax - vmin) / levels``.

    Pure Catalyst map over the scan (array_min/array_max/transform run
    in codegen) — no shuffle, no Python; at 100 TB this is
    scan-bandwidth-bound and composes with the LSH/IVF bucketing stages.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    v = F.col(vec_col)
    vmin = F.array_min(v).cast("double")
    vmax = F.array_max(v).cast("double")
    # op order (sub, mul, div, add, floor) is part of the contract: the
    # oracle mirrors it token for token so codes are bit-identical
    codes = F.when(vmax == vmin, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(
                (x.cast("double") - vmin) * F.lit(float(levels)) / (vmax - vmin)
                + F.lit(0.5)
            ).cast("int"),
        )
    )
    return vectors.select(
        F.col(id_col),
        vmin.alias("vmin"),
        vmax.alias("vmax"),
        codes.alias("codes"),
    )


def _plane_signs(plane: int, dims: int) -> list[int]:
    """Deterministic Rademacher hyperplane: component j is +1/-1 by the
    low bit of md5(f"{plane}:{j}") — reproducible everywhere, no RNG."""
    signs = []
    for j in range(dims):
        h = hashlib.md5(f"{plane}:{j}".encode()).hexdigest()
        signs.append(1 if int(h[-1], 16) & 1 else -1)
    return signs


def lsh_buckets(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Sign-LSH bucket id per vector: bit p = (v · plane_p) > 0.

    Arrow-batched: the plane dots accumulate dim-sequentially (±v_j terms
    in index order — exact same doubles as a sequential fold in any
    engine). An unrolled JVM expression would be planes×dims terms, past
    the JIT method limit, and costs seconds of codegen compilation alone.
    Bucketing is a map; the later candidate join shuffles on bucket —
    never all-pairs.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    from pyspark.sql.functions import pandas_udf

    S = np.array(
        [[float(s) for s in _plane_signs(p, dims)] for p in range(planes)]
    )

    @pandas_udf("long")
    def bucket_of(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        b = np.zeros(len(V), dtype=np.int64)
        for p in range(planes):
            acc = V[:, 0] * S[p, 0]
            for j in range(1, dims):
                acc = acc + V[:, j] * S[p, j]
            b = b + (acc > 0).astype(np.int64) * (1 << p)
        return pd.Series(b)

    return vectors.select(F.col(id_col), bucket_of(F.col(vec_col)).alias("bucket"))


def _make_pair_cosine():
    """Vectorized Arrow pair scorer: Spark's zip_with/aggregate fold is
    CodegenFallback (~16 µs/pair interpreted — the dominant cost at
    100k+ candidate pairs); this kernel accumulates dim-sequentially so
    each score is bit-identical to the fold AND to DuckDB's
    list_cosine_similarity, with the same ±1 clamp."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_cosine(v1: pd.Series, v2: pd.Series) -> pd.Series:
        A = np.stack(v1.to_numpy()).astype(np.float64)
        B = np.stack(v2.to_numpy()).astype(np.float64)
        dot_ = A[:, 0] * B[:, 0]
        na = A[:, 0] * A[:, 0]
        nb = B[:, 0] * B[:, 0]
        for j in range(1, A.shape[1]):
            dot_ = dot_ + A[:, j] * B[:, j]
            na = na + A[:, j] * A[:, j]
            nb = nb + B[:, j] * B[:, j]
        return pd.Series(np.clip(dot_ / (np.sqrt(na) * np.sqrt(nb)), -1.0, 1.0))

    return pair_cosine


_PAIR_COSINE_UDF = None


def _pair_cosine(v1: Column, v2: Column) -> Column:
    # lazy: pandas_udf type resolution needs an active SparkSession, so
    # the UDF object can't be built at import time
    global _PAIR_COSINE_UDF
    if _PAIR_COSINE_UDF is None:
        _PAIR_COSINE_UDF = _make_pair_cosine()
    return _PAIR_COSINE_UDF(v1, v2)


def banded_lsh_buckets(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    rows_per_band: int = 4,
    dims: int = 64,
) -> DataFrame:
    """Multi-band sign-LSH: one row per (vector, band) with the band's
    bucket id — bit j of band b's bucket is sign(v · plane_{b*r+j}).

    A single sign-LSH signature (``lsh_buckets``) requires agreement on
    every plane, which misses near-dup pairs that straddle one
    hyperplane; banding (the minhash-LSH trick, ``dedup.py``) ORs
    ``bands`` independent r-plane signatures, trading candidate volume
    for recall. All bands×rows plane projections compute in ONE
    Arrow-batched pass over the corpus (dim-sequential accumulation →
    bit-identical to a sequential fold in any engine); the output is a
    map-side explode, bands rows per vector, ready for a bucket
    equi-join.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    from pyspark.sql.functions import pandas_udf

    n_planes = bands * rows_per_band
    # S_T[d, p] = sign of plane p at dim d — dim-major for the loop below
    S_T = np.array(
        [[float(s) for s in _plane_signs(p, dims)] for p in range(n_planes)]
    ).T.copy()

    @pandas_udf("array<long>")
    def band_buckets_of(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        # all plane dots at once, accumulated dim-sequentially (d=0..D-1)
        # so every single dot is bit-identical to a sequential fold —
        # engine parity without bands*rows separate per-plane loops
        acc = V[:, 0:1] * S_T[0:1, :]
        for d in range(1, dims):
            acc = acc + V[:, d : d + 1] * S_T[d : d + 1, :]
        bits = (acc > 0).astype(np.int64)
        weights = np.array([1 << j for j in range(rows_per_band)], dtype=np.int64)
        out = (bits.reshape(len(V), bands, rows_per_band) * weights).sum(axis=2)
        return pd.Series(list(out))

    return vectors.select(
        F.col(id_col), F.posexplode(band_buckets_of(F.col(vec_col)))
    ).select(F.col(id_col), F.col("pos").alias("band"), F.col("col").alias("bucket"))


def lsh_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    bands: int = 8,
    rows_per_band: int = 4,
    dims: int = 64,
    stage_path: str | None = None,
) -> DataFrame:
    """Near-dup pairs (d1 < d2, cosine >= threshold) via banded sign-LSH
    candidates + exact verification — the 100 TB replacement for
    :func:`embedding_near_dup_pairs`'s broadcast-the-corpus design.

    Mirrors ``minhash_lsh_pairs`` (``dedup.py``): bucket equi-join on
    (band, bucket) for candidates — cost ∝ bucket collision counts, never
    all-pairs and never a driver collect — then exact cosine on the
    candidate pairs only, with the corpus semi-filtered to candidate ids
    BEFORE the fetch joins so corpus-scale vectors never shuffle.
    Approximate by construction (a pair agreeing on no band is missed;
    P[detect] = 1-(1-p^r)^b, p = 1-θ/π), but deterministic: the
    Rademacher planes are md5-derived, so an external engine reproduces
    the exact candidate set and scores.

    The banded table feeds both self-join sides. ``stage_path=None``
    (default, dev/driver scale) memory-caches it for the duration of the
    call and unpersists before returning — nothing leaks across repeated
    invocations in a long-lived session. At 100 TB pass ``stage_path``:
    the banded table is written to parquet once and both join sides scan
    the staged files, so executor storage memory holds nothing and the
    Arrow projection still runs exactly once.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    banded = banded_lsh_buckets(vectors, id_col, vec_col, bands, rows_per_band, dims)
    if stage_path is not None:
        banded.write.mode("overwrite").parquet(stage_path)
        banded = vectors.sparkSession.read.parquet(stage_path)
    else:
        banded = banded.persist()
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        )
        .distinct()
    )
    if stage_path is None:
        # cands feeds both the id semi-filter and the final pair join;
        # materialize it eagerly (id pairs only — KB-scale) via a
        # lineage-truncating local checkpoint, then drop the banded cache
        # so repeated invocations don't accumulate storage (ADVICE r3).
        cands = cands.localCheckpoint(eager=True)
        banded.unpersist()
    cand_ids = (
        cands.select(F.col("d1").alias(id_col))
        .union(cands.select(F.col("d2").alias(id_col)))
        .distinct()
    )
    # semi-filter the corpus to candidate ids; no broadcast hint — the
    # candidate-id set scales with corpus dup density (entity-sized in
    # the worst case), so forcing it through the driver is exactly the
    # melt-the-driver failure interval_join's default avoids. AQE
    # broadcasts it at runtime when it measures small.
    e = vectors.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), F.col(vec_col).alias("_v")
    )
    e1 = e.select(F.col(id_col).alias("d1"), F.col("_v").alias("v1"))
    e2 = e.select(F.col(id_col).alias("d2"), F.col("_v").alias("v2"))
    # NaN guard: a zero-norm vector collides into bucket 0 of every band
    # and scores 0/0 = NaN against its bucket-mates; Spark SQL orders NaN
    # ABOVE every number, so `score >= threshold` alone would emit the
    # pair (numpy in the brute-force baseline correctly drops it).
    return (
        cands.join(e1, "d1")
        .join(e2, "d2")
        .select("d1", "d2", _pair_cosine(F.col("v1"), F.col("v2")).alias("score"))
        .where(~F.isnan("score") & (F.col("score") >= threshold))
    )


def _pykey(v):
    """Plain-Python dict key for a numpy scalar (or pass through)."""
    return v.item() if hasattr(v, "item") else v


def _cent_frame(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    cids=None,
    C=None,
    trained: bool = False,
) -> DataFrame:
    """Centroid table for probe ranking, shared by knn_ivf and
    knn_ivf_pq (ONE place for any future parity tweak). Trained
    centroids are computed values — shipped as a local relation
    (n_centroids rows, broadcast); seed centroids ARE corpus rows, so
    the table stays a lazy JVM-side limit over the scan — measurably
    cheaper than round-tripping the matrix through a Python local
    relation."""
    if trained:
        id_type = vectors.schema[id_col].dataType.simpleString()
        return vectors.sparkSession.createDataFrame(
            [(_pykey(c), [float(x) for x in C[i]]) for i, c in enumerate(cids)],
            f"centroid {id_type}, c_vec array<double>",
        )
    return (
        vectors.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid"), F.col(vec_col).alias("c_vec"))
    )


def _guard_query_rows(queries: DataFrame, id_col: str, max_query_rows: int, fn: str):
    """Fail-fast for the kNN family's query-side broadcasts/collects.

    Every ``knn_*`` operator broadcasts (or driver-collects) the QUERY
    relation — correct by contract (query sets are top-k-request-sized),
    but aiming a corpus at the ``queries`` parameter would OOM the driver
    instead of raising. Same probe as ``embedding_near_dup_pairs``'s
    ``max_broadcast_rows`` guard: a LIMIT-bounded count that scans at most
    ``max_query_rows + 1`` ids before any collect happens.
    """
    n = queries.select(id_col).limit(max_query_rows + 1).count()
    if n > max_query_rows:
        raise ValueError(
            f"{fn}: queries relation exceeds max_query_rows={max_query_rows}. "
            f"The query side is broadcast/collected driver-side by design; "
            f"the corpus belongs in the `vectors` parameter (which stays "
            f"partitioned at any scale). Swap the arguments, or raise "
            f"max_query_rows explicitly if you really mean it."
        )


def _collect_guarded_queries(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    max_query_rows: int,
    fn: str,
) -> pd.DataFrame:
    """Guard + collect the query relation in ONE Spark job (r15, guide
    §1.2 — the ANN family's cost at small SF is driver-job count, not
    data): ``limit(max_query_rows + 1).toPandas()`` subsumes the
    LIMIT-bounded guard count that used to be a separate action. When
    the relation is within the bound, the limit returns EVERY row, and
    the ascending-id driver-side sort reproduces the former
    ``orderBy(id).toPandas()`` exactly (ids are non-null here —
    ``_well_formed`` runs first — so there is no null-ordering
    divergence). Raises the same guard error on oversized inputs.
    Callers that share one query set across several ``knn_*`` calls
    pass the result via the private ``_qpdf=`` parameter so the collect
    happens once."""
    qpdf = (
        queries.select(F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
        .limit(max_query_rows + 1)
        .toPandas()
    )
    if len(qpdf) > max_query_rows:
        raise ValueError(
            f"{fn}: queries relation exceeds max_query_rows={max_query_rows}. "
            f"The query side is broadcast/collected driver-side by design; "
            f"the corpus belongs in the `vectors` parameter (which stays "
            f"partitioned at any scale). Swap the arguments, or raise "
            f"max_query_rows explicitly if you really mean it."
        )
    return qpdf.sort_values("_qid", kind="stable", ignore_index=True)


def _seed_centroids(
    vectors: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) of the ``n_centroids`` lowest-id vectors — the
    deterministic, RNG-free seed sample. ids come back sorted ascending
    (the argmax tie-break below relies on it)."""
    cent = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(n_centroids)
        .toPandas()
    )
    if cent.empty:
        # r13 empty-fixture hunt: an empty corpus used to surface as an
        # opaque numpy "need at least one array to stack" fifteen frames
        # deep. An index cannot be seeded from nothing — fail loudly and
        # name the fix (the pack_sequences budget=0 hazard convention).
        raise ValueError(
            "similarity: empty corpus — cannot seed centroids/codebook; "
            "guard empty-corpus runs upstream (an upstream filter "
            "removed every vector)"
        )
    return cent["_id"].to_numpy(), np.stack(cent["_v"].to_numpy()).astype(np.float64)


def _seed_heads(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_coarse: int,
    n_codes: int,
) -> tuple[tuple[np.ndarray, np.ndarray], np.ndarray]:
    """Coarse seeds AND the PQ seed codebook from ONE ordered head scan
    (r15, guide §1.2): both are prefixes of the same lowest-id ordering,
    so ``limit(max(n_coarse, n_codes))`` + driver-side prefix slices is
    row- and bit-identical to two separate :func:`_seed_centroids`
    calls, at half the Spark jobs. Returns ``((cids, CC), C)``."""
    head = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(max(n_coarse, n_codes))
        .toPandas()
    )
    if head.empty:
        # same message/contract as _seed_centroids (r13 empty hunt)
        raise ValueError(
            "similarity: empty corpus — cannot seed centroids/codebook; "
            "guard empty-corpus runs upstream (an upstream filter "
            "removed every vector)"
        )
    ids = head["_id"].to_numpy()
    M = np.stack(head["_v"].to_numpy()).astype(np.float64)
    return (ids[:n_coarse], M[:n_coarse]), M[:n_codes]


def _probe_plan(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cent: DataFrame,
    n_probe: int,
) -> DataFrame:
    """The coarse probe-ranking plan shared by :func:`knn_ivf_pq`'s
    lazy (non-residual) and collected (residual) paths — verbatim the
    same JVM cosine + tie-broken window as :func:`knn_ivf`, extracted
    so both paths build one plan shape."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_score").desc(), F.col("centroid")
    )
    return (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "centroid",
            cosine(F.col("q_vec"), F.col("c_vec"), None).alias("c_score"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "centroid")
    )


def _residual_of(S: np.ndarray, cids: np.ndarray, CC: np.ndarray) -> np.ndarray:
    """Residuals ``x − centroid(x)`` of the rows of ``S`` against the
    coarse centroids ``CC`` — the SAME numpy ops (dim-sequential dot,
    clip, first-index argmax over ascending cids) as the
    :func:`_assign_to` / :func:`ivfpq_index` kernels, so the cell choice
    (and hence the residual) is bit-identical to what the index pass
    computes for the same vectors. Driver-side, seed-sized inputs."""

    def norms(X):
        acc = X[:, 0] * X[:, 0]
        for j in range(1, X.shape[1]):
            acc = acc + X[:, j] * X[:, j]
        return np.sqrt(acc)

    nc = norms(CC)
    acc = S[:, [0]] * CC[:, 0][None, :]
    for j in range(1, S.shape[1]):
        acc = acc + S[:, [j]] * CC[:, j][None, :]
    scores = np.clip(acc / (norms(S)[:, None] * nc[None, :]), -1.0, 1.0)
    return S - CC[scores.argmax(axis=1)]


def _assign_to(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cids: np.ndarray,
    C: np.ndarray,
    with_vector: bool = False,
) -> DataFrame:
    """One Arrow-batched assignment pass: nearest centroid by cosine,
    lowest-id tie-break (``cids`` sorted ascending + first-index argmax).
    The centroid matrix is broadcast; at 100 TB this is scan-speed.
    ``with_vector=True`` carries the embedding through the map (column
    ``_v``) so consumers that need (assignment, vector) — the Lloyd mean
    step — avoid re-joining the corpus on id, which would be a full
    corpus shuffle per iteration.

    Output schema: (``id_col``, centroid, score[, _v]) — the id field
    keeps the input column's name and type, and ``centroid`` shares that
    type (centroid ids are drawn from the id domain)."""
    spark = vectors.sparkSession
    bc = spark.sparkContext.broadcast((cids, C))

    def assign(batches):
        cids_b, Cb = bc.value

        def norms(X):
            acc = X[:, 0] * X[:, 0]
            for j in range(1, X.shape[1]):
                acc = acc + X[:, j] * X[:, j]
            return np.sqrt(acc)

        nc = norms(Cb)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            acc = A[:, [0]] * Cb[:, 0][None, :]
            for j in range(1, A.shape[1]):
                acc = acc + A[:, [j]] * Cb[:, j][None, :]
            # clamp like DuckDB's list_cosine_similarity (self-pairs can
            # round epsilon past 1.0)
            scores = np.clip(acc / (norms(A)[:, None] * nc[None, :]), -1.0, 1.0)
            # argmax with lowest-id tie-break: ids are sorted ascending,
            # argmax returns the first (lowest) index on ties
            best = scores.argmax(axis=1)
            out = {
                id_col: pdf["_id"].to_numpy(),
                "centroid": cids_b[best],
                "score": scores[np.arange(len(best)), best],
            }
            if with_vector:
                out["_v"] = pdf["_v"]
            yield pd.DataFrame(out)

    base = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    id_type = vectors.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, centroid {id_type}, score double"
    if with_vector:
        elem = vectors.schema[vec_col].dataType.elementType.simpleString()
        schema += f", _v array<{elem}>"
    return base.mapInPandas(assign, schema)


def ivf_refine_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd (k-means) refinement of the seed centroids: ``n_iters``
    rounds of assign → per-cluster mean, keeping the seed vec_ids as
    stable cluster labels. Returns the refined (ids, matrix).

    Fully deterministic and ORACLE-REPRODUCIBLE: assignment tie-breaks on
    the lowest centroid id, and each cluster mean is computed per
    dimension as a **sequential left fold in ascending member vec_id
    order** (``sort_array(collect_list(...))`` + ``aggregate``) — the
    exact accumulation order of DuckDB's ``list_sum(list(x ORDER BY
    vec_id))``, so both engines produce bit-identical centroids. A
    cluster that loses all members keeps its previous centroid.

    Plan shape per iteration: one scan-speed assignment map + one
    shuffle on (centroid, dim) + a 16-row collect. The ordered-fold mean
    materializes each (cluster, dim) member list in one task — at
    extreme member counts swap the fold for a plain ``sum`` (semantically
    identical, gives up bit-reproducibility across engines).
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    cids, C = _seed_centroids(vectors, id_col, vec_col, n_centroids)
    for _ in range(n_iters):
        # with_vector: the assignment map carries the embedding through,
        # so the mean step needs NO corpus re-join (which would shuffle
        # the full corpus on id every iteration at 100 TB)
        joined = _assign_to(vectors, id_col, vec_col, cids, C, with_vector=True).select(
            F.col("centroid"),
            F.col(id_col).alias("_vid"),
            F.posexplode(F.col("_v")).alias("dim", "val"),
        )
        means = joined.groupBy("centroid", "dim").agg(
            (
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_vid", "val"))),
                        lambda s: s["val"].cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count("*")
            ).alias("m")
        )
        rows = (
            means.groupBy("centroid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        new_by_cid = {r["centroid"]: np.asarray(r["cv"], dtype=np.float64) for r in rows}
        C = np.stack(
            [new_by_cid.get(_pykey(c), C[i]) for i, c in enumerate(cids)]
        )
    return cids, C


def ivf_assign(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest
    centroid by cosine (ties → lowest centroid id).

    Centroids are the ``n_centroids`` lowest-id vectors — a deterministic
    seed sample, reproducible in any engine with no trained model or RNG.
    ``refine_iters > 0`` runs that many Lloyd iterations first
    (:func:`ivf_refine_centroids`), still deterministic and
    oracle-reproducible. Assignment is one Arrow-batched map over the
    corpus with the centroid matrix broadcast — at 100 TB this is
    scan-speed, and the resulting ``centroid`` column is the
    partition/cluster key that makes probed search touch 1/C of the data.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    if refine_iters > 0:
        cids, C = ivf_refine_centroids(
            vectors, id_col, vec_col, n_centroids, refine_iters
        )
    else:
        cids, C = _seed_centroids(vectors, id_col, vec_col, n_centroids)
    return _assign_to(vectors, id_col, vec_col, cids, C)


def ivf_cluster_quality(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    refine_iters: int = 0,
) -> DataFrame:
    """Per-cell quality report for an IVF index: member count, worst
    (min) and mean cosine-to-centroid — the balance/tightness numbers
    that decide whether an index needs more centroids or a Lloyd refine
    before serving (a fat low-mean cell degrades every probe that hits
    it).

    Determinism: assignment scores are the oracle-verified Arrow pass;
    the mean folds them in ascending member id order (the one rounding
    freedom in a double sum) over the single centroid-keyed shuffle, so
    the report is reproducible cross-engine. Aggregate state is
    cell-count-sized.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    assign = ivf_assign(vectors, id_col, vec_col, n_centroids, refine_iters)
    folded = assign.groupBy("centroid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("score").alias("min_score"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(id_col, "score"))),
            F.lit(0.0),
            lambda acc, x: acc + x["score"],
        ).alias("_sum"),
    )
    return folded.select(
        "centroid",
        "n_members",
        "min_score",
        (F.col("_sum") / F.col("n_members")).alias("mean_score"),
    )


def knn_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    dims: int | None = None,
    refine_iters: int = 0,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Approximate top-k: probe only the ``n_probe`` clusters whose
    centroids are nearest each query, then exact-score the members.

    The scale path: assignment is a map, the probe table is tiny
    (|queries| × n_probe), and member scoring is an equi-join on
    ``centroid`` — cost ≈ n_probe/C of brute force, recall < 1 by
    construction. Deterministic end-to-end (seed or Lloyd-refined
    centroids, lowest-id tie-breaks), so a SQL oracle reproduces it
    exactly. ``refine_iters > 0`` runs that many k-means iterations
    (:func:`ivf_refine_centroids`) before clustering — tighter clusters
    raise recall at the same probe budget.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    queries = _well_formed(queries, id_col, vec_col)
    from pyspark.sql import Window

    _guard_query_rows(queries, id_col, max_query_rows, "knn_ivf")
    if refine_iters > 0:
        cids, C = ivf_refine_centroids(
            vectors, id_col, vec_col, n_centroids, refine_iters
        )
    else:
        cids, C = _seed_centroids(vectors, id_col, vec_col, n_centroids)
    # with_vector: the assignment map carries the embedding through, so
    # the member table needs NO corpus self-join on id (which would
    # shuffle the full corpus before the probe filter ever runs);
    # original element type is preserved, so scores are bit-identical
    members = _assign_to(vectors, id_col, vec_col, cids, C, with_vector=True).select(
        F.col(id_col).alias("neighbor_id"), "centroid", F.col("_v").alias("v_vec")
    )

    cent = _cent_frame(
        vectors, id_col, vec_col, n_centroids, cids, C,
        trained=refine_iters > 0,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_score").desc(), F.col("centroid")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "centroid",
            cosine(F.col("q_vec"), F.col("c_vec"), dims).alias("c_score"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "centroid")
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        probes.join(members, "centroid")
        .join(F.broadcast(q), "query_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("v_vec"), dims).alias("score"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def knn_ivf_sweep(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    probes: tuple[int, ...] = (1, 2, 4),
    dims: int | None = None,
    refine_iters: int = 0,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Probe-budget sweep: for each ``n_probe`` in ``probes``, exactly
    :func:`knn_ivf`'s top-k result, tagged with an ``n_probe`` column —
    the input to a recall-vs-cost tuning curve.

    Computed in ONE pass: because a smaller probe budget's candidate set
    is a prefix of the probe ranking, the corpus is assigned once, the
    largest budget's candidates are scored once, and each row fans out
    (map-side ``explode``) to every arm whose budget covers its probe
    rank — then a single (n_probe, query) window takes top-k per arm. No
    per-arm corpus re-scan, no cache: sweeping 3 budgets costs one
    :func:`knn_ivf` plus a candidate-sized explode.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    queries = _well_formed(queries, id_col, vec_col)
    from pyspark.sql import Window

    if not probes:
        raise ValueError("knn_ivf_sweep: probes must be non-empty")
    _guard_query_rows(queries, id_col, max_query_rows, "knn_ivf_sweep")
    probes = tuple(sorted(set(int(p) for p in probes)))
    max_p = probes[-1]
    if refine_iters > 0:
        cids, C = ivf_refine_centroids(
            vectors, id_col, vec_col, n_centroids, refine_iters
        )
    else:
        cids, C = _seed_centroids(vectors, id_col, vec_col, n_centroids)
    # with_vector: the assignment map carries the embedding through, so
    # the member table needs NO corpus self-join on id (which would
    # shuffle the full corpus before the probe filter ever runs);
    # original element type is preserved, so scores are bit-identical
    members = _assign_to(vectors, id_col, vec_col, cids, C, with_vector=True).select(
        F.col(id_col).alias("neighbor_id"), "centroid", F.col("_v").alias("v_vec")
    )
    if refine_iters > 0:
        id_type = vectors.schema[id_col].dataType.simpleString()
        cent = vectors.sparkSession.createDataFrame(
            [(_pykey(c), [float(x) for x in C[i]]) for i, c in enumerate(cids)],
            f"centroid {id_type}, c_vec array<double>",
        )
    else:
        cent = (
            vectors.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col(id_col).alias("centroid"), F.col(vec_col).alias("c_vec"))
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_score").desc(), F.col("centroid")
    )
    probe_tbl = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "centroid",
            cosine(F.col("q_vec"), F.col("c_vec"), dims).alias("c_score"),
        )
        .withColumn("probe_rank", F.row_number().over(probe_w))
        .where(F.col("probe_rank") <= max_p)
        .select("query_id", "centroid", "probe_rank")
    )
    scored = (
        probe_tbl.join(members, "centroid")
        .join(F.broadcast(q), "query_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "probe_rank",
            cosine(F.col("q_vec"), F.col("v_vec"), dims).alias("score"),
        )
    )
    arms = F.array(*[F.lit(p) for p in probes])
    fanned = scored.select(
        "query_id",
        "neighbor_id",
        "score",
        F.explode(arms).alias("n_probe"),
        "probe_rank",
    ).where(F.col("probe_rank") <= F.col("n_probe"))
    w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        fanned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("n_probe", "query_id", "neighbor_id", "score")
    )


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    dims: int = 64,
    max_query_rows: int = 100_000,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Recall < 1 by construction; this is the plan shape for 100 TB
    (bucket equi-join instead of crossJoin).

    ``multi_probe=True`` (Lv et al., VLDB 2007): each query ALSO probes
    every bucket at Hamming distance 1 (one hyperplane sign flipped) —
    the standard recall lift at a fixed hash budget, because a near
    neighbor lost to one marginal hyperplane lands exactly one bit away.
    Candidates grow ≤ ×(1+planes) but remain bucket-bounded; the corpus
    side is untouched (each corpus vector still sits in ONE bucket, so
    no (query, neighbor) pair is scored twice). Multi-probe recall is a
    SUPERSET guarantee: the candidate set contains the single-probe
    candidates, so recall@k can only improve or tie (test-pinned)."""
    vectors = _well_formed(vectors, id_col, vec_col)
    queries = _well_formed(queries, id_col, vec_col)
    from pyspark.sql import Window

    _guard_query_rows(queries, id_col, max_query_rows, "knn_lsh")
    vb = lsh_buckets(vectors, id_col, vec_col, planes, dims)
    v = vectors.join(vb, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_vec"),
        F.col("bucket"),
    )
    qb = lsh_buckets(queries, id_col, vec_col, planes, dims)
    if multi_probe:
        probe_set = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(planes)
            ],
        )
        qb = qb.select(
            id_col, F.explode(probe_set).alias("bucket")
        )
    q = queries.join(qb, id_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col("bucket")
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # dims=None: bucket collisions are |queries|·N/2^planes pairs
            # (hundreds), where the interpreted fold is free and the
            # unrolled 192-term alternative costs seconds of codegen
            # compilation per plan (see module docstring)
            cosine(F.col("q_vec"), F.col("v_vec"), None).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    threshold: float = 0.45,
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style cluster-then-dedup (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the corpus, then drop semantic
    near-duplicates *within* each cluster — the standard way to make
    embedding dedup tractable when all-pairs (even LSH-bucketed) is too
    hot, because pairs are only scored inside a cluster (~N²/C of the
    all-pairs work, like the paper's k-means pre-partitioning).

    Keep rule (deterministic analog of the paper's random-keeper): a
    vector is dropped iff some LOWER-ID vector in the same cluster has
    cosine ≥ ``threshold`` — matching the released SemDeDup
    implementation, which drops by index order per qualifying pair
    rather than per transitive component (a chain a~b~c with a≁c keeps
    only ``a``; use ``lsh_near_dup_pairs`` + connected components when
    component-exact grouping matters).

    Returns one row per input vector: (``id_col``, ``centroid``,
    ``is_kept``) — the id column keeps its input name and type.

    Plan shape: one Arrow assignment pass over the scan (centroid matrix
    broadcast, ``with_vector=True`` so the corpus is never re-joined on
    id), then a self-join ON centroid — the ONLY shuffle, partitioned by
    cluster. At 100 TB ``n_centroids`` is the skew knob: size it so each
    cluster's pair block fits an executor (the paper uses ~10⁵ clusters
    at web scale); a hot cluster is visible in the assignment histogram
    (``groupBy(centroid).count()``) before the join runs.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    if refine_iters > 0:
        cids, C = ivf_refine_centroids(
            vectors, id_col, vec_col, n_centroids, refine_iters
        )
    else:
        cids, C = _seed_centroids(vectors, id_col, vec_col, n_centroids)
    assigned = _assign_to(vectors, id_col, vec_col, cids, C, with_vector=True)
    a = assigned.select(
        F.col(id_col).alias("d1"), "centroid", F.col("_v").alias("v1")
    )
    b = assigned.select(
        F.col(id_col).alias("d2"), "centroid", F.col("_v").alias("v2")
    )
    dropped = (
        a.join(b, "centroid")
        .where(F.col("d1") < F.col("d2"))
        .select("d2", _pair_cosine(F.col("v1"), F.col("v2")).alias("s"))
        # NaN guard as in lsh_near_dup_pairs: zero-norm pairs score 0/0
        .where(~F.isnan("s") & (F.col("s") >= threshold))
        .select(F.col("d2").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.select(id_col, "centroid")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "centroid",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("is_kept"),
        )
    )


def knn_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
) -> DataFrame:
    """Recall@k of an approximate kNN result against exact ground truth.

    Both inputs use the ``knn_*`` output contract (query_id, neighbor_id,
    score). Output: one row per ground-truth query with the hit count and
    ``recall_at_k = n_hits / k`` — the standard ANN evaluation report
    (every ANN deployment tunes bands/probes against exactly this number).

    Plan shape: both inputs are top-k results, i.e. |Q|·k rows — tiny
    relative to the corpus that produced them — so the pair-key equi-join
    and the two hash aggregates are negligible; at 100 TB the cost lives
    in producing the inputs, not comparing them. Queries the approximate
    index missed entirely still appear (left join from the ground-truth
    query set, zero-filled).
    """
    hits = (
        approx.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    truth_queries = exact.select("query_id").distinct()
    n = F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
    return truth_queries.join(hits, "query_id", "left").select(
        "query_id",
        n.alias("n_hits"),
        (n.cast("double") / F.lit(float(k))).alias("recall_at_k"),
    )


def pq_encode(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    refine_iters: int = 0,
) -> DataFrame:
    """Product quantization (Jégou et al., TPAMI 2011): split each
    vector into ``m`` subspaces and store, per subspace, the index of
    the nearest codebook entry — ``m·log2(k)`` bits per vector, the
    memory path ANN takes when even int8 scalar codes
    (:func:`quantize_embeddings`) are too large. Returns
    ``(id, codes array<int>, pq_error)`` where ``pq_error`` is the total
    squared quantization error (the table-lookup distance PQ search
    approximates with).

    Codebooks are deterministic: the sub-vectors of the ``k`` lowest-id
    vectors (the :func:`ivf_assign` seed convention — no RNG, no trained
    model, any engine re-derives them). Distances accumulate
    DIM-SEQUENTIALLY in ascending dimension order and subspace errors in
    ascending subspace order, so every distance, argmin comparison and
    the final error are bit-identical to an ordered SQL fold — the same
    determinism contract as the cosine kernels. Ties → lowest code
    index (argmin returns the first index).

    ``refine_iters > 0`` runs that many per-subspace Lloyd iterations
    (:func:`pq_refine_codebooks`) first — trained codebooks, lower
    quantization error at the same bit budget.

    Plan shape: one Arrow-batched map with the (k × D) codebook
    broadcast — scan-speed at any corpus size; no shuffle.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    spark = vectors.sparkSession
    if refine_iters > 0:
        C = pq_refine_codebooks(vectors, id_col, vec_col, m, k, refine_iters)
    else:
        _ids, C = _seed_centroids(vectors, id_col, vec_col, k)
    D = C.shape[1]
    if D % m != 0:
        raise ValueError(f"dimension {D} not divisible by m={m}")
    sub = D // m
    bc = spark.sparkContext.broadcast(C)

    def enc(batches):
        Cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            codes = np.empty((len(A), m), dtype=np.int32)
            err = None
            for s in range(m):
                lo = s * sub
                # sequential-dim accumulation (bit-identical to an
                # ordered fold; never np.sum, which pairwise-reduces)
                diff = A[:, [lo]] - Cb[:, lo][None, :]
                acc = diff * diff
                for i in range(lo + 1, lo + sub):
                    diff = A[:, [i]] - Cb[:, i][None, :]
                    acc = acc + diff * diff
                codes[:, s] = acc.argmin(axis=1)
                best = acc[np.arange(len(A)), codes[:, s]]
                err = best if err is None else err + best
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"],
                    "codes": list(codes),
                    "pq_error": err,
                }
            )

    base = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    id_type = vectors.schema[id_col].dataType.simpleString()
    return base.mapInPandas(
        enc, f"_id {id_type}, codes array<int>, pq_error double"
    ).withColumnRenamed("_id", id_col)


def knn_pq(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    n_codes: int = 8,
    max_query_rows: int = 100_000,
    refine_iters: int = 0,
    _seed_cb: np.ndarray | None = None,
    _qpdf: pd.DataFrame | None = None,
) -> DataFrame:
    """Approximate kNN by asymmetric distance computation (ADC) over PQ
    codes — the search side of :func:`pq_encode`: each query precomputes
    an (m × n_codes) table of exact sub-distances to the codebook, and a
    corpus vector's approximate distance is the sum of m table lookups —
    the corpus is scanned as CODES (m small ints per vector), never as
    floats. Returns ``(query_id, neighbor_id, approx_d2)`` top-k rows
    per query (self-matches excluded; ties → lowest neighbor id).

    ``_seed_cb`` / ``_qpdf`` (private, r15 §1.2 job-count reduction —
    the ``_shingles=`` convention): a pre-collected seed codebook /
    guarded query pandas frame (from :func:`_collect_guarded_queries`
    on the SAME relation), letting a multi-arm caller (emb_pq_recall)
    pay each driver job once instead of once per arm. Results are
    bit-identical by construction; these never cache across queries or
    runs — the caller holds them for one invocation only.

    Determinism: tables use the same sequential-dim accumulation as the
    encoder, the m lookups add in ascending subspace order, and top-k
    ordering ties break on id — the whole search is bit-reproducible by
    an ordered SQL replay. Plan shape: one Arrow pass encodes+scores the
    corpus with (codebook + tables) broadcast; one query-keyed shuffle
    for top-k. At 100 TB the scan cost is the CODE columns, the float
    corpus is never re-read once codes are staged.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    queries = _well_formed(queries, id_col, vec_col)
    from pyspark.sql import Window

    spark = vectors.sparkSession
    if refine_iters > 0:
        C = pq_refine_codebooks(
            vectors, id_col, vec_col, m, n_codes, refine_iters,
            seeds=_seed_cb,
        )
    elif _seed_cb is not None:
        C = _seed_cb.astype(np.float64)
    else:
        _ids, C = _seed_centroids(vectors, id_col, vec_col, n_codes)
    D = C.shape[1]
    if D % m != 0:
        raise ValueError(f"dimension {D} not divisible by m={m}")
    sub = D // m
    # one job: guard + query collect fused (r15 §1.2)
    qpdf = (
        _qpdf
        if _qpdf is not None
        else _collect_guarded_queries(
            queries, id_col, vec_col, max_query_rows, "knn_pq"
        )
    )
    if qpdf.empty:
        # no queries -> no neighbors (well-formed empty, r13 hunt).
        # query_id takes the QUERIES table's id type and neighbor_id the
        # vectors table's — the non-empty path emits exactly those, so a
        # downstream union that only ever hits this branch still aligns
        # (r13 ADVICE: mixed-id-type tables diverged here).
        _qt = queries.schema[id_col].dataType.simpleString()
        _nt = vectors.schema[id_col].dataType.simpleString()
        return vectors.sparkSession.createDataFrame(
            [], f"query_id {_qt}, neighbor_id {_nt}, approx_d2 double"
        )
    qids = qpdf["_qid"].to_numpy()
    Q = np.stack(qpdf["_qv"].to_numpy()).astype(np.float64)
    # per-query ADC tables, sequential-dim accumulation (encoder parity)
    T = np.empty((len(Q), m, C.shape[0]), dtype=np.float64)
    for s in range(m):
        lo = s * sub
        diff = Q[:, [lo]] - C[:, lo][None, :]
        acc = diff * diff
        for i in range(lo + 1, lo + sub):
            diff = Q[:, [i]] - C[:, i][None, :]
            acc = acc + diff * diff
        T[:, s, :] = acc
    bc = spark.sparkContext.broadcast((qids, T, C))

    def score(batches):
        qids_b, Tb, Cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            ids = pdf["_id"].to_numpy()
            codes = np.empty((len(A), m), dtype=np.int64)
            for s in range(m):
                lo = s * sub
                diff = A[:, [lo]] - Cb[:, lo][None, :]
                acc = diff * diff
                for i in range(lo + 1, lo + sub):
                    diff = A[:, [i]] - Cb[:, i][None, :]
                    acc = acc + diff * diff
                codes[:, s] = acc.argmin(axis=1)
            out_q, out_n, out_d = [], [], []
            for qi in range(len(qids_b)):
                d = Tb[qi, 0, codes[:, 0]]
                for s in range(1, m):
                    d = d + Tb[qi, s, codes[:, s]]
                out_q.append(np.full(len(ids), qids_b[qi]))
                out_n.append(ids)
                out_d.append(d)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "approx_d2": np.concatenate(out_d),
                }
            )

    base = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    id_type = vectors.schema[id_col].dataType.simpleString()
    # query_id values are QUERY-table ids — stamp them with that table's
    # type so mixed-id-type inputs keep both paths' schemas aligned
    q_id_type = queries.schema[id_col].dataType.simpleString()
    # self-exclusion: native compare when the id types match (keeps the
    # plan unchanged); string compare for mixed types, where an ANSI
    # numeric cast of a non-numeric query id would throw
    if q_id_type == id_type:
        _ne = F.col("neighbor_id") != F.col("query_id")
    else:
        _ne = F.col("neighbor_id").cast("string") != F.col("query_id").cast("string")
    scored = base.mapInPandas(
        score, f"query_id {q_id_type}, neighbor_id {id_type}, approx_d2 double"
    ).where(_ne)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def pq_refine_codebooks(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    n_iters: int = 2,
    seeds: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace Lloyd (k-means) refinement of the PQ seed codebooks —
    the training step Jégou et al. (TPAMI 2011, §III) run per subspace;
    seed-only codebooks cost real recall at scale. Returns the refined
    (k × D) codebook matrix, where each subspace's columns were refined
    independently (a code keeps its previous sub-centroid in any
    subspace where it loses all members).

    Fully deterministic and ORACLE-REPRODUCIBLE, by the same contract as
    :func:`ivf_refine_centroids`: assignment uses dim-sequential squared
    distances with lowest-code-index tie-breaks (exactly
    :func:`pq_encode`'s argmin), and each (code, dim) mean is a
    sequential left fold over member values in ascending member-id order
    — bit-matching DuckDB's ``list_sum(list(x ORDER BY vec_id))``.

    Plan shape per iteration: one scan-speed Arrow assignment map
    (codebook broadcast, vector carried through — no corpus re-join), one
    shuffle on (code, dim), and a k·D-row collect (tiny). Unlike coarse
    IVF training, PQ training at 100 TB typically runs on a SAMPLE; pass
    a sampled ``vectors`` relation for that — the refinement is
    per-subspace, so the sample just needs subspace coverage.
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    spark = vectors.sparkSession
    if seeds is not None:
        # caller-supplied seed matrix (e.g. residual-space seeds from
        # _residual_codebook — the default lowest-id rows of a residual
        # relation are the coarse seeds' own residuals, i.e. zeros)
        C = seeds.astype(np.float64)
        if len(C) != k:
            raise ValueError(
                f"pq_refine_codebooks: {len(C)} seeds for k={k}"
            )
    else:
        _ids, C = _seed_centroids(vectors, id_col, vec_col, k)
    D = C.shape[1]
    if D % m != 0:
        raise ValueError(f"dimension {D} not divisible by m={m}")
    sub = D // m
    id_type = vectors.schema[id_col].dataType.simpleString()
    base = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast(C)

        def enc(batches, _bc=bc):
            Cb = _bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                A = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                codes = np.empty((len(A), m), dtype=np.int32)
                for s in range(m):
                    lo = s * sub
                    diff = A[:, [lo]] - Cb[:, lo][None, :]
                    acc = diff * diff
                    for i in range(lo + 1, lo + sub):
                        diff = A[:, [i]] - Cb[:, i][None, :]
                        acc = acc + diff * diff
                    codes[:, s] = acc.argmin(axis=1)
                yield pd.DataFrame(
                    {"_id": pdf["_id"], "_v": pdf["_v"], "codes": list(codes)}
                )

        assigned = base.mapInPandas(
            enc, f"_id {id_type}, _v array<double>, codes array<int>"
        )
        # dim → owning subspace → that subspace's code; mean per (code, dim)
        # as the ascending-member-id ordered fold (oracle parity)
        exploded = assigned.select(
            F.col("_id"),
            F.posexplode("_v").alias("dim", "val"),
            F.col("codes"),
        ).select(
            "_id",
            "dim",
            "val",
            F.element_at(
                "codes", (F.floor(F.col("dim") / F.lit(sub)) + 1).cast("int")
            ).alias("code"),
        )
        means = exploded.groupBy("code", "dim").agg(
            (
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_id", "val"))),
                        lambda s: s["val"].cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count("*")
            ).alias("mval")
        )
        newC = C.copy()
        for r in means.collect():  # ≤ k·D rows
            newC[r["code"], r["dim"]] = r["mval"]
        C = newC
    return C


def _residual_frame(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cids: np.ndarray,
    CC: np.ndarray,
) -> DataFrame:
    """Corpus residuals ``(id, _rv)`` with ``_rv = x − centroid(x)`` as
    ``array<double>`` — the training relation for residual-PQ Lloyd.
    One Arrow assignment pass (vector carried through, no corpus
    re-join) + a JVM ``zip_with`` subtract; ``CAST(float AS DOUBLE)`` is
    exact widening, so the values match the numpy float64 subtract in
    the index kernel bit-for-bit."""
    spark = vectors.sparkSession
    assigned = _assign_to(vectors, id_col, vec_col, cids, CC, with_vector=True)
    id_type = vectors.schema[id_col].dataType.simpleString()
    cent_df = spark.createDataFrame(
        [(c.item() if hasattr(c, "item") else c, [float(x) for x in CC[i]])
         for i, c in enumerate(cids)],
        f"centroid {id_type}, _cv array<double>",
    )
    return assigned.join(F.broadcast(cent_df), "centroid").select(
        F.col(id_col),
        F.zip_with(
            F.col("_v"), F.col("_cv"), lambda a, b: a.cast("double") - b
        ).alias("_rv"),
    )


def _residual_codebook(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_codes: int,
    cids: np.ndarray,
    CC: np.ndarray,
    m: int,
    pq_refine_iters: int,
) -> np.ndarray:
    """PQ codebook over RESIDUALS: seeded from the residuals of the
    ``n_codes`` vectors ranked just PAST the coarse seeds (ids ranked
    ``n_centroids .. n_centroids+n_codes``) — the lowest-id vectors ARE
    the coarse seeds, whose residuals are zero, a degenerate codebook.
    Optionally Lloyd-refined per subspace on the corpus residual
    relation (:func:`_residual_frame` + :func:`pq_refine_codebooks` —
    the actual Faiss IndexIVFPQ training flow, recommended)."""
    n_skip = len(cids)
    head = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(n_skip + n_codes)
        .toPandas()
    )
    rows = head["_v"].to_numpy()[n_skip:]
    if len(rows) != n_codes:
        # check BEFORE np.stack — an empty slice would raise an opaque
        # "need at least one array to stack" instead of this message
        raise ValueError(
            f"_residual_codebook: corpus has fewer than "
            f"{n_skip + n_codes} vectors"
        )
    S = np.stack(rows).astype(np.float64)
    seed_resid = _residual_of(S, cids, CC)
    if pq_refine_iters > 0:
        resid = _residual_frame(vectors, id_col, vec_col, cids, CC)
        return pq_refine_codebooks(
            resid, id_col, "_rv", m, n_codes, pq_refine_iters,
            seeds=seed_resid,
        )
    return seed_resid


def _encode_codes(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    cids: np.ndarray,
    CC: np.ndarray,
    C: np.ndarray,
    m: int,
    residual: bool,
) -> DataFrame:
    """The fused assign+encode Arrow pass shared by :func:`ivfpq_index`
    (initial build) and :func:`ivfpq_append` (nightly delta): one
    ``mapInPandas`` over the vectors with BOTH codebooks broadcast,
    yielding the ``(neighbor_id, centroid, subspace, code)`` relation.
    The numpy kernels are verbatim :func:`_assign_to` (cosine argmax,
    clamp, lowest-id tie via ascending cids) and :func:`pq_encode`
    (dim-sequential distances, lowest-code argmin), so the same vector
    encodes bit-identically whether it arrives in the initial build or
    a later delta — the property that makes append == rebuild."""
    spark = vectors.sparkSession
    D = C.shape[1]
    if D % m != 0:
        raise ValueError(f"dimension {D} not divisible by m={m}")
    sub = D // m
    id_type_idx = vectors.schema[id_col].dataType.simpleString()
    bc_idx = spark.sparkContext.broadcast((cids, CC, C))

    def index(batches):
        cids_b, CCb, Cb = bc_idx.value

        def norms(X):
            acc = X[:, 0] * X[:, 0]
            for j in range(1, X.shape[1]):
                acc = acc + X[:, j] * X[:, j]
            return np.sqrt(acc)

        nc = norms(CCb)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            acc = A[:, [0]] * CCb[:, 0][None, :]
            for j in range(1, A.shape[1]):
                acc = acc + A[:, [j]] * CCb[:, j][None, :]
            scores = np.clip(acc / (norms(A)[:, None] * nc[None, :]), -1.0, 1.0)
            best = scores.argmax(axis=1)
            cell = cids_b[best]
            # residual encoding: quantize x − centroid(x), not x (same
            # subtract as _residual_of, so seeds/encodes agree exactly)
            E = A - CCb[best] if residual else A
            codes = np.empty((len(A), m), dtype=np.int32)
            for s in range(m):
                lo = s * sub
                diff = E[:, [lo]] - Cb[:, lo][None, :]
                d2 = diff * diff
                for i in range(lo + 1, lo + sub):
                    diff = E[:, [i]] - Cb[:, i][None, :]
                    d2 = d2 + diff * diff
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"_id": pdf["_id"], "centroid": cell, "codes": list(codes)}
            )

    return (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .mapInPandas(
            index,
            f"_id {id_type_idx}, centroid {id_type_idx}, codes array<int>",
        )
        .select(
            F.col("_id").alias("neighbor_id"),
            "centroid",
            F.posexplode("codes").alias("subspace", "code"),
        )
    )


def ivfpq_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 4,
    n_codes: int = 8,
    stage_path: str | None = None,
    coarse_refine_iters: int = 0,
    pq_refine_iters: int = 0,
    residual: bool = False,
    _coarse: tuple[np.ndarray, np.ndarray] | None = None,
    _codebook: np.ndarray | None = None,
    _built_coarse_iters: int | None = None,
    _built_pq_iters: int | None = None,
) -> DataFrame:
    """Build the IVF-PQ index relation ``(neighbor_id, centroid,
    subspace, code)`` — the persistable artifact a 100 TB deployment
    stages once and searches many times (pass it back to
    :func:`knn_ivf_pq` via ``index=``, or read the ``stage_path``
    parquet in a later session).

    ``residual=True`` encodes ``x − centroid(x)`` instead of raw ``x``
    (the Faiss IndexIVFPQ DEFAULT, Jégou et al. 2011 §IV-A): residuals
    have far smaller spread than raw vectors, so the same
    ``m·log2(n_codes)`` bit budget buys materially more accuracy. The
    codebook is then seeded from (or trained on) RESIDUALS, and a
    search must decode per probed cell — :func:`knn_ivf_pq` with
    ``residual=True`` does. An index's residual flag is part of its
    geometry: searching a residual index without ``residual=True`` (or
    vice versa) silently ranks wrong, exactly like an m/n_codes
    mismatch — keep the build call's flags with the staged parquet.

    Cell assignment and PQ encoding are FUSED into one Arrow pass (both
    codebooks broadcast together) — building them separately would join
    two corpus-sized relations on id, a full corpus shuffle the index
    build doesn't need. The numpy kernels are verbatim
    :func:`_assign_to` (cosine argmax, clamp, lowest-id tie via
    ascending cids) and :func:`pq_encode` (dim-sequential distances,
    lowest-code argmin), so every value matches the
    separately-verified emb_ivf_assign / emb_pq_codes results
    bit-for-bit. With ``stage_path`` the table lands in parquet and the
    returned frame scans the staged files — the float corpus is never
    re-read by searches; partitioning by ``centroid`` would add cell
    pruning on top.

    ``coarse_refine_iters`` / ``pq_refine_iters``: Lloyd-train the cell
    centroids (:func:`ivf_refine_centroids`) and/or the PQ codebooks
    (:func:`pq_refine_codebooks`) before the encode pass — the trained
    index (both stages' recall improves at the same probe/bit budget;
    training costs one scan per iteration, run it on a sample at scale).
    ``_coarse`` / ``_codebook``: already-trained matrices from the
    caller (``knn_ivf_pq`` trains once and shares them with its probe
    ranking and ADC tables — retraining here would double the cost).
    """
    vectors = _well_formed(vectors, id_col, vec_col)
    spark = vectors.sparkSession
    if (
        _coarse is None
        and coarse_refine_iters == 0
        and _codebook is None
        and not residual
        and pq_refine_iters == 0
    ):
        # both quantizers are untrained lowest-id seeds: one ordered
        # head scan serves both (r15, guide §1.2 — the codebook seed
        # set is a prefix of the coarse seed set), bit-identical to two
        # separate _seed_centroids jobs
        (cids, CC), C = _seed_heads(
            vectors, id_col, vec_col, n_centroids, n_codes
        )
    else:
        if _coarse is not None:
            cids, CC = _coarse
        elif coarse_refine_iters > 0:
            cids, CC = ivf_refine_centroids(
                vectors, id_col, vec_col, n_centroids, coarse_refine_iters
            )
        else:
            cids, CC = _seed_centroids(vectors, id_col, vec_col, n_centroids)
        if _codebook is not None:
            C = _codebook
        elif residual:
            C = _residual_codebook(
                vectors, id_col, vec_col, n_codes, cids, CC, m,
                pq_refine_iters,
            )
        elif pq_refine_iters > 0:
            C = pq_refine_codebooks(
                vectors, id_col, vec_col, m, n_codes, pq_refine_iters
            )
        else:
            _cbids, C = _seed_centroids(vectors, id_col, vec_col, n_codes)
    codes = _encode_codes(vectors, id_col, vec_col, cids, CC, C, m, residual)
    if stage_path is not None:
        # geometry sidecar: the built-SMALLER case (an index with fewer
        # n_codes than a later search declares) is UNDETECTABLE from the
        # code values themselves (codes 0..n_built−1 all pass a
        # `code >= n_codes` probe), so the build's geometry is persisted
        # next to the index and load_ivfpq_index validates it on read.
        # n_centroids/n_codes record the ACTUAL matrices' row counts
        # (len(cids), C rows), not the params — with _coarse/_codebook
        # passed the params may be unused and would record a lie. The
        # refine-iteration counts ride along: knn_ivf_pq's staging path
        # (which always hands over _coarse/_codebook it trained itself)
        # forwards its real budgets via _built_*; -1 = the matrices
        # arrived pre-trained with provenance unknown to any caller.
        if _built_coarse_iters is not None:
            rec_coarse = _built_coarse_iters
        else:
            rec_coarse = -1 if _coarse is not None else coarse_refine_iters
        if _built_pq_iters is not None:
            rec_pq = _built_pq_iters
        else:
            rec_pq = -1 if _codebook is not None else pq_refine_iters
        meta = spark.createDataFrame(
            [
                (
                    m,
                    int(C.shape[0]),
                    int(len(cids)),
                    bool(residual),
                    rec_coarse,
                    rec_pq,
                )
            ],
            "m int, n_codes int, n_centroids int, residual boolean, "
            "coarse_refine_iters int, pq_refine_iters int",
        )
        # quantizer sidecar: the FROZEN matrices themselves (coarse
        # centroids + PQ codebook), persisted next to the codes — the
        # artifact that makes the staged index self-contained: a later
        # session can append a delta batch (ivfpq_append) or rank probes
        # (knn_ivf_pq via load_ivfpq_index(with_quantizer=True)) against
        # EXACTLY the matrices this build encoded with, instead of
        # re-deriving them from the (possibly grown) corpus. Tiny:
        # (n_centroids + n_codes) rows of D doubles.
        id_type_q = vectors.schema[id_col].dataType.simpleString()
        quant = spark.createDataFrame(
            [
                ("coarse", i, _pykey(cids[i]), [float(x) for x in CC[i]])
                for i in range(len(cids))
            ]
            + [
                ("pq", i, None, [float(x) for x in C[i]])
                for i in range(C.shape[0])
            ],
            f"part string, ord int, qid {id_type_q}, vec array<double>",
        )
        # the three staged relations are disjoint paths — submit the
        # writes concurrently (r15, guide §2.6): the two sidecar writes
        # are driver-local-relation jobs that back-fill while the codes
        # write's corpus encode runs; bytes written are identical
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as wpool:
            wfs = [
                wpool.submit(
                    lambda: codes.write.mode("overwrite").parquet(stage_path)
                ),
                wpool.submit(
                    lambda: meta.write.mode("overwrite").parquet(
                        stage_path + "_meta"
                    )
                ),
                wpool.submit(
                    lambda: quant.write.mode("overwrite").parquet(
                        stage_path + "_quantizer"
                    )
                ),
            ]
            for wf in wfs:
                wf.result()
        codes = spark.read.parquet(stage_path)
    return codes


def load_ivfpq_index(
    spark,
    stage_path: str,
    m: int,
    n_codes: int,
    residual: bool = False,
    n_centroids: int | None = None,
    coarse_refine_iters: int | None = None,
    pq_refine_iters: int | None = None,
    with_quantizer: bool = False,
):
    """Read back a staged :func:`ivfpq_index` and VALIDATE its geometry
    sidecar against the search call's declared ``m`` / ``n_codes`` /
    ``residual`` — closing the gap the in-relation probe in
    :func:`knn_ivf_pq` cannot see: an index built with SMALLER n_codes
    (its codes 0..n_built−1 all look legal) or a residual-flag mismatch
    silently mis-ranks with no error. Raises on any mismatch; an index
    staged by an older build without the sidecar loads with a clear
    error telling the caller to restage. Returns the staged code
    relation, ready to pass to ``knn_ivf_pq(index=...)`` (whose own
    LIMIT-probes then re-check the built-bigger direction for free).

    ``n_centroids`` / ``coarse_refine_iters`` / ``pq_refine_iters``:
    pass the search call's values to ALSO validate the quantizer
    TRAINING STATE — a search that re-derives its probe centroids with
    a different cell count or refinement budget than the build mis-maps
    queries to cells just as silently as a code-geometry mismatch. The
    checks are skipped when a knob is None (caller opted out) or when
    the sidecar recorded ``-1`` for a refine count (the build was handed
    pre-trained matrices, provenance unknown).

    ``with_quantizer=True`` additionally loads the quantizer sidecar —
    the FROZEN (coarse ids, coarse matrix) and PQ codebook the build
    encoded with — and returns ``(codes, (cids, CC), C)`` ready to pass
    straight to ``knn_ivf_pq(index=codes, coarse=(cids, CC),
    codebook=C)``: the search then probes against exactly the build's
    centroids instead of re-deriving seeds from the corpus (which, after
    an :func:`ivfpq_append`, would no longer be the same corpus the
    index was built from)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.errors import AnalysisException

    codes = spark.read.parquet(stage_path)
    # with_quantizer: the quantizer sidecar read is independent of the
    # meta read — overlap the two driver jobs (r15, guide §2.6). Meta
    # validation errors still surface first (its result is consumed
    # before the quantizer future's).
    quant_pool = quant_fut = None
    if with_quantizer:
        quant_pool = ThreadPoolExecutor(max_workers=1)
        quant_fut = quant_pool.submit(_load_quantizer, spark, stage_path)
    try:
        meta = spark.read.parquet(stage_path + "_meta").collect()
    except AnalysisException as exc:
        raise ValueError(
            f"load_ivfpq_index: no geometry sidecar at {stage_path}_meta "
            "— the index predates sidecar staging; rebuild it with "
            "ivfpq_index(stage_path=...) so geometry mismatches "
            "(including the undetectable built-smaller n_codes case) "
            "fail fast"
        ) from exc
    got = meta[0]
    if (
        got["m"] != m
        or got["n_codes"] != n_codes
        or bool(got["residual"]) != bool(residual)
    ):
        raise ValueError(
            "load_ivfpq_index: staged index geometry "
            f"(m={got['m']}, n_codes={got['n_codes']}, "
            f"residual={got['residual']}) does not match the search's "
            f"(m={m}, n_codes={n_codes}, residual={residual}) — the ADC "
            "table would silently mis-rank; rebuild or fix the call"
        )
    mismatches = []
    if n_centroids is not None and got["n_centroids"] != n_centroids:
        mismatches.append(
            f"n_centroids: built {got['n_centroids']}, search {n_centroids}"
        )
    for name, want in (
        ("coarse_refine_iters", coarse_refine_iters),
        ("pq_refine_iters", pq_refine_iters),
    ):
        if want is not None and got[name] != -1 and got[name] != want:
            mismatches.append(f"{name}: built {got[name]}, search {want}")
    if mismatches:
        raise ValueError(
            "load_ivfpq_index: staged index training state does not "
            f"match the search's ({'; '.join(mismatches)}) — the probe "
            "quantizer would mis-map queries to cells; rebuild or fix "
            "the call"
        )
    if with_quantizer:
        try:
            cids, CC, C = quant_fut.result()
        finally:
            quant_pool.shutdown(wait=False)
        return codes, (cids, CC), C
    return codes


def _load_quantizer(spark, stage_path: str):
    """Read the quantizer sidecar staged by :func:`ivfpq_index` back
    into the driver-side ``(cids, CC, C)`` matrices (sidecar-sized —
    n_centroids + n_codes rows). Rows come back in the build's ``ord``
    so the matrices are bit-identical to what the build broadcast."""
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.parquet(stage_path + "_quantizer")
            .orderBy("part", "ord")
            .collect()
        )
    except AnalysisException as exc:
        raise ValueError(
            f"load_ivfpq_index: no quantizer sidecar at "
            f"{stage_path}_quantizer — the index predates quantizer "
            "staging; rebuild it with ivfpq_index(stage_path=...) to "
            "append deltas or search with the frozen matrices"
        ) from exc
    coarse = [r for r in rows if r["part"] == "coarse"]
    pq = [r for r in rows if r["part"] == "pq"]
    cids = np.array([r["qid"] for r in coarse])
    CC = np.array([r["vec"] for r in coarse], dtype=np.float64)
    C = np.array([r["vec"] for r in pq], dtype=np.float64)
    return cids, CC, C


def ivfpq_append(
    spark,
    stage_path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate: bool = True,
) -> DataFrame:
    """Append a delta batch to a STAGED :func:`ivfpq_index` without
    touching the already-indexed corpus — the nightly-ingest surface
    for the ANN pillar (dedup, graph and sketches each have one:
    ``minhash_lsh_pairs_between``, ``pagerank(start_ranks=)`` /
    ``connected_components_incremental``, ``*_merge``).

    The delta is assigned + PQ-encoded against the FROZEN quantizer
    from the stage's sidecar (the exact matrices the original build
    broadcast — :func:`_encode_codes` is the same fused Arrow pass), so
    appended codes are bit-identical to what a full rebuild over the
    grown corpus with the same matrices would produce: append ==
    rebuild, differential-tested. Cost is |delta| encode + one parquet
    append; the existing code files are never rewritten or re-read. At
    100 TB this is the normal operating mode — the quantizer is trained
    once, the corpus grows nightly.

    ``validate=True`` (default) runs one LIMIT-bounded probe asserting
    no new id is already indexed — a duplicate id would carry TWO code
    sets and rank twice in every search (the ``pagerank`` dup-seed
    convention); ``validate=False`` skips the probe for feeds that are
    disjoint by construction. The id column's TYPE is always checked
    (driver-side, free): a mismatch would corrupt the staged schema.

    Returns the full appended code relation (a fresh scan of
    ``stage_path``). Quantizer training state is whatever the build
    staged — appending never retrains; when cell balance degrades after
    heavy growth, rebuild (that is the IVF trade, not a code path)."""
    new_vectors = _well_formed(new_vectors, id_col, vec_col)
    codes = spark.read.parquet(stage_path)
    new_id_type = new_vectors.schema[id_col].dataType
    staged_id_type = codes.schema["neighbor_id"].dataType
    if new_id_type != staged_id_type:
        raise ValueError(
            f"ivfpq_append: {id_col} type {new_id_type.simpleString()} "
            "does not match the staged index's id type "
            f"{staged_id_type.simpleString()} — appending would corrupt "
            "the staged schema"
        )
    # the two sidecar loads and the duplicate-id probe are independent
    # driver actions — run them as concurrent jobs (r15, guide §2.6);
    # each job's computation and result are unchanged
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        quant_fut = pool.submit(_load_quantizer, spark, stage_path)
        meta_fut = pool.submit(
            lambda: spark.read.parquet(stage_path + "_meta").collect()[0]
        )
        dup_fut = None
        if validate:
            # ONE id-keyed aggregate over delta ids ∪ staged ids
            # (subspace-0 rows only, so the staged side scans |corpus|
            # not |corpus|·m): any id appearing twice — already indexed,
            # repeated WITHIN the delta batch, or a pre-corrupted index
            # — would carry multiple code sets and rank that vector more
            # than once in every search. LIMIT-bounded, skippable.
            dup_fut = pool.submit(
                lambda: new_vectors.select(F.col(id_col).alias("neighbor_id"))
                .unionByName(
                    codes.where(F.col("subspace") == 0).select("neighbor_id")
                )
                .groupBy("neighbor_id")
                .agg(F.count(F.lit(1)).alias("_c"))
                .where(F.col("_c") > 1)
                .limit(1)
                .collect()
            )
        cids, CC, C = quant_fut.result()
        meta = meta_fut.result()
    if validate:
        dup = dup_fut.result()
        if dup:
            raise ValueError(
                f"ivfpq_append: id {dup[0]['neighbor_id']} is already "
                "indexed or repeated in the delta batch — appending it "
                "would carry multiple code sets and rank the vector "
                "more than once in every search; dedup the feed (or "
                "pass validate=False for feeds disjoint and unique by "
                "construction)"
            )
    delta = _encode_codes(
        new_vectors, id_col, vec_col, cids, CC, C,
        int(meta["m"]), bool(meta["residual"]),
    )
    delta.write.mode("append").parquet(stage_path)
    return spark.read.parquet(stage_path)


def knn_ivf_pq(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 8,
    max_query_rows: int = 100_000,
    stage_path: str | None = None,
    index: DataFrame | None = None,
    coarse_refine_iters: int = 0,
    pq_refine_iters: int = 0,
    residual: bool = False,
    coarse: tuple[np.ndarray, np.ndarray] | None = None,
    codebook: np.ndarray | None = None,
    _qpdf: pd.DataFrame | None = None,
) -> DataFrame:
    """Composed IVF-PQ search — the Faiss ``IndexIVFPQ`` shape, and the
    plan an actual 100 TB ANN deployment runs: coarse-probe the
    ``n_probe`` cells nearest each query (cosine, as :func:`knn_ivf`),
    then rank members of the probed cells by asymmetric distance over
    their PQ CODES (as :func:`knn_pq`). Returns
    ``(query_id, neighbor_id, approx_d2)`` top-k per query.

    ``residual=True`` searches a RESIDUAL-encoded index (the Faiss
    IndexIVFPQ default; see :func:`ivfpq_index`): codes quantize
    ``x − centroid(x)``, so the ADC tables become per-(query,
    probed-cell) — the query's residual against each probed centroid —
    still ``|Q|·n_probe·m·n_codes`` rows, broadcast. Most of PQ's
    accuracy at a fixed code budget comes from this. The flag must
    match the index build's flag (a mismatch silently ranks wrong,
    like an m/n_codes mismatch — the geometry guard cannot see it).

    Cost at scale multiplies both savings: the scan touches
    ~``n_probe/n_centroids`` of the corpus, and what it reads is
    ``m·log2(n_codes)`` bits of codes per vector, not floats. Recall < 1
    from both stages by construction; sweep against
    :func:`knn_recall`'s exact truth to tune.

    Fully JVM-side scoring: the per-query ADC tables (|Q|·m·n_codes
    rows, exact dim-sequential sub-distances) ship as a broadcast local
    relation; scoring is two broadcast hash joins (probe filter, table
    lookup) plus ONE (query, neighbor)-keyed aggregate whose sum folds
    in ascending subspace order — bit-identical to the ordered SQL
    replay. No Python touches the corpus beyond the already-verified
    encode/assign maps.

    ``index``: a prebuilt :func:`ivfpq_index` relation (or a staged
    copy read back from parquet) — the search-many-times path; the
    corpus encode is skipped entirely. For a SEED index the corpus is
    only touched for the (LIMIT-sized) codebook seeds; for a TRAINED
    index also pass the trained matrices via ``coarse`` (from
    :func:`ivf_refine_centroids`) and ``codebook`` (from
    :func:`pq_refine_codebooks`) — otherwise this call retrains them
    from ``vectors`` (correct, but pays the Lloyd scans the staging was
    meant to avoid). ``stage_path``: build AND stage the index in this
    call (one-shot convenience; build once with :func:`ivfpq_index`
    when multiple searches share it). ``index`` and ``stage_path`` are
    mutually exclusive.

    Driver-job scheduling (r15, guide §1.2/§2.6): at construction this
    operator may run several INDEPENDENT eager chains — the guarded
    query collect, the coarse-quantizer training, a coarse-independent
    PQ-codebook training, the geometry probes on a prebuilt index, and
    (residual) the probe-ranking collect. They are submitted to a small
    driver thread pool so their Spark jobs overlap (Spark schedules
    concurrent jobs FIFO and back-fills idle cores); every chain's own
    computation and its results are unchanged — only the wall-clock
    order of job submission differs. When both quantizers are untrained
    seeds, ONE ordered head scan serves both (the codebook seed set is
    a prefix of the coarse seed set). ``_qpdf`` (private, the
    ``_shingles=`` convention): a pre-collected
    :func:`_collect_guarded_queries` frame for the SAME ``queries``
    relation, letting a multi-arm caller pay the query collect once —
    never cached across queries or runs.
    """
    queries = _well_formed(queries, id_col, vec_col)
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Window

    if index is not None and stage_path is not None:
        raise ValueError(
            "knn_ivf_pq: pass either a prebuilt `index` or `stage_path`, "
            "not both (stage via ivfpq_index when reusing)"
        )
    spark = vectors.sparkSession
    # training knobs: the probe centroids and the ADC codebook MUST
    # match the index's build exactly — when searching a prebuilt/staged
    # index, pass the SAME coarse_refine_iters / pq_refine_iters it was
    # built with (the ADC table is only asymmetric against that
    # codebook; a mismatch silently returns wrong distances)
    # the coarse quantizer is trained ONCE and shared by the probe table
    # and the index build; it is only materialized when actually needed
    # (trained probe ranking, an inline index build, or residual ADC —
    # residual search ALWAYS needs the centroid matrix) — the
    # prebuilt-seed-index raw path runs NO extra corpus job
    # provenance for the staging sidecar: when WE train the matrices the
    # refine budgets are known; matrices handed in by the caller have
    # unknown training history (recorded as -1, skipping that check)
    user_coarse = coarse is not None
    user_codebook = codebook is not None
    trained_coarse = coarse_refine_iters > 0 or coarse is not None
    need_coarse = coarse is None and (
        trained_coarse or index is None or residual
    )
    pool = ThreadPoolExecutor(max_workers=3)
    probe_rows = None
    try:
        qpdf_fut = (
            pool.submit(
                _collect_guarded_queries,
                queries, id_col, vec_col, max_query_rows, "knn_ivf_pq",
            )
            if _qpdf is None
            else None
        )
        # geometry fail-fast probes on a prebuilt/staged index (see the
        # block below for what they assert): independent of everything
        # else — submit first so they overlap the training chains. The
        # always-submitted nonempty probe trades one extra tiny job for
        # the sequential short-circuit's wall time.
        geo_futs = None
        if index is not None:
            geo_futs = (
                pool.submit(
                    lambda: index.where(
                        (F.col("subspace") >= m) | (F.col("code") >= n_codes)
                    )
                    .limit(1)
                    .collect()
                ),
                pool.submit(
                    lambda: index.where(F.col("subspace") == m - 1)
                    .limit(1)
                    .collect()
                ),
                pool.submit(lambda: index.limit(1).collect()),
            )
        seed_merge = (
            need_coarse
            and coarse_refine_iters == 0
            and codebook is None
            and not residual
            and pq_refine_iters == 0
        )
        coarse_fut = cb_fut = None
        if seed_merge:
            coarse_fut = pool.submit(
                _seed_heads, vectors, id_col, vec_col, n_centroids, n_codes
            )
        else:
            if need_coarse:
                if coarse_refine_iters > 0:
                    coarse_fut = pool.submit(
                        ivf_refine_centroids,
                        vectors, id_col, vec_col, n_centroids,
                        coarse_refine_iters,
                    )
                else:
                    coarse_fut = pool.submit(
                        _seed_centroids, vectors, id_col, vec_col, n_centroids
                    )
            if codebook is None and not residual:
                if pq_refine_iters > 0:
                    cb_fut = pool.submit(
                        pq_refine_codebooks,
                        vectors, id_col, vec_col, m, n_codes, pq_refine_iters,
                    )
                else:
                    cb_fut = pool.submit(
                        lambda: _seed_centroids(
                            vectors, id_col, vec_col, n_codes
                        )[1]
                    )
        if seed_merge:
            coarse, C = coarse_fut.result()
        else:
            if coarse_fut is not None:
                coarse = coarse_fut.result()
            if codebook is not None:
                C = codebook
            elif residual:
                # the residual codebook needs the (now resolved) coarse
                # matrices; the residual probe-ranking collect below
                # needs them too and nothing else — overlap the two
                cent = _cent_frame(
                    vectors, id_col, vec_col, n_centroids,
                    *(coarse if trained_coarse else (None, None)),
                    trained=trained_coarse,
                )
                pp_fut = pool.submit(
                    lambda: _probe_plan(
                        queries, id_col, vec_col, cent, n_probe
                    ).collect()
                )
                C = _residual_codebook(
                    vectors, id_col, vec_col, n_codes, *coarse, m,
                    pq_refine_iters,
                )
                probe_rows = pp_fut.result()
            else:
                C = cb_fut.result()
        if residual and probe_rows is None:
            # residual with a caller-supplied codebook: still collect
            # the probe ranking (no codebook chain to overlap with)
            cent = _cent_frame(
                vectors, id_col, vec_col, n_centroids,
                *(coarse if trained_coarse else (None, None)),
                trained=trained_coarse,
            )
            probe_rows = _probe_plan(
                queries, id_col, vec_col, cent, n_probe
            ).collect()
        qpdf = qpdf_fut.result() if qpdf_fut is not None else _qpdf
    finally:
        pool.shutdown(wait=True)
    D = C.shape[1]
    if D % m != 0:
        raise ValueError(f"dimension {D} not divisible by m={m}")
    sub = D // m
    codes = (
        index
        if index is not None
        else ivfpq_index(
            vectors, id_col, vec_col, n_centroids, m, n_codes, stage_path,
            residual=residual, _coarse=coarse, _codebook=C,
            _built_coarse_iters=(-1 if user_coarse else coarse_refine_iters),
            _built_pq_iters=(-1 if user_codebook else pq_refine_iters),
        )
    )
    if index is not None:
        # fail-fast geometry check on a prebuilt/staged index: the ADC
        # join on (subspace, code) SILENTLY drops sub-distance terms if
        # the index was built with different m / n_codes, so a mismatch
        # would rank wrong with no error. LIMIT-bounded probes, not a
        # full aggregate — the index is |corpus|·m rows and the
        # search-many-times path must not rescan it per call:
        # built-BIGGER shows up as any row past the geometry; an index
        # built with SMALLER m as a non-empty index with no subspace
        # m−1 row (every indexed vector carries all its subspaces).
        # KNOWN GAP: an index built with SMALLER n_codes is undetectable
        # here — its codes 0..n_built−1 all pass the `code >= n_codes`
        # probe, and with refined/residual codebooks the ADC table then
        # silently mis-ranks. Training-state and residual-flag
        # mismatches are equally invisible to the relation. For staged
        # indexes use load_ivfpq_index, which validates the persisted
        # geometry sidecar (m/n_codes/residual always; n_centroids and
        # refine budgets when the caller passes them); for an in-memory
        # prebuilt relation they remain the caller's contract.
        # (the probe jobs themselves were submitted to the driver pool
        # above so they overlapped the training chains — r15 §2.6)
        too_big = geo_futs[0].result()
        too_small = not geo_futs[1].result() and bool(geo_futs[2].result())
        if too_big or too_small:
            raise ValueError(
                "knn_ivf_pq: prebuilt index geometry mismatch — the index "
                f"was not built with m={m}, n_codes={n_codes}; rebuild it "
                "or pass the m/n_codes it was built with"
            )

    if not residual:
        # coarse probe ranking: same JVM cosine + window as knn_ivf,
        # left LAZY — it feeds the final join directly (the residual
        # path collected it in the pooled block above)
        cent = _cent_frame(
            vectors, id_col, vec_col, n_centroids,
            *(coarse if trained_coarse else (None, None)),
            trained=trained_coarse,
        )
        probes = _probe_plan(queries, id_col, vec_col, cent, n_probe)

    # per-query ADC tables (exact sub-distances to every code), computed
    # driver-side over the guarded query set (collected in the pooled
    # block above), shipped as a local relation
    id_type = vectors.schema[id_col].dataType.simpleString()
    # query_id values come from the QUERIES table; declaring them with
    # the vectors' id type mis-stamps mixed-id-type inputs (r13 ADVICE)
    q_id_type = queries.schema[id_col].dataType.simpleString()
    if not len(qpdf):
        # degrade gracefully like the other knn_* operators — np.stack
        # on an empty column would raise an opaque ValueError
        return spark.createDataFrame(
            [], f"query_id {q_id_type}, neighbor_id {id_type}, approx_d2 double"
        )
    Q = np.stack(qpdf["_qv"].to_numpy()).astype(np.float64)
    if residual:
        # residual ADC: per (query, probed cell) — the codes quantize
        # x − centroid(x), so the lookup table for a probed cell is the
        # QUERY's residual against that cell vs the codebook. Probe
        # pairs are |Q|·n_probe (window-derived, deterministic); the
        # table stays |Q|·n_probe·m·n_codes rows — broadcast.
        cids_np, CC_np = coarse
        cid_row = {c: i for i, c in enumerate(cids_np.tolist())}
        qindex = {
            _pykey(qpdf["_qid"][qi]): qi for qi in range(len(Q))
        }
        probe_pairs = [
            (r["query_id"], r["centroid"]) for r in probe_rows
        ]
        # the ranking job already ran (in the pooled block, overlapped
        # with the residual-codebook chain) — rebuild probes as a local
        # relation so the final join doesn't recompute the
        # queries×centroids cosine window a second time (and the ADC
        # rows and the join see bit-identical probe sets)
        probes = spark.createDataFrame(
            sorted(probe_pairs), f"query_id {q_id_type}, centroid {id_type}"
        )
        adc_rows = []
        for qid, cell in sorted(probe_pairs):
            R = Q[qindex[qid]] - CC_np[cid_row[cell]]
            for s in range(m):
                lo = s * sub
                diff = R[lo] - C[:, lo]
                acc = diff * diff
                for i in range(lo + 1, lo + sub):
                    diff = R[i] - C[:, i]
                    acc = acc + diff * diff
                for c in range(C.shape[0]):
                    adc_rows.append((qid, cell, s, c, float(acc[c])))
        adc = spark.createDataFrame(
            adc_rows,
            f"query_id {q_id_type}, centroid {id_type}, "
            "subspace int, code int, d2 double",
        )
        adc_keys = ["query_id", "centroid", "subspace", "code"]
    else:
        adc_rows = []
        for s in range(m):
            lo = s * sub
            diff = Q[:, [lo]] - C[:, lo][None, :]
            acc = diff * diff
            for i in range(lo + 1, lo + sub):
                diff = Q[:, [i]] - C[:, i][None, :]
                acc = acc + diff * diff
            for qi in range(len(Q)):
                for c in range(C.shape[0]):
                    adc_rows.append(
                        (_pykey(qpdf["_qid"][qi]), s, c, float(acc[qi, c]))
                    )
        adc = spark.createDataFrame(
            adc_rows, f"query_id {q_id_type}, subspace int, code int, d2 double"
        )
        adc_keys = ["query_id", "subspace", "code"]

    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_d2"), F.col("neighbor_id")
    )
    return (
        # probes is |queries|·n_probe rows — ALWAYS broadcast (hinted:
        # Catalyst can't size it through the window)
        codes.join(F.broadcast(probes), "centroid")
        # same mixed-id-type note as knn_pq: native compare when types
        # match, string compare otherwise (ANSI cast would throw)
        .where(
            F.col("neighbor_id") != F.col("query_id")
            if q_id_type == id_type
            else F.col("neighbor_id").cast("string")
            != F.col("query_id").cast("string")
        )
        .join(F.broadcast(adc), adc_keys)
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("subspace", "d2"))),
                    lambda s: s["d2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_d2")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
