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


def _pair_score_udf():
    """Arrow-batched cosine over pre-joined pair rows.

    Vectorized across the batch, sequential across dims — per-row
    accumulation order j=0..d-1 makes each double bit-identical to the
    JVM fold (and DuckDB's sequential sum).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def score(e1: pd.Series, e2: pd.Series, n1: pd.Series, n2: pd.Series) -> pd.Series:
        A = np.stack(e1.to_numpy()).astype(np.float64)
        B = np.stack(e2.to_numpy()).astype(np.float64)
        acc = A[:, 0] * B[:, 0]
        for j in range(1, A.shape[1]):
            acc = acc + A[:, j] * B[:, j]
        return pd.Series(acc / (n1.to_numpy() * n2.to_numpy()))

    return score


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dims: int | None = 64,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    queries is broadcast (always small relative to the corpus); scoring is
    a map over the corpus scan; top-k is one shuffle on query_id. Ties
    break on neighbor id for determinism.
    """
    from pyspark.sql import Window

    # hoist each side's norm out of the pair computation: computed once
    # per row at scan time, not once per (query, neighbor) pair
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
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    dims: int | None = 64,
) -> DataFrame:
    """All pairs (d1 < d2) with cosine >= threshold — brute force.

    At 100 TB wrap this behind :func:`lsh_buckets` candidates; kept exact
    here as the verification/baseline operator.

    Plan shape matters: scoring must NOT live in the non-equi join —
    Catalyst would push the ``score >= t`` filter into the
    BroadcastNestedLoopJoin condition, where it is evaluated *interpreted*
    per pair. Instead the pair id-list is enumerated with a narrow
    ids-only theta join, the vectors are attached by two broadcast hash
    joins, and the score is computed in a codegen'd Project. Norms are
    computed once per row (N sqrt's, not N²).
    """
    ids = vectors.select(F.col(id_col).alias("d1"))
    ids2 = vectors.select(F.col(id_col).alias("d2"))
    pairs = ids.join(ids2, F.col("d1") < F.col("d2"))
    side = vectors.select(
        F.col(id_col),
        F.col(vec_col).alias("e"),
        norm(F.col(vec_col), dims).alias("n"),
    )
    a = side.select(F.col(id_col).alias("d1"), F.col("e").alias("e1"), F.col("n").alias("n1"))
    b = side.select(F.col(id_col).alias("d2"), F.col("e").alias("e2"), F.col("n").alias("n2"))
    score = _pair_score_udf()
    return (
        pairs.join(F.broadcast(a), "d1")
        .join(F.broadcast(b), "d2")
        .select(
            "d1",
            "d2",
            score(F.col("e1"), F.col("e2"), F.col("n1"), F.col("n2")).alias("score"),
        )
        .where(F.col("score") >= threshold)
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

    The plane dot is a ±-signed sum folded in index order (exact same
    doubles in any sequential engine). Bucketing is a map; the later
    candidate join shuffles on bucket — never all-pairs.
    """
    v = F.col(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        signs = _plane_signs(p, dims)
        # unrolled ±-signed sum, left-to-right (codegen'd; bit-identical
        # to a sequential fold in any engine)
        d = reduce(
            lambda acc, j: acc + v[j].cast("double") * float(signs[j]),
            range(1, dims),
            v[0].cast("double") * float(signs[0]),
        )
        bucket = bucket + F.when(d > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return vectors.select(F.col(id_col), bucket.alias("bucket"))


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Recall < 1 by construction; this is the plan shape for 100 TB
    (bucket equi-join instead of crossJoin)."""
    from pyspark.sql import Window

    vb = lsh_buckets(vectors, id_col, vec_col, planes, dims)
    v = vectors.join(vb, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_vec"),
        F.col("bucket"),
    )
    qb = lsh_buckets(queries, id_col, vec_col, planes, dims)
    q = queries.join(qb, id_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), F.col("bucket")
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("v_vec")).alias("score"),
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
