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

No Python UDFs: 64-dim folds stay inside whole-stage codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Index-ordered double fold of the elementwise product."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    queries is broadcast (always small relative to the corpus); scoring is
    a map over the corpus scan; top-k is one shuffle on query_id. Ties
    break on neighbor id for determinism.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec"))
    scored = (
        v.crossJoin(F.broadcast(q))
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


def embedding_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs (d1 < d2) with cosine >= threshold — brute force.

    At 100 TB wrap this behind :func:`lsh_buckets` candidates; kept exact
    here as the verification/baseline operator.
    """
    a = vectors.select(F.col(id_col).alias("d1"), F.col(vec_col).alias("e1"))
    b = vectors.select(F.col(id_col).alias("d2"), F.col(vec_col).alias("e2"))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", cosine(F.col("e1"), F.col("e2")).alias("score"))
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
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        signs = _plane_signs(p, dims)
        signs_arr = F.array(*[F.lit(float(s)) for s in signs])
        d = F.aggregate(
            F.zip_with(
                F.col(vec_col), signs_arr, lambda x, s: x.cast("double") * s
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
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
