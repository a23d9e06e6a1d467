"""Join operators: catalog joins, interval (deployment-window) join, orphan
detection.

The reference's joins are all pandas index joins or Python loops:

* catalog ⋈ summaries (``/root/reference/gdutils/__init__.py:107-114``)
* API catalog left/right merge (``/root/reference/gdutils/__init__.py:921-941``)
* per-deployment GTS fetch loop — an interval join done as N HTTP requests
  (``/root/reference/gdutils/osmc/__init__.py:215-239``)

Spark-first: the interval join is ONE equi-join on the platform key with the
time range as a residual predicate — the equi part hash-partitions both
sides, so it scales; the range filter evaluates inside the join. When the
dimension side is small (deployment catalogs always are), broadcast it and
there is no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    facts: DataFrame,
    dims: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_time: str,
    dim_start: str,
    dim_end: str,
    broadcast_dims: bool = True,
    how: str = "inner",
) -> DataFrame:
    """Key + time-range join (J5): fact rows matched to the dimension row
    whose [start, end] window contains the fact timestamp.

    Mirrors the reference's per-deployment fetch predicates
    (``platform_code=`` + ``time>=/<=``,
    ``/root/reference/gdutils/osmc/__init__.py:182-184``) as one relational
    join. Equi part drives the physical strategy (broadcast-hash when dims
    is small); the range is a residual filter inside the join operator.
    """
    d = F.broadcast(dims) if broadcast_dims else dims
    cond = (
        (facts[fact_key] == d[dim_key])
        & (facts[fact_time] >= d[dim_start])
        & (facts[fact_time] <= d[dim_end])
    )
    return facts.join(d, cond, how)


def orphans(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (J8 orphan detection,
    ``/root/reference/gdutils/__init__.py:940-941``) — a left-anti join."""
    return left.join(right, key, "left_anti")


def with_orphan_flag(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """Left join + boolean ``orphaned`` flag (probe-side null ⇒ orphan)."""
    probe = right.select(key).distinct().withColumn("__hit", F.lit(True))
    return (
        left.join(F.broadcast(probe), key, "left")
        .withColumn("orphaned", F.col("__hit").isNull())
        .drop("__hit")
    )


def semi_by_ids(df: DataFrame, key: str, ids: list) -> DataFrame:
    """Membership filter (P7). For literal lists Catalyst folds ``isin`` into
    the scan; for a DataFrame of ids use a left-semi join instead."""
    return df.where(F.col(key).isin(ids))
