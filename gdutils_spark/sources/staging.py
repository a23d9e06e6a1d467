"""Staged-table helpers: bucketing for co-located joins, salting for skew.

The reference has no storage layout at all (every query re-fetches CSV
over HTTP); at 100 TB the dominant cost of repeated fact-fact joins is
the shuffle, and these helpers are the two standard levers:

* **Bucketing** — persist both join sides bucketed+sorted on the join
  key; subsequent joins read co-located buckets and plan a SortMergeJoin
  with ZERO Exchange (verified in tests/test_staging.py by plan
  inspection). This is the "pre-partition once, join many times" pattern
  for pipelines that repeatedly join on the same key.
* **Salting** — for skewed keys (one glider/platform with 100× the
  observations), explode the dimension side S ways and scatter the fact
  side with a deterministic salt, so the hot key's rows spread over S
  tasks instead of one straggler. AQE's skew-join handles moderate skew
  at runtime; salting is the explicit fix when a single key exceeds what
  one task can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    Joins/aggregations on ``key`` between tables staged with the same
    bucket count then require no shuffle: the scan's output partitioning
    already satisfies the join's distribution requirement. ``path`` makes
    it an external table (otherwise the session warehouse is used —
    bucketing metadata requires the catalog, plain ``.parquet(path)``
    would lose it).
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_staged(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def stage_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | str,
) -> None:
    """Persist ``df`` hive-partitioned on ``partition_cols`` (typically a
    derived date column).

    Queries filtering on the partition column then scan ONLY matching
    directories — the explain shows the predicate under
    ``PartitionFilters`` and the scan's file count drops proportionally.
    For the 100 TB obs table, partitioning by date makes every
    time-window query (the reference's dominant access pattern,
    ``min_time=now-24h``) touch one day's files instead of the full
    corpus.
    """
    cols = [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    if not cols:
        # partitionBy() with no columns writes a flat unpartitioned
        # layout — every "partition-pruned" query would silently scan
        # the full corpus, the exact failure this helper exists to stop
        raise ValueError("stage_partitioned: partition_cols must be non-empty")
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted ``salts`` ways.

    The dimension side is exploded ×S (it is the small side — S copies of
    a dim are still tiny), the fact side gets a deterministic per-row
    salt, and the join key becomes (key, salt): a key owning 50% of the
    fact table now lands on S tasks instead of one.

    The salt derives from ``xxhash64`` of the whole fact row (column
    list), so it is deterministic across retries — no RNG, no
    monotonically_increasing_id instability.

    Only fact-preserving join types are accepted (inner / left /
    left_semi / left_anti): the dim side exists ×S, so any join that
    emits unmatched DIM rows (right/full) would surface each one S
    times — a silent row-multiplication bug, rejected loudly instead.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched dim rows "
            f"x{salts} (the dim side is exploded); use inner/left/"
            "left_semi/left_anti, or swap the sides"
        )
    if salts < 1:
        # explode(array()) drops every dim row: inner/semi go silently
        # EMPTY and anti keeps every fact row — all confidently wrong
        raise ValueError(f"salted_join: salts={salts} must be >= 1")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(salts))
    f = facts.withColumn("__salt", salt.cast("int"))
    d = dims.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")
