"""Gap-based sessionization over event streams.

Beyond-reference extension: the reference's "recent data" pattern
(/root/reference/scripts/dac/search_datasets.py:21-42) re-polls with a time
cutoff but never groups activity into sessions; training-data and product
analytics pipelines need it constantly (user sessions, instrument
deployments, conversation turns).

Batch implementation: two window passes partitioned by entity —

1. ``lag(ts)`` marks rows whose gap from the previous event exceeds the
   threshold (session starts),
2. a running sum of the start markers numbers the sessions.

Both windows share ONE partitioning (entity) and ordering (ts), so Spark
plans a single sort + shuffle on ``entity`` — at 100 TB this scales with
the number of entities, not total rows, and each entity's events sort
within a partition (spillable). The streaming analogue is
``session_window(ts, gap)`` in Structured Streaming (see
gdutils_spark/streaming), which maintains the same semantics incrementally
with watermark-bounded state.

All arithmetic is integer micros (``unix_micros``), so any SQL engine
reproduces session boundaries exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign ``session_idx`` (1-based per entity, in time order) to every
    row. A new session starts when the gap from the previous event of the
    same entity exceeds ``gap_minutes`` (strictly), or at the entity's
    first event.

    Rows with a NULL entity or NULL timestamp are DROPPED (the
    entity_gap_report convention): a NULL timestamp sorts first and its
    NULL lag-delta would otherwise mark BOTH itself and the first real
    event as session starts, inflating every later session_idx for that
    entity."""
    if gap_minutes < 1:
        raise ValueError(f"sessionize: gap_minutes={gap_minutes} must be >= 1")
    gap_us = gap_minutes * 60 * 1_000_000
    df = df.where(F.col(entity_col).isNotNull() & F.col(time_col).isNotNull())
    w = Window.partitionBy(entity_col).orderBy(time_col)
    t_us = F.unix_micros(F.col(time_col))
    prev_us = F.lag(t_us).over(w)
    is_start = F.when(
        prev_us.isNull() | ((t_us - prev_us) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(entity_col).orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(is_start).over(running))


def session_stats(
    df: DataFrame,
    entity_col: str = "user_id",
    time_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregate: bounds, event count, exact-micros duration,
    and (optionally) a DECIMAL-routed value sum."""
    s = sessionize(df, entity_col, time_col, gap_minutes)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("started_at"),
        F.max(time_col).alias("ended_at"),
        (
            F.unix_micros(F.max(time_col)) - F.unix_micros(F.min(time_col))
        ).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return s.groupBy(entity_col, "session_idx").agg(*aggs)
