"""Operator library: calendar pivots, summaries, joins, dedup, similarity,
text analysis, multimodal plumbing."""

from gdutils_spark.operators.calendar import (
    calendar,
    calendar_dense,
    calendar_long,
    month_spine,
)
from gdutils_spark.operators.summaries import (
    daily_stats,
    deployment_days,
    entity_summaries,
)
from gdutils_spark.operators.joins import (
    interval_join,
    orphans,
    semi_by_ids,
    with_orphan_flag,
)

__all__ = [
    "calendar",
    "calendar_dense",
    "calendar_long",
    "month_spine",
    "daily_stats",
    "deployment_days",
    "entity_summaries",
    "interval_join",
    "orphans",
    "semi_by_ids",
    "with_orphan_flag",
]
