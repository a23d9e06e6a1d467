"""Column-name normalization.

The reference lower-snake-cases every incoming column
(``s.replace(' ', '_').lower()`` at
``/root/reference/gdutils/__init__.py:409-410,513-514``). Renames are
plan-level metadata in Spark — zero runtime cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_name(name: str) -> str:
    return name.strip().replace(" ", "_").lower()


def normalize_columns(df: DataFrame) -> DataFrame:
    """Lower-snake-case all column names (no-op columns are left alone)."""
    renames = {c: normalize_name(c) for c in df.columns if c != normalize_name(c)}
    return df.withColumnsRenamed(renames) if renames else df
