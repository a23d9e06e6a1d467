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
    """Lower-snake-case all column names (no-op columns are left alone).

    Raises when two input columns normalize to the SAME name ("My Col"
    next to "my_col"): Spark happily carries duplicate column names and
    only fails later with AMBIGUOUS_REFERENCE at some distant select —
    the guard turns that into an immediate, attributable error."""
    normalized = [normalize_name(c) for c in df.columns]
    dupes = {n for n in normalized if normalized.count(n) > 1}
    if dupes:
        clashes = {n: [c for c in df.columns if normalize_name(c) == n] for n in dupes}
        raise ValueError(f"normalize_columns: name collisions after normalization: {clashes}")
    renames = {c: normalize_name(c) for c in df.columns if c != normalize_name(c)}
    return df.withColumnsRenamed(renames) if renames else df
