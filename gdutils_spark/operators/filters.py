"""Canned catalog predicates (parity with
``/root/reference/gdutils/apis/filters.py:7-160``).

Each is a pure Catalyst filter over a status-catalog DataFrame with boolean
columns ``delayed_mode``, ``completed``, ``orphaned`` — pushed to the scan
by the optimizer. The reference returns an empty frame when required
columns are missing; we raise instead (fail fast beats silent empty)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REQUIRED = ("delayed_mode", "completed", "orphaned")


def _check(df: DataFrame, cols=_REQUIRED) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"catalog frame missing columns: {missing}")


def _orphan_guard(include_orphaned: bool) -> Column:
    return F.lit(True) if include_orphaned else ~F.col("orphaned")


def filter_all_real_time(df: DataFrame, include_orphaned: bool = False) -> DataFrame:
    _check(df)
    return df.where((~F.col("delayed_mode")) & _orphan_guard(include_orphaned))


def filter_all_delayed_mode(df: DataFrame, include_orphaned: bool = False) -> DataFrame:
    _check(df)
    return df.where(F.col("delayed_mode") & _orphan_guard(include_orphaned))


def filter_real_time_active(df: DataFrame, include_orphaned: bool = False) -> DataFrame:
    _check(df)
    return df.where(
        (~F.col("delayed_mode")) & (~F.col("completed")) & _orphan_guard(include_orphaned)
    )


def filter_real_time_inactive(df: DataFrame, include_orphaned: bool = False) -> DataFrame:
    _check(df)
    return df.where(
        (~F.col("delayed_mode")) & F.col("completed") & _orphan_guard(include_orphaned)
    )


def filter_delayed_mode_active(df: DataFrame, include_orphaned: bool = False) -> DataFrame:
    _check(df)
    return df.where(
        F.col("delayed_mode") & (~F.col("completed")) & _orphan_guard(include_orphaned)
    )


def filter_delayed_mode_inactive(
    df: DataFrame, include_orphaned: bool = False
) -> DataFrame:
    _check(df)
    return df.where(
        F.col("delayed_mode") & F.col("completed") & _orphan_guard(include_orphaned)
    )
