"""The calendar pivot family — the signature operator of the reference.

The reference has 15+ near-identical groupby-unstack-reindex pivots
(``/root/reference/gdutils/__init__.py:160-359,648-735``;
``/root/reference/gdutils/osmc/calendar.py:8-81``;
``/root/reference/gdutils/io.py:100-127``): group a datetime-keyed series by
calendar parts, unstack the last part into columns, reindex to dense axes
(days 1–31 / months 1–12), sort, name axes. Note the reference's own dense
row reindex is a no-op bug (result discarded,
``/root/reference/gdutils/__init__.py:166-169``); we implement the intended
semantics.

Spark-first collapse into ONE parameterized operator:

* the wide matrix is built with ONE conditional aggregation
  (``count(when(day = v, 1))`` per dense column) instead of
  ``DataFrame.pivot`` — Spark's pivot compiles to a *double* aggregation
  (groupBy keys+pivot → shuffle → pivotfirst → shuffle); the conditional
  agg is a single partial+final hash-agg pair, i.e. one shuffle, with
  map-side combine collapsing 100 TB of input to (years × 12) rows per
  task before the exchange. Dense, ordered columns fall out for free.
* dense *rows* come from a date spine built with ``sequence``+``explode`` —
  declarative, no driver-side date_range materialization.
* "deployments" semantics (count a dataset once per period if it has ANY
  activity — pandas ``.any()`` at ``/root/reference/gdutils/__init__.py:
  294-296``) maps to ``countDistinct(dataset_id)``, NOT ``sum`` (SURVEY.md
  §7 trap 2).

Scale note: the output of a calendar is tiny (years × 12 rows) regardless of
input size, so the plan is scan → partial agg (map-side combine) → one
shuffle → final agg. No collect until the presentation layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DAYS = list(range(1, 32))
MONTHS = list(range(1, 13))

# (row_keys, pivot_key, dense pivot values) per calendar variant
_VARIANTS = {
    "ymd": (("year", "month"), "day", DAYS),
    "ym": (("year",), "month", MONTHS),
    "md": (("month",), "day", DAYS),
}


def _with_parts(df: DataFrame, time_col: str) -> DataFrame:
    t = F.col(time_col)
    # NULL timestamps are dropped, matching the reference: pandas
    # groupby(dropna=True, the default) silently drops NaT-keyed rows
    # (/root/reference/gdutils/__init__.py:160-169), whereas a Spark
    # groupBy would emit a (NULL, NULL, NULL)-keyed calendar row
    return df.where(t.isNotNull()).withColumns(
        {
            "year": F.year(t),
            "month": F.month(t),
            "day": F.dayofmonth(t),
        }
    )


def _agg_expr(kind: str, value_col: str | None, distinct_col: str | None) -> Column:
    if kind == "count":
        return F.count(F.lit(1))
    if kind == "sum":
        return F.sum(value_col)
    if kind == "any":  # deployments semantics: any activity → count entity once
        return F.count_distinct(F.col(distinct_col))
    raise ValueError(f"unknown calendar agg kind: {kind!r}")


def calendar_long(
    df: DataFrame,
    time_col: str,
    variant: str = "ymd",
    agg: str = "count",
    value_col: str | None = None,
    distinct_col: str | None = None,
    alias: str = "value",
) -> DataFrame:
    """Long-form calendar: one row per (row_keys..., pivot_key) with the
    aggregate. This is the scale-friendly shape (stays distributed); use
    :func:`calendar` for the wide presentation matrix."""
    row_keys, col_key, _ = _VARIANTS[variant]
    parts = _with_parts(df, time_col)
    keys = [*row_keys, col_key]
    return parts.groupBy(*keys).agg(
        _agg_expr(agg, value_col, distinct_col).alias(alias)
    )


def calendar(
    df: DataFrame,
    time_col: str,
    variant: str = "ymd",
    agg: str = "count",
    value_col: str | None = None,
    distinct_col: str | None = None,
    fill: object = 0,
) -> DataFrame:
    """Wide calendar matrix with dense, ordered pivot columns.

    Columns are named ``c01..c31`` (or ``c01..c12``) so downstream SQL and
    the duckdb oracle can refer to them stably.

    Implementation: one conditional aggregate per dense column — a single
    partial+final hash agg (one shuffle), unlike ``DataFrame.pivot`` which
    plans two aggregation rounds. For ``agg='any'`` (deployments
    semantics) a distinct pre-pass on (keys, col, entity) replaces 31
    ``count_distinct`` aggregates — avoiding the Expand node that would
    multiply 100 TB of input ×31.
    """
    row_keys, col_key, dense_vals = _VARIANTS[variant]
    parts = _with_parts(df, time_col)
    c = F.col(col_key)
    if agg == "any":
        # dedupe (period, day, entity) first; each survivor then counts 1
        parts = parts.select(*row_keys, col_key, distinct_col).where(
            F.col(distinct_col).isNotNull()
        ).distinct()
        cell = lambda v: F.count(F.when(c == v, 1))  # noqa: E731
    elif agg == "count":
        cell = lambda v: F.count(F.when(c == v, 1))  # noqa: E731
    elif agg == "sum":
        cell = lambda v: F.sum(F.when(c == v, F.col(value_col)))  # noqa: E731
    else:
        raise ValueError(f"unknown calendar agg kind: {agg!r}")
    wide = parts.groupBy(*row_keys).agg(
        *[cell(v).alias(f"c{v:02d}") for v in dense_vals]
    )
    if fill is not None:
        value_cols = [f"c{v:02d}" for v in dense_vals]
        wide = wide.na.fill(fill, subset=value_cols)
    return wide.orderBy(*row_keys)


def month_spine(df: DataFrame, time_col: str) -> DataFrame:
    """Dense (year, month) spine spanning [min, max] of ``time_col``.

    Declarative replacement for the reference's
    ``MultiIndex.from_product(years, months)`` reindex
    (``/root/reference/gdutils/__init__.py:166-169``): the bounds row is a
    1-row aggregate, the spine is ``sequence`` + ``explode`` — no driver
    date_range, broadcast-joinable against the calendar result.
    """
    bounds = df.agg(
        F.min(F.to_date(time_col)).alias("lo"), F.max(F.to_date(time_col)).alias("hi")
    )
    return bounds.select(
        F.explode(
            F.sequence(
                F.trunc("lo", "month"),
                F.trunc("hi", "month"),
                F.expr("interval 1 month"),
            )
        ).alias("d")
    ).select(F.year("d").alias("year"), F.month("d").alias("month"))


def calendar_dense(
    df: DataFrame,
    time_col: str,
    variant: str = "ymd",
    agg: str = "count",
    value_col: str | None = None,
    distinct_col: str | None = None,
    fill: object = 0,
) -> DataFrame:
    """Wide calendar left-joined onto the dense month spine, so months with
    no data appear as fill rows (the reference's *intended* reindex)."""
    row_keys, _, _ = _VARIANTS[variant]
    wide = calendar(df, time_col, variant, agg, value_col, distinct_col, fill=fill)
    spine = month_spine(df, time_col)
    if variant == "ym":
        spine = spine.select("year").distinct()
    elif variant == "md":
        spine = spine.select("month").distinct()
    out = spine.join(F.broadcast(wide), on=list(row_keys), how="left")
    if fill is not None:
        value_cols = [c for c in out.columns if c not in row_keys]
        out = out.na.fill(fill, subset=value_cols)
    return out.orderBy(*row_keys)
