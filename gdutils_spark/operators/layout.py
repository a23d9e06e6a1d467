"""Data-layout operators: space-filling-curve (Z-order) clustering keys.

At 100 TB the cheapest query is the one that never reads the data: after
partition pruning, FILE-level skipping via min/max column statistics is
the next lever, and it only works if rows that are close in the filter
dimensions are close in the file layout. Sorting by one column clusters
that column and scatters the others; interleaving the BITS of several
columns (Morton / Z-order — the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``) gives every interleaved dimension locality at
once, so a repartitionByRange + sort on the z-key produces files whose
min/max envelopes are tight rectangles in ALL the clustered dimensions.

Everything here is exact integer arithmetic over DECLARED per-column
[lo, hi) ranges (the same fixed-domain trade-off as the histogram
sketch): quantize each column to ``bits`` bits with the clamp-then-cast
rule, then interleave — deterministic and replayable bit-for-bit by any
engine with shifts, so the layout decision itself is oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Quantize to [0, 2^bits): the histogram bin rule (two IEEE ops +
    floor), clamped on the LONG before any narrowing. NULL input stays
    NULL (greatest/least would otherwise SKIP the NULL and silently
    alias it with the range minimum) — and NaN propagates to NULL the
    same way: Spark's floor(NaN) casts to 0L (the range MINIMUM) while
    an oracle's clamp sends NaN to the top cell, so a NaN measurement
    must route to the dedicated null file, not silently cluster with
    either extreme (the ``hist_registers`` NaN rule). The cast is
    ``try_cast`` and the NULL guard tests the CASTED value: a malformed
    string measurement must yield a NULL key in EVERY session — plain
    cast raises mid-job under ANSI (Spark 4 default) and silently
    NULLs under non-ANSI, where guarding the original column would let
    the NULL double slip through greatest(NULL, 0) = 0 into cell 0."""
    n = 1 << bits
    x = col.try_cast("double")
    raw = F.floor(
        (x - F.lit(float(lo)))
        * F.lit(float(n))
        / (F.lit(float(hi)) - F.lit(float(lo)))
    )
    clamped = F.least(
        F.greatest(raw, F.lit(0).cast("long")), F.lit(n - 1).cast("long")
    )
    return F.when(
        x.isNull() | F.isnan(x), F.lit(None).cast("long")
    ).otherwise(clamped)


def zorder_key(
    specs: Sequence[tuple[Column | str, float, float]],
    bits: int = 8,
) -> Column:
    """Morton/Z-order key for ``specs = [(col, lo, hi), ...]``: each
    column quantizes to ``bits`` bits over its declared range and the
    bits interleave round-robin (dimension i owns bit positions
    ``i, i+d, i+2d, ...``). ``d·bits`` result bits must stay ≤ 62 (the
    cross-engine shift-safe range). A NULL in ANY dimension yields a
    NULL key (a NULL must not silently alias the range minimum — route
    null rows to a dedicated file at write time). Pure codegen integer
    expression — no UDF, no shuffle; pair with
    ``repartitionByRange(zorder)`` + a within-partition sort to cluster
    files for min/max skipping."""
    d = len(specs)
    if d == 0:
        raise ValueError("zorder_key: at least one column spec required")
    if bits <= 0:
        raise ValueError(f"zorder_key: bits={bits} must be positive")
    if d * bits > 62:
        raise ValueError(
            f"zorder_key: {d} dims × {bits} bits = {d * bits} result bits; "
            "must stay ≤ 62 (cross-engine shift safety)"
        )
    for col, lo, hi in specs:
        if hi <= lo:
            raise ValueError(
                f"zorder_key: hi={hi} must exceed lo={lo} for {col!r} "
                "(a degenerate range would divide by zero and collapse "
                "every row into one cell)"
            )
    z = F.lit(0).cast("long")
    for i, (col, lo, hi) in enumerate(specs):
        c = _cell(F.col(col) if isinstance(col, str) else col, lo, hi, bits)
        for b in range(bits):
            # bit b of dimension i lands at position b*d + i
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1).cast("long")),
                    b * d + i,
                )
            )
    return z


def zorder_key_sql(
    specs: Sequence[tuple[str, float, float]],
    bits: int = 8,
) -> str:
    """The IDENTICAL z-key as an ANSI-SQL expression string (for the
    DuckDB oracle replay): same quantize rule, same bit positions, same
    NULL/NaN→NULL rule — both need an explicit CASE in DuckDB, whose
    greatest/least IGNORE a NULL argument (a NULL input would otherwise
    clamp to cell 0) and clamp NaN — which sorts above every value —
    into the TOP cell. TRY_CAST mirrors Spark's non-ANSI cast so a
    non-castable input is NULL-keyed on both sides (DuckDB's plain CAST
    would raise instead)."""
    d = len(specs)
    n = 1 << bits
    terms = []
    for i, (col, lo, hi) in enumerate(specs):
        cell = (
            f"CAST(least(greatest(floor((TRY_CAST({col} AS DOUBLE) "
            f"- CAST({lo} AS DOUBLE)) * CAST({n} AS DOUBLE) "
            f"/ (CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))), "
            f"CAST(0 AS DOUBLE)), CAST({n - 1} AS DOUBLE)) AS BIGINT)"
        )
        cell = (
            f"(CASE WHEN TRY_CAST({col} AS DOUBLE) IS NULL "
            f"OR isnan(TRY_CAST({col} AS DOUBLE)) THEN NULL "
            f"ELSE {cell} END)"
        )
        for b in range(bits):
            terms.append(f"((({cell} >> {b}) & 1) << {b * d + i})")
    return " | ".join(terms)


def zorder_layout_stats(
    df: DataFrame,
    specs: Sequence[tuple[str, float, float]],
    bits: int = 8,
    n_buckets_log2: int = 4,
) -> DataFrame:
    """The proof the z-key clusters: bucket rows by the TOP
    ``n_buckets_log2`` bits of the z-key (the file-assignment a
    range-partitioner would make) and report each bucket's row count and
    per-dimension min/max envelope — the exact statistics a reader's
    min/max skipping consults. Tight envelopes in every dimension =
    effective skipping; a single-column sort would show one tight and
    one full-range dimension. One map + one bucket-keyed aggregate.
    Rows with a NULL in any clustered dimension have no z-key (NULL
    propagates) and are EXCLUDED — at write time they'd go to a
    dedicated null file, not smear a bucket's envelope."""
    d = len(specs)
    if not 0 <= n_buckets_log2 <= d * bits:
        # a negative shift would be Java-masked (shift by (x & 63)) and
        # silently send every row to one garbage bucket
        raise ValueError(
            f"zorder_layout_stats: n_buckets_log2={n_buckets_log2} must be "
            f"in [0, {d * bits}] (the z-key width)"
        )
    z = zorder_key(specs, bits)
    shift = d * bits - n_buckets_log2
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, _lo, _hi in specs:
        aggs.append(F.min(col).alias(f"min_{col}"))
        aggs.append(F.max(col).alias(f"max_{col}"))
    return (
        df.select(F.shiftright(z, shift).alias("bucket"), *[s[0] for s in specs])
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(*aggs)
    )
