"""Rounding modes the reference uses that Spark lacks as built-ins.

The reference quantizes GeoJSON/bbox coordinates with python ``Decimal``
ROUND_HALF_DOWN (``/root/reference/gdutils/geojson.py:53-56,83-86``) and a
HALF_DOWN/HALF_UP mix for bbox min/max
(``/root/reference/scripts/catalog_dac_datasets.py:75-80``). Spark's
``round`` is HALF_UP and ``bround`` is HALF_EVEN — neither matches
(SURVEY.md §7 trap 1).

We build HALF_DOWN from ceil/floor on *decimal-cast* inputs so tie detection
is exact (no float 1.4999999 artifacts), entirely in Catalyst expressions —
no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scaled(col: Column, ndigits: int) -> Column:
    # decimal(30,15) holds any coordinate-like value exactly enough for a
    # tie test at <=9 digits; multiply by 10^n stays in decimal domain.
    return col.cast("decimal(30,15)") * F.lit(10**ndigits).cast("decimal(20,0)")


def round_half_down(col: Column, ndigits: int = 3) -> Column:
    """Round half toward zero (Decimal ROUND_HALF_DOWN), returns double."""
    z = _scaled(col, ndigits)
    q = F.when(z >= 0, F.ceil(z - F.lit(0.5))).otherwise(F.floor(z + F.lit(0.5)))
    return (q / F.lit(10**ndigits)).cast("double")


def round_half_up(col: Column, ndigits: int = 3) -> Column:
    """Round half away from zero (Decimal ROUND_HALF_UP), returns double.

    Same as Spark ``F.round`` but decimal-exact on the tie test.
    """
    z = _scaled(col, ndigits)
    q = F.when(z >= 0, F.floor(z + F.lit(0.5))).otherwise(F.ceil(z - F.lit(0.5)))
    return (q / F.lit(10**ndigits)).cast("double")


def quantize_coord(col: Column, ndigits: int = 3, mode: str = "half_down") -> Column:
    """Coordinate quantization used by the GeoJSON sink (default HALF_DOWN,
    3 decimals, per ``/root/reference/gdutils/geojson.py:53-56``)."""
    if mode == "half_down":
        return round_half_down(col, ndigits)
    if mode == "half_up":
        return round_half_up(col, ndigits)
    raise ValueError(f"unknown rounding mode: {mode!r}")
