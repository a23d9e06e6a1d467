"""Scalar function helpers (all Catalyst expressions — no Python UDFs)."""

from gdutils_spark.functions.names import normalize_columns, normalize_name
from gdutils_spark.functions.rounding import round_half_down, round_half_up, quantize_coord
from gdutils_spark.functions.glider import glider_from_dataset_id

__all__ = [
    "normalize_columns",
    "normalize_name",
    "round_half_down",
    "round_half_up",
    "quantize_coord",
    "glider_from_dataset_id",
]
