"""Sinks: tabular exports (K1-K3), GeoJSON (K4), KML (K5).

Tabular sinks write distributed for large results; driver-side variants
(`*_string`) exist for small report outputs, matching the reference's
pandas ``to_csv``/``to_json``/``to_html``
(``/root/reference/scripts/dac/search_datasets.py:60-72``)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from gdutils_spark.sinks.geojson import track_geojson, track_geojson_dict
from gdutils_spark.sinks.kml import tracks_to_kml


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K1 CSV sink; ``single_file`` coalesces for small report outputs."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K2 JSON-records sink."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def to_csv_string(df: DataFrame) -> str:
    """Driver-side CSV (small results only — reports, summaries)."""
    return df.toPandas().to_csv(index=False)


def to_json_records(df: DataFrame) -> str:
    return df.toPandas().to_json(orient="records")


def to_html_table(df: DataFrame) -> str:
    """K3 HTML report sink."""
    return df.toPandas().to_html(index=False)


__all__ = [
    "track_geojson",
    "track_geojson_dict",
    "tracks_to_kml",
    "write_csv",
    "write_json",
    "to_csv_string",
    "to_json_records",
    "to_html_table",
]
