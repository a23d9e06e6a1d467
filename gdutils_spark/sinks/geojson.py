"""GeoJSON track sink (K4), Spark-native.

Mirrors the reference's FeatureCollection shape
(``/root/reference/gdutils/geojson.py:29-86``): bbox
``[lon_min, lat_min, lon_max, lat_max]``, one LineString of time-ordered
``[lon, lat]`` fixes, optional one Point per fix with an ISO ``ts``
property. Coordinates quantized to 3 decimals with Decimal
ROUND_HALF_DOWN semantics (our :func:`round_half_down` expression).

Spark-first: the reference iterates rows in Python on the driver; here the
whole document is assembled per entity on EXECUTORS — quantize (map),
groupBy(entity) with sort_array(collect_list(struct)) for the time order,
then JSON via string/`to_json` expressions. One shuffle on the entity key;
the driver never sees per-fix rows. A 100 TB corpus of tracks renders as
one distributed job writing one JSON document per entity.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdutils_spark.functions.rounding import round_half_down


def _quantized_fixes(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    lat_col: str,
    lon_col: str,
    ndigits: int,
) -> DataFrame:
    # null-strict (r13 sink hunt): a fix with no entity, no timestamp,
    # or a NULL/NaN coordinate is not a fix — quantization maps NaN to
    # NULL, so an unfiltered row would otherwise serialize as
    # `[lon, null]` INSIDE the LineString: silently malformed GeoJSON
    # that every downstream parser (including our own KML renderer)
    # chokes on
    q = df.select(
        F.col(entity_col).alias("entity"),
        F.col(time_col).alias("t"),
        round_half_down(F.col(lat_col), ndigits).alias("lat"),
        round_half_down(F.col(lon_col), ndigits).alias("lon"),
    )
    return q.where(
        F.col("entity").isNotNull()
        & F.col("t").isNotNull()
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    )


def track_points(
    df: DataFrame,
    entity_col: str,
    time_col: str = "time",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    ndigits: int = 3,
) -> DataFrame:
    """Flattened track fixes: (entity, seq, t, lon, lat), quantized and
    time-ordered with the SAME semantics the GeoJSON/KML sinks use
    (``sort_array`` over a (t, lon, lat) struct), so the quantization and
    ordering are hash-verifiable relationally without parsing JSON."""
    fixes = _quantized_fixes(df, entity_col, time_col, lat_col, lon_col, ndigits)
    agg = fixes.groupBy("entity").agg(
        F.sort_array(F.collect_list(F.struct("t", "lon", "lat"))).alias("pts")
    )
    p = agg.select("entity", F.posexplode("pts").alias("seq", "pt"))
    return p.select(
        F.col("entity").alias(entity_col),
        "seq",
        F.col("pt.t").alias(time_col),
        F.col("pt.lon").alias("lon"),
        F.col("pt.lat").alias("lat"),
    )


def track_geojson(
    df: DataFrame,
    entity_col: str,
    time_col: str = "time",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    ndigits: int = 3,
    include_points: bool = True,
) -> DataFrame:
    """One row per entity: (entity, geojson string).

    The coordinate order inside the LineString is the time order
    (``sort_array`` on a struct keyed by the timestamp — deterministic,
    no global orderBy needed).
    """
    fixes = _quantized_fixes(df, entity_col, time_col, lat_col, lon_col, ndigits)
    agg = fixes.groupBy("entity").agg(
        F.sort_array(F.collect_list(F.struct("t", "lon", "lat"))).alias("pts"),
        F.min("lat").alias("_lat_min"),
        F.max("lat").alias("_lat_max"),
        F.min("lon").alias("_lon_min"),
        F.max("lon").alias("_lon_max"),
    )
    # bbox from the already-quantized coords: min/max commute with the
    # monotone rounding, so min(round(x)) == round(min(x)) — same values
    # the reference gets by quantizing the raw extrema
    bbox = F.array("_lon_min", "_lat_min", "_lon_max", "_lat_max")
    line_coords = F.transform(F.col("pts"), lambda p: F.array(p.lon, p.lat))
    linestring = F.concat(
        F.lit('{"type": "Feature", "geometry": {"type": "LineString", "coordinates": '),
        F.to_json(line_coords),
        F.lit('}, "properties": {}}'),
    )
    point_jsons = F.transform(
        F.col("pts"),
        lambda p: F.concat(
            F.lit('{"type": "Feature", "geometry": {"type": "Point", "coordinates": '),
            F.to_json(F.array(p.lon, p.lat)),
            F.lit('}, "properties": {"ts": "'),
            F.date_format(p.t, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
            F.lit('"}}'),
        ),
    )
    features = (
        F.concat(linestring, F.lit(", "), F.concat_ws(", ", point_jsons))
        if include_points
        else linestring
    )
    geojson = F.concat(
        F.lit('{"type": "FeatureCollection", "bbox": '),
        F.to_json(bbox),
        F.lit(', "features": ['),
        features,
        F.lit("]}"),
    )
    return agg.select(F.col("entity").alias(entity_col), geojson.alias("geojson"))


def track_geojson_dict(
    df: DataFrame,
    entity_col: str,
    entity: object,
    **kwargs,
) -> dict:
    """Driver-side convenience: the parsed GeoJSON dict for one entity
    (API parity with ``latlon_to_geojson_track``,
    ``/root/reference/gdutils/geojson.py:29-42``)."""
    row = (
        track_geojson(df.where(F.col(entity_col) == entity), entity_col, **kwargs)
        .limit(1)
        .collect()
    )
    if not row:
        return {}
    return json.loads(row[0]["geojson"])
