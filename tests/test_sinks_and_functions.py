"""GeoJSON/KML sinks, canned filters, HALF_DOWN rounding."""

from __future__ import annotations

import json
from decimal import ROUND_HALF_DOWN, Decimal

import pytest
from pyspark.sql import functions as F

from gdutils_spark.functions.rounding import round_half_down, round_half_up
from gdutils_spark.operators import filters as flt
from gdutils_spark.sinks import to_csv_string, to_html_table, tracks_to_kml
from gdutils_spark.sinks.geojson import track_geojson, track_geojson_dict
from tests.fixtures import profiles_df, status_df


def test_round_half_down_matches_decimal(spark):
    vals = [0.0015, 0.0025, -0.0015, 1.2345, -1.2345, 38.9995, -74.0005, 0.0, 12.3]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["y"]
        for r in df.select(round_half_down(F.col("x"), 3).alias("y"))
        .collect()
    ]
    want = [
        float(Decimal(str(v)).quantize(Decimal("0.001"), rounding=ROUND_HALF_DOWN))
        for v in vals
    ]
    assert got == want


def test_round_half_up_vs_down_on_tie(spark):
    df = spark.createDataFrame([(0.0015,), (-0.0015,)], "x double")
    r = df.select(
        round_half_down(F.col("x"), 3).alias("d"),
        round_half_up(F.col("x"), 3).alias("u"),
    ).collect()
    assert [x["d"] for x in r] == [0.001, -0.001]
    assert [x["u"] for x in r] == [0.002, -0.002]


def test_track_geojson_shape(spark):
    prof = profiles_df(spark)
    doc = track_geojson_dict(prof, "dataset_id", "blue-20240101T0600", time_col="time")
    assert doc["type"] == "FeatureCollection"
    lon_min, lat_min, lon_max, lat_max = doc["bbox"]
    assert lon_min <= lon_max and lat_min <= lat_max
    line = doc["features"][0]
    assert line["geometry"]["type"] == "LineString"
    coords = line["geometry"]["coordinates"]
    assert len(coords) == 9
    # quantized to 3 decimals, HALF_DOWN: -74.9985 -> -74.998
    assert coords[0] == [-74.998, 36.123]
    # points carry ISO ts properties in time order
    pts = doc["features"][1:]
    assert len(pts) == 9
    assert pts[0]["properties"]["ts"] == "2024-01-01T06:00:00Z"
    ts_list = [p["properties"]["ts"] for p in pts]
    assert ts_list == sorted(ts_list)


def test_track_geojson_no_points(spark):
    prof = profiles_df(spark)
    doc = track_geojson_dict(
        prof, "dataset_id", "blue-20240101T0600", time_col="time", include_points=False
    )
    assert len(doc["features"]) == 1


def test_kml_render(spark):
    prof = profiles_df(spark)
    rows = track_geojson(prof, "dataset_id", time_col="time").collect()
    kml = tracks_to_kml([(r["dataset_id"], r["geojson"]) for r in rows])
    assert kml.startswith('<?xml version="1.0"')
    assert kml.count("<Placemark>") == 4
    assert "-74.998,36.123,0" in kml


def test_kml_null_geometry_and_altitude_coords():
    """GeoJSON allows "geometry": null on a Feature, and positions may
    carry an optional third (altitude) element — neither may crash the
    renderer, and the altitude must survive (latent-hunt r10)."""
    import json

    from gdutils_spark.sinks.kml import tracks_to_kml

    doc = json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "geometry": None, "properties": {}},
                {
                    "type": "Feature",
                    "geometry": {
                        "type": "LineString",
                        "coordinates": [[-70.5, 40.25, 12.5], [-70.6, 40.3]],
                    },
                    "properties": {},
                },
            ],
        }
    )
    kml = tracks_to_kml([("unit&1", doc)])
    assert "-70.5,40.25,12.5" in kml
    assert "-70.6,40.3,0" in kml
    assert "unit&amp;1" in kml


def test_canned_filters(spark):
    df = status_df(spark)
    assert {
        r["dataset_id"] for r in flt.filter_all_real_time(df).collect()
    } == {"unit_191-20231201T0000", "unit_191-20240115T1200"}
    assert {
        r["dataset_id"] for r in flt.filter_all_real_time(df, include_orphaned=True).collect()
    } == {"unit_191-20231201T0000", "unit_191-20240115T1200", "blue-20240101T0600"}
    assert {
        r["dataset_id"] for r in flt.filter_all_delayed_mode(df).collect()
    } == {"blue-20240101T0600-delayed", "ghost-20220301T0000"}
    assert {
        r["dataset_id"] for r in flt.filter_real_time_active(df).collect()
    } == {"unit_191-20240115T1200"}
    assert {
        r["dataset_id"] for r in flt.filter_delayed_mode_inactive(df).collect()
    } == {"blue-20240101T0600-delayed"}
    with pytest.raises(ValueError, match="missing columns"):
        flt.filter_all_real_time(df.drop("orphaned"))


def test_tabular_sinks(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    csv = to_csv_string(df.orderBy("id"))
    assert csv.splitlines()[0] == "id,s"
    html = to_html_table(df)
    assert "<table" in html


def test_normalize_columns_raises_on_collision(spark):
    from gdutils_spark.functions.names import normalize_columns

    df = spark.createDataFrame([(1, 2)], ["My Col", "my_col"])
    with pytest.raises(ValueError, match="collision"):
        normalize_columns(df)
    ok = normalize_columns(spark.createDataFrame([(1, 2)], ["My Col", "Other"]))
    assert ok.columns == ["my_col", "other"]


def test_track_sinks_drop_malformed_fixes(spark):
    """r13 sink hunt: a NaN/NULL coordinate quantizes to NULL and used
    to serialize as `[lon, null]` INSIDE the LineString — silently
    malformed GeoJSON. Malformed fixes (NULL entity/time, NULL/NaN
    coords) are now dropped; well-formed fixes are untouched."""
    import json as _json

    from gdutils_spark.sinks.geojson import track_geojson, track_points

    import datetime as _dt

    def _t(m):
        return _dt.datetime(2024, 1, 1, 0, m)

    rows = [
        ("a", _t(1), 10.0, -70.0),
        ("a", _t(2), float("nan"), -70.5),   # NaN lat -> dropped
        ("a", _t(3), 10.5, None),            # NULL lon -> dropped
        (None, _t(4), 10.6, -70.6),          # NULL entity -> dropped
        ("a", None, 10.7, -70.7),            # NULL time -> dropped
        ("a", _t(5), 11.0, -71.0),
    ]
    df = spark.createDataFrame(
        rows, "id string, time timestamp, latitude double, longitude double"
    )
    pts = track_points(df, "id").collect()
    assert [(r["id"], r["time"].minute) for r in pts] == [("a", 1), ("a", 5)]
    doc = _json.loads(
        track_geojson(df, "id").collect()[0]["geojson"]
    )
    line = next(
        f["geometry"]["coordinates"]
        for f in doc["features"]
        if f["geometry"]["type"] == "LineString"
    )
    assert line == [[-70.0, 10.0], [-71.0, 11.0]]
    assert all(None not in c for c in line)
