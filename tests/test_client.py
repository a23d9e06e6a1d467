"""GdacClient facade semantics against the FIXTURES.md-shaped fixtures,
with pandas-computed expectations mirroring the reference's logic."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from gdutils_spark.client import GdacClient
from tests.fixtures import catalog_df, profiles_df, status_df, timeseries_df


@pytest.fixture()
def client(spark) -> GdacClient:
    c = GdacClient(
        spark,
        catalog=catalog_df(spark),
        profiles=profiles_df(spark),
        timeseries=timeseries_df(spark),
    )
    c.search_datasets()
    return c


def test_search_drops_alldatasets_and_delayed(client):
    ids = client.dataset_ids
    assert "allDatasets" not in ids
    assert not any(i.endswith("delayed") for i in ids)
    assert len(ids) == 3


def test_search_include_delayed(spark):
    c = GdacClient(spark, catalog_df(spark), profiles_df(spark))
    c.search_datasets(include_delayed_mode=True)
    assert any(i.endswith("delayed") for i in c.dataset_ids)


def test_search_invalid_kwarg(spark):
    c = GdacClient(spark, catalog_df(spark), profiles_df(spark))
    with pytest.raises(ValueError, match="invalid search kwargs"):
        c.search_datasets({"bogus": 1})


def test_search_free_text(spark):
    c = GdacClient(spark, catalog_df(spark), profiles_df(spark))
    c.search_datasets({"search_for": "gulf stream"})
    assert c.dataset_ids == ["blue-20240101T0600"]


def test_search_time_bounds(spark):
    c = GdacClient(spark, catalog_df(spark), profiles_df(spark))
    c.search_datasets({"min_time": "2024-01-01"})
    summaries = {
        r["dataset_id"]: r for r in c.datasets_summaries.collect()
    }
    # the December deployment still appears but only with its January fixes
    assert summaries["unit_191-20231201T0000"]["start_date"] >= dt.datetime(2024, 1, 1)


def test_summaries_match_reference_semantics(client):
    """summary row mirrors /root/reference/gdutils/__init__.py:591-614."""
    rows = {r["dataset_id"]: r for r in client.datasets_summaries.collect()}
    r = rows["unit_191-20231201T0000"]
    assert r["glider"] == "unit_191"
    assert r["wmo_id"] == "4801915"
    assert r["num_profiles"] == 32
    # 8 days x 4 profiles, first 2023-12-28 01:30, last 2024-01-04 19:30
    assert r["start_date"] == dt.datetime(2023, 12, 28, 1, 30)
    assert r["end_date"] == dt.datetime(2024, 1, 4, 19, 30)
    span_days = math.ceil(
        (r["end_date"] - r["start_date"]).total_seconds() / 86400
    )
    assert r["days"] == span_days == 8
    # first-fix (min_by time) deployment position
    assert r["deployment_lat"] == pytest.approx(38.0)
    assert r["deployment_lon"] == pytest.approx(-73.0)
    assert r["lat_min"] == pytest.approx(38.0)
    assert r["lat_max"] == pytest.approx(38.0 + 0.01 * 31)


def test_datasets_join(client):
    df = client.datasets
    assert "title" in df.columns and "glider" in df.columns
    assert "griddap" not in df.columns and "wms" not in df.columns
    assert df.count() == 3


def test_yearly_counts(client):
    rows = {r["year"]: r for r in client.yearly_counts.collect()}
    # 2023: only unit_191 Dec deployment, days 12-28..12-31 = 4 glider days
    assert rows[2023]["deployments"] == 1
    assert rows[2023]["glider_days"] == 4
    # profiles in 2023: 4 days x 4 = 16
    assert rows[2023]["profiles"] == 16
    assert rows[2024]["deployments"] == 3


def test_calendar_shapes(client):
    ymd = client.ymd_profiles_calendar.collect()
    # rows: (2023,12), (2024,1)
    assert {(r["year"], r["month"]) for r in ymd} == {(2023, 12), (2024, 1)}
    cols = client.ymd_profiles_calendar.columns
    assert cols[:2] == ["year", "month"] and len(cols) == 33
    # 4 profiles on Dec 28
    dec = next(r for r in ymd if r["year"] == 2023)
    assert dec["c28"] == 4 and dec["c01"] == 0


def test_deployments_calendar_any_semantics(client):
    ym = {r["year"]: r for r in client.ym_deployments_calendar.collect()}
    # Jan 2024: all 3 datasets active at some point
    assert ym[2024]["c01"] == 3
    assert ym[2023]["c12"] == 1


def test_wide_matrices(client):
    wide = client.datasets_profiles
    assert set(wide.columns) == {"date"} | set(client.dataset_ids)
    days = client.datasets_days
    first = days.orderBy("date").first()
    assert first["date"] == dt.date(2023, 12, 28)


def test_get_dataset_profiles_sorted(client):
    times = [r["time"] for r in client.get_dataset_profiles("blue-20240101T0600").collect()]
    assert times == sorted(times) and len(times) == 9


def test_time_series_pushdown(client):
    ts = client.get_dataset_time_series(
        "unit_191-20231201T0000",
        ["temperature"],
        min_time="2023-12-29",
        max_time="2023-12-30",
    )
    assert ts.columns == ["dataset_id", "precise_time", "depth", "temperature"]
    rows = ts.collect()
    assert rows and all(
        dt.datetime(2023, 12, 29) <= r["precise_time"] <= dt.datetime(2023, 12, 30)
        for r in rows
    )


def test_check_dataset_exists(client):
    assert client.check_dataset_exists("blue-20240101T0600")
    assert not client.check_dataset_exists("nope-20200101T0000")


def test_merge_with_api_orphans(spark, client):
    import pyspark.sql.functions as F

    api = status_df(spark).select(F.col("dataset_id"))
    merged = client.merge_with_api(api, merge_all=True)
    flags = {r["dataset_id"]: r["orphaned"] for r in merged.collect()}
    assert flags["ghost-20220301T0000"] is True
    assert flags["unit_191-20231201T0000"] is False


def test_dataset_info_card(client):
    card = client.dataset_info_card("unit_191-20231201T0000")
    assert list(card.columns) == ["unit_191-20231201T0000"]
    assert "num_profiles" in card.index
    import pytest as _pytest

    with _pytest.raises(KeyError):
        client.dataset_info_card("nope")


def test_kml_escapes_xml_special_characters():
    """A dataset id or document name containing XML specials must render
    as entities — raw '&'/'<' breaks every downstream KML parser."""
    import json

    from gdutils_spark.sinks.kml import tracks_to_kml

    gj = json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {
                    "geometry": {
                        "type": "LineString",
                        "coordinates": [[-73.0, 38.0], [-73.1, 38.1]],
                    }
                }
            ],
        }
    )
    kml = tracks_to_kml([("r&d <glider>", gj)], name='A & B "tracks"')
    assert "r&amp;d &lt;glider&gt;" in kml
    assert "A &amp; B" in kml
    assert "r&d" not in kml
    import xml.dom.minidom

    xml.dom.minidom.parseString(kml)  # well-formed
