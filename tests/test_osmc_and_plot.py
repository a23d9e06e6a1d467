"""DuoProfilesClient facade + ErddapPlotter URL builder + calendar
presentation boundary."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdutils_spark.osmc import DuoProfilesClient, ym_obs_calendar
from gdutils_spark.plot import calendar_to_pandas
from gdutils_spark.plot.plotter import ErddapPlotter

OBS_SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("platform_code", T.StringType()),
        T.StructField("platform_type", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)


@pytest.fixture()
def obs(spark):
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    for d in range(40):  # spans Jan into Feb
        for code in ("4801915", "4802960"):
            ts = t0 + dt.timedelta(days=d, hours=3)
            rows.append((ts, code, "GLIDER", "US", 38.0 + d * 0.1, -73.0))
    # a duplicate fix (the reference dedups server-side via &distinct())
    rows.append(rows[0])
    return spark.createDataFrame(rows, OBS_SCHEMA)


@pytest.fixture()
def deployments(spark):
    return spark.createDataFrame(
        [
            ("ds-a", "4801915", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 10, 23)),
            ("ds-b", "4802960", dt.datetime(2024, 1, 5), dt.datetime(2024, 3, 1)),
            ("ds-none", "None", dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)),
            ("ds-null", None, dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)),
        ],
        ["dataset_id", "wmo_id", "start_date", "end_date"],
    )


def test_get_profiles_by_wmo_id_distinct_window(spark, obs):
    c = DuoProfilesClient(spark, obs)
    out = c.get_profiles_by_wmo_id(
        "4801915", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 5)
    )
    # fixes land at 03:00 Jan 1-4 inside the window; duplicate collapsed
    assert out.count() == 4
    assert set(out.columns) == {"time", "platform_code", "platform_type", "country"}


def test_dataset_profiles_interval_join_skips_missing_wmo(spark, obs, deployments):
    c = DuoProfilesClient(spark, obs)
    out = c.get_dataset_profiles(deployments)
    by_ds = {r["dataset_id"]: r["n"] for r in
             out.groupBy("dataset_id").agg(F.count("*").alias("n")).collect()}
    # ds-a: Jan 1-10 (dup collapsed); ds-b: Jan 5 .. Feb 9 (end of fixes)
    assert by_ds == {"ds-a": 10, "ds-b": 36}
    # gps columns carried through
    assert "latitude" in out.columns


def test_obs_calendar_counts(spark, obs, deployments):
    c = DuoProfilesClient(spark, obs)
    cal = c.get_ym_obs_calendar(deployments)
    rows = {r["year"]: r for r in cal.collect()}
    assert rows[2024]["c01"] == 10 + 27  # ds-a days 1-10 + ds-b Jan days 5-31
    assert rows[2024]["c02"] == 9  # ds-b Feb 1-9 (fixes end Feb 9)


def test_free_function_calendar_matches_client(spark, obs):
    c = DuoProfilesClient(spark, obs)
    c.get_profiles_by_wmo_id("4801915", dt.datetime(2024, 1, 1), dt.datetime(2024, 3, 1))
    a = c.ym_observations_calendar().collect()
    b = ym_obs_calendar(c.obs).collect()
    assert a == b


def test_calendar_to_pandas_shape(spark, obs):
    c = DuoProfilesClient(spark, obs)
    c.get_profiles_by_wmo_id("4801915", dt.datetime(2024, 1, 1), dt.datetime(2024, 3, 1))
    pdf = calendar_to_pandas(c.ymd_observations_calendar())
    assert list(pdf.columns) == list(range(1, 32))
    assert pdf.columns.name == "day"
    assert pdf.index.names == ["year", "month"]
    assert pdf.loc[(2024, 1)].sum() == 31


def test_calendar_to_pandas_empty_calendar(spark):
    # r12 latent-hunt regression: zero-row calendars crashed set_index
    # because key detection looked at contents instead of schema
    empty = spark.createDataFrame([], "year int, month int, c01 bigint, c02 bigint")
    pdf = calendar_to_pandas(empty)
    assert pdf.shape == (0, 2)
    assert list(pdf.index.names) == ["year", "month"]
    assert pdf.columns.name == "month"


# -- ErddapPlotter ----------------------------------------------------------


def test_plotter_url_layout():
    p = ErddapPlotter("https://example.org/erddap")
    p.add_constraint("time>=", "2024-01-01T00:00:00Z")
    url = p.build_image_request("ds-1", "time", "temperature", "salinity")
    assert url.startswith("https://example.org/erddap/tabledap/ds-1.png?")
    assert "time%2C" not in url  # variable list is not percent-encoded
    assert url.split("?")[1].split("&")[0] == "time,temperature,salinity"
    assert "time%3E%3D=" not in url  # constraint keys kept verbatim
    assert "2024-01-01T00%3A00%3A00Z" in url  # values percent-encoded
    assert ".draw=markers" in url
    assert ".bgColor=0xFFFFFF" in url


def test_plotter_setters_validate():
    p = ErddapPlotter("https://example.org/erddap", response="largePng")
    p.set_marker_style("Filled Circle", 7)
    assert p.plot_parameters[".marker="] == "7|7"
    p.set_marker_style("NotAMarker")  # silently ignored like the reference
    assert p.plot_parameters[".marker="] == "7|7"
    p.set_colorbar("KT_thermal", "D", "Log", 0, 30, 10)
    assert p.plot_parameters[".colorBar="] == "KT_thermal|D|Log|0|30|10"
    p.set_zoom("out2")
    assert p.plot_parameters[".zoom="] == "out2"
    p.remove_plot_parameter(".zoom")
    assert ".zoom=" not in p.plot_parameters
    p.reset_plot_params()
    assert p.plot_parameters[".colorBar="] == "Rainbow2|C|Linear|||"
    with pytest.raises(ValueError):
        ErddapPlotter("https://example.org/erddap", response="bmp")


def test_plotter_catalog_validation(spark):
    cat = spark.createDataFrame([("ds-1",), ("ds-2",)], ["dataset_id"])
    p = ErddapPlotter("https://example.org/erddap", catalog=cat)
    assert p.build_image_request("ds-1", "time", "depth")
    with pytest.raises(KeyError):
        p.build_image_request("nope", "time", "depth")


def test_plotter_reference_surface_parity():
    """Every public builder method/property of the reference's
    ErddapPlotter (/root/reference/gdutils/plot/plotter.py:9-515) has a
    counterpart here: same names, same parameter encodings."""
    reference_surface = [
        # properties
        "response", "datasets", "plot_parameters", "constraints",
        "plot_query", "constraints_query", "last_request", "image_url",
        "colorbars",
        # catalog fetch
        "fetch_erddap_datasets",
        # setters
        "set_bg_color", "set_colorbar", "set_marker_color",
        "set_line_style", "set_legend_loc", "set_marker_style",
        "set_x_range", "set_y_range", "set_zoom", "set_trim_pixels",
        # constraint/param management
        "add_constraint", "remove_constraint", "remove_plot_parameter",
        "reset_plot_params",
        # builders
        "build_plot_query_string", "build_constraints_query_string",
        "build_image_request", "download_image",
    ]
    missing = [m for m in reference_surface if not hasattr(ErddapPlotter, m)]
    assert missing == []


def test_plotter_last_request_tracks_builds():
    p = ErddapPlotter("https://example.org/erddap")
    assert p.last_request == ""
    url = p.build_image_request("ds1", "time", "depth", "temperature")
    assert p.last_request == url


def test_param_helpers_match_plotter_encoding():
    """The functional helpers (reference plot/erddap.py:125-206) produce
    exactly the encodings the stateful setters write."""
    from gdutils_spark.plot import params

    p = ErddapPlotter("https://example.org/erddap")
    p.set_colorbar("Ocean", "D", "Log", 0, 30, 10)
    p.set_marker_style("Filled Circle", 7)
    p.set_x_range(1, 2, ascending=False, scale="Log")
    p.set_bg_color("black")
    p.set_legend_loc("Off")
    p.set_line_style("lines")
    expected = {}
    for d in (
        params.set_colorbar("Ocean", "D", "Log", 0, 30, 10),
        params.set_marker_style("Filled Circle", 7),
        params.set_x_range(1, 2, ascending=False, scale="Log"),
        params.set_bg_color("black"),
        params.set_legend_loc("Off"),
        params.set_line_style("lines"),
    ):
        expected.update(d)
    for k, v in expected.items():
        assert p.plot_parameters[k] == v
    # invalid input → empty dict, always mergeable
    assert params.set_colorbar("NotAColorbar") == {}
    assert params.set_marker_style("NotAMarker") == {}


def test_cli_plot_map_and_variable(capsys):
    from gdutils_spark.cli import main

    rc = main([
        "plot-map", "ru29-20240101T0000",
        "--server", "https://example.org/erddap", "--no-legend", "-z", "in2",
    ])
    assert rc == 0
    url = capsys.readouterr().out.strip()
    assert url.startswith(
        "https://example.org/erddap/tabledap/ru29-20240101T0000.largePng?"
    )
    assert "longitude%2Clatitude%2Ctime" in url or "longitude,latitude,time" in url
    assert ".zoom=in2" in url and ".legend=Off" in url and ".trim=10" in url

    rc = main([
        "plot-variable", "ru29-20240101T0000", "temperature",
        "--server", "https://example.org/erddap", "--hours", "12",
    ])
    assert rc == 0
    url = capsys.readouterr().out.strip()
    # functional last-12-hours constraint, server-evaluated
    assert "time%3E%3D" in url or "time>=" in url
    assert "max%28time%29-12hours" in url or "max(time)-12hours" in url

    rc = main([
        "plot-variable", "ru29-20240101T0000", "temperature",
        "--server", "https://example.org/erddap", "--profiles", "--plot-all",
    ])
    assert rc == 0
    url = capsys.readouterr().out.strip()
    assert "temperature%2Cdepth%2Ctime" in url or "temperature,depth,time" in url
