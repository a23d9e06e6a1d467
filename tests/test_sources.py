"""CSV/JSON source adapters: units-row drop, filename-derived ids, REST
type coercions."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import types as T

from gdutils_spark.sources.csv import read_dataset_csv_batch, read_erddap_csv
from gdutils_spark.sources.rest import read_json_records

PROFILE_CSV = """time,latitude,longitude,profile_id
UTC,degrees_north,degrees_east,1
2024-01-01T00:00:00Z,38.5,-73.2,1
2024-01-01T06:00:00Z,38.6,-73.1,2
"""

SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("profile_id", T.LongType()),
    ]
)


@pytest.fixture()
def csv_dir():
    d = tempfile.mkdtemp(prefix="erddap_csv_")
    for name in ("unit_191-20231201T0000.csv", "blue-20240101T0600-profiles.csv"):
        with open(os.path.join(d, name), "w") as f:
            f.write(PROFILE_CSV)
    yield d


def test_units_row_dropped(spark, csv_dir):
    df = read_erddap_csv(
        spark, os.path.join(csv_dir, "unit_191-20231201T0000.csv"), schema=SCHEMA
    )
    rows = df.collect()
    assert len(rows) == 2  # units row gone
    assert rows[0]["latitude"] in (38.5, 38.6)


def test_column_name_normalization(spark):
    d = tempfile.mkdtemp()
    p = os.path.join(d, "x.csv")
    with open(p, "w") as f:
        f.write("Dataset ID,Some Col\na,1\n")
    df = read_erddap_csv(spark, p, time_column="nope", drop_units_row=False)
    assert df.columns == ["dataset_id", "some_col"]


def test_csv_batch_filename_ids(spark, csv_dir):
    """S9: dataset_id from filename, whole glob = one job
    (/root/reference/gdutils/io.py:11-53 without the per-file loop)."""
    df = read_dataset_csv_batch(spark, os.path.join(csv_dir, "*.csv"), schema=SCHEMA)
    ids = {r["dataset_id"] for r in df.select("dataset_id").distinct().collect()}
    assert ids == {"unit_191-20231201T0000", "blue-20240101T0600"}
    assert df.count() == 4


def test_rest_json_coercions(spark):
    """S7/S8 typed coercions (/root/reference/gdutils/apis/dac.py:28-44,
    /root/reference/gdutils/apis/status.py:16-54)."""
    records = [
        {
            "name": "a-20240101T0000",
            "completed": True,
            "delayed_mode": None,
            "created": 1704067200000,
            "start_date": "2024-01-01 00:00:00",
            "num_profiles": None,
            "deployment_lat": 38.5,
            "tabledap": "http://x",
        },
        {
            "name": "b-20240101T0000",
            "completed": None,
            "delayed_mode": True,
            "created": None,
            "start_date": "not a date",
            "num_profiles": 12,
            "deployment_lat": None,
            "tabledap": None,
        },
    ]
    df = read_json_records(
        spark,
        records,
        bool_columns=("completed", "delayed_mode"),
        epoch_ms_columns=("created",),
        timestamp_columns=("start_date",),
        int_columns=("num_profiles",),
        float_columns=("deployment_lat",),
        null_flag_column=("orphaned", "tabledap"),
    )
    rows = {r["name"]: r for r in df.collect()}
    a, b = rows["a-20240101T0000"], rows["b-20240101T0000"]
    assert a["completed"] is True and a["delayed_mode"] is False  # null → False
    assert b["completed"] is False and b["delayed_mode"] is True
    assert str(a["created"]).startswith("2024-01-01")
    assert b["created"] is None
    assert b["start_date"] is None  # coerce failure → NULL
    assert a["num_profiles"] == 0 and b["num_profiles"] == 12  # null → 0
    assert a["orphaned"] is False and b["orphaned"] is True


def test_erddap_csv_inferred_schema_still_drops_units_row(spark, tmp_path):
    """Without an explicit schema the units row pollutes type inference
    (time infers as STRING, 'UTC' is a valid string) — the IS NOT NULL
    drop silently kept the units row. The string-typed path must filter
    via try_to_timestamp instead."""
    from gdutils_spark.sources.csv import read_erddap_csv

    p = tmp_path / "unit.csv"
    p.write_text(
        "time,temperature\n"
        "UTC,degree_C\n"
        "2024-01-01T00:00:00Z,3.5\n"
        "2024-01-02T00:00:00Z,4.5\n"
    )
    df = read_erddap_csv(spark, str(p))  # no schema -> inference
    rows = df.collect()
    assert len(rows) == 2  # units row gone even on the inferred path
    assert all(r.time.startswith("2024") for r in rows)


def test_erddap_csv_inferred_epoch_time_rows_survive(spark, tmp_path):
    """ERDDAP serves time as numeric seconds-since-epoch when requested
    that way (&time>=...&.units=seconds). On the inferred path those
    data rows are strings that FAIL try_to_timestamp — the units-row
    filter must not eat them. Numeric-parse acceptance keeps them; the
    units literal ('seconds since 1970-...') still fails both parses."""
    from gdutils_spark.sources.csv import read_erddap_csv

    p = tmp_path / "epoch.csv"
    p.write_text(
        "time,temperature\n"
        "seconds since 1970-01-01T00:00:00Z,degree_C\n"
        "1704067200.5,3.5\n"
        "1704153600,4.5\n"
    )
    df = read_erddap_csv(spark, str(p))
    rows = sorted(df.collect())
    assert len(rows) == 2
    # inference keeps columns as STRING (units row pollutes it — the
    # documented no-schema caveat); presence, not type, is under test
    assert [r.temperature for r in rows] == ["3.5", "4.5"]
