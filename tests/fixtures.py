"""Deterministic in-memory fixtures per FIXTURES.md (3 datasets spanning a
year boundary, one delayed-mode, one allDatasets row, one orphaned)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("institution", T.StringType()),
        T.StructField("tabledap", T.StringType()),
        T.StructField("griddap", T.StringType()),
        T.StructField("wms", T.StringType()),
    ]
)

CATALOG_ROWS = [
    ("allDatasets", "everything", "all of it", "ERDDAP", "u", None, None),
    ("unit_191-20231201T0000", "Unit 191 Dec", "mid-atlantic survey", "MARACOOS", "u1", None, None),
    ("unit_191-20240115T1200", "Unit 191 Jan", "mid-atlantic survey 2", "MARACOOS", "u2", None, None),
    ("blue-20240101T0600", "Blue deployment", "gulf stream transect", "RU COOL", "u3", None, None),
    ("blue-20240101T0600-delayed", "Blue delayed", "gulf stream transect", "RU COOL", "u4", None, None),
]

PROFILES_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("profile_id", T.LongType()),
        T.StructField("wmo_id", T.StringType()),
    ]
)


def _profiles_rows():
    rows = []
    pid = 0
    # unit_191 Dec 2023: 10 days x 4 profiles/day, crossing into Jan
    t0 = dt.datetime(2023, 12, 28, 1, 30)
    for d in range(8):
        for p in range(4):
            ts = t0 + dt.timedelta(days=d, hours=6 * p)
            rows.append(
                ("unit_191-20231201T0000", ts, 38.0 + 0.01 * pid, -73.0 - 0.0155 * pid, pid, "4801915")
            )
            pid += 1
    # unit_191 Jan deployment
    t1 = dt.datetime(2024, 1, 15, 12, 0)
    for d in range(5):
        for p in range(2):
            ts = t1 + dt.timedelta(days=d, hours=12 * p)
            rows.append(
                ("unit_191-20240115T1200", ts, 39.0005 + 0.002 * pid, -72.5 - 0.001 * pid, pid, "4801915")
            )
            pid += 1
    # blue: 3 days x 3/day (and its delayed twin, same fixes)
    t2 = dt.datetime(2024, 1, 1, 6, 0)
    for ds in ("blue-20240101T0600", "blue-20240101T0600-delayed"):
        for d in range(3):
            for p in range(3):
                ts = t2 + dt.timedelta(days=d, hours=8 * p)
                rows.append((ds, ts, 36.1235 + 0.01 * d, -74.9985 + 0.01 * p, pid, "4802960"))
                pid += 1
    return rows


TIMESERIES_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType()),
        T.StructField("precise_time", T.TimestampType()),
        T.StructField("depth", T.DoubleType()),
        T.StructField("temperature", T.DoubleType()),
        T.StructField("salinity", T.DoubleType()),
    ]
)


def _timeseries_rows():
    rows = []
    t0 = dt.datetime(2023, 12, 28, 2, 0)
    for i in range(200):
        ts = t0 + dt.timedelta(minutes=30 * i)
        rows.append(
            ("unit_191-20231201T0000", ts, float(i % 50), 12.0 + (i % 7) * 0.5, 35.0 + (i % 3) * 0.1)
        )
    return rows


STATUS_SCHEMA = T.StructType(
    [
        T.StructField("dataset_id", T.StringType()),
        T.StructField("delayed_mode", T.BooleanType()),
        T.StructField("completed", T.BooleanType()),
        T.StructField("orphaned", T.BooleanType()),
    ]
)

STATUS_ROWS = [
    ("unit_191-20231201T0000", False, True, False),
    ("unit_191-20240115T1200", False, False, False),
    ("blue-20240101T0600", False, False, True),
    ("blue-20240101T0600-delayed", True, True, False),
    ("ghost-20220301T0000", True, False, False),
]


def catalog_df(spark: SparkSession):
    return spark.createDataFrame(CATALOG_ROWS, CATALOG_SCHEMA)


def profiles_df(spark: SparkSession):
    return spark.createDataFrame(_profiles_rows(), PROFILES_SCHEMA)


def timeseries_df(spark: SparkSession):
    return spark.createDataFrame(_timeseries_rows(), TIMESERIES_SCHEMA)


def status_df(spark: SparkSession):
    return spark.createDataFrame(STATUS_ROWS, STATUS_SCHEMA)
