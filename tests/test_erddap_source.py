"""ERDDAP Python DataSource: pushdown translation, partitioned scans,
offline file transport."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThan,
    StringStartsWith,
)

from gdutils_spark.sources.erddap import ErddapDataSource, ErddapReader, register

SCHEMA = T.StructType(
    [
        T.StructField("time", T.TimestampType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("profile_id", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def served_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("erddap")
    rows = ["time,latitude,longitude,profile_id"]
    t0 = dt.datetime(2024, 1, 1)
    for i in range(48):
        ts = t0 + dt.timedelta(hours=i)
        rows.append(f"{ts.isoformat()},{38 + i * 0.01},{-73 - i * 0.01},{i}")
    rows.append(rows[1])  # duplicate row for distinct() testing
    (d / "unit_191.csv").write_text("\n".join(rows) + "\n")
    return str(d)


def _reader(**opts) -> ErddapReader:
    from pyspark.sql.datasource import CaseInsensitiveDict

    return ErddapReader(SCHEMA, CaseInsensitiveDict(opts))


def test_pushdown_translates_comparisons():
    r = _reader(server="https://x/erddap", dataset_id="unit_191")
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("time",), dt.datetime(2024, 1, 1)),
                LessThan(("time",), dt.datetime(2024, 1, 2)),
                EqualTo(("profile_id",), 7),
                StringStartsWith(("station",), "u"),  # not expressible
            ]
        )
    )
    # unsupported filters are handed back for Spark to evaluate
    assert [type(f) for f in unsupported] == [StringStartsWith]
    url = r.request_url()
    assert "time>=2024-01-01T00%3A00%3A00" in url  # op verbatim, value quoted
    assert "time<2024-01-02T00%3A00%3A00" in url
    assert "profile_id=7" in url
    assert url.startswith("https://x/erddap/tabledap/unit_191.csv?")
    assert url.split("?")[1].split("&")[0] == "time,latitude,longitude,profile_id"


def test_partition_windows():
    r = _reader(
        server="https://x/erddap",
        dataset_id="unit_191",
        partition_col="time",
        partition_bounds="2024-01-01,2024-02-01,2024-03-01",
    )
    parts = r.partitions()
    assert len(parts) == 2
    assert "time>=2024-01-01" in r.request_url(parts[0])
    assert "time<2024-02-01" in r.request_url(parts[0])
    assert "time>=2024-02-01" in r.request_url(parts[1])


def test_end_to_end_file_transport(spark, served_dir):
    register(spark)
    df = (
        spark.read.format("erddap")
        .schema(SCHEMA)
        .option("server", f"file://{served_dir}")
        .option("dataset_id", "unit_191")
        .option("distinct", "true")
        .load()
        .where(F.col("time") >= F.lit("2024-01-01 12:00:00").cast("timestamp"))
        .where(F.col("time") < F.lit("2024-01-02 12:00:00").cast("timestamp"))
    )
    rows = df.collect()
    assert len(rows) == 24  # hours 12..35, duplicate removed by distinct()
    assert all(r["profile_id"] >= 12 for r in rows)


def test_end_to_end_partitioned(spark, served_dir):
    register(spark)
    df = (
        spark.read.format("erddap")
        .schema(SCHEMA)
        .option("server", f"file://{served_dir}")
        .option("dataset_id", "unit_191")
        .option("distinct", "true")
        .option("partition_col", "time")
        .option("partition_bounds", "2024-01-01,2024-01-02,2024-01-04")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 48
