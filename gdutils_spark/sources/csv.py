"""CSV sources with ERDDAP semantics, Spark-first.

Two quirks of the reference's CSV inputs are handled here:

1. ERDDAP tabledap CSVs carry a *units row* as physical line 2, which the
   reference always skips (``skiprows=[1]`` at
   ``/root/reference/gdutils/__init__.py:456,567,757,805``). Spark has no
   skiprows; we read with header and filter out the units row by predicate
   (the units row re-parses every column as a string that fails the typed
   cast, so we drop rows where the timestamp key is NULL after cast). This
   keeps the scan a single distributed pass — no driver-side preprocessing.

2. The reference derives ``dataset_id`` from the *filename* with a regex in
   a per-file Python loop (``/root/reference/gdutils/io.py:8,11-53``). Here
   the whole glob is ONE Spark job: ``input_file_name()`` +
   ``regexp_extract`` evaluates per-partition on executors, so a million
   files is a listing problem, not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdutils_spark.functions.names import normalize_columns

# Filename pattern used by the reference for offline DAC csv batches:
# /root/reference/gdutils/io.py:8  (r'^(.*)-(\d{8}T\d{4,})')
DATASET_ID_FILE_RE = r"([^/]+-\d{8}T\d{4,})(?:[^/]*)\.csv$"


def read_erddap_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    time_column: str = "time",
    drop_units_row: bool = True,
) -> DataFrame:
    """Read an ERDDAP tabledap-style CSV (header + units row + data).

    With an explicit schema, malformed rows (the units row) produce NULLs in
    typed columns (PERMISSIVE mode); we drop rows whose ``time_column`` is
    NULL, which removes the units row in the same distributed pass.

    WITHOUT a schema, note that the units row participates in type
    inference, so every column with a units string infers as STRING —
    pass a schema for typed reads (the reference's ``skiprows=[1]`` has
    no single-pass Spark equivalent). The units-row drop still works on
    the inferred path: a string-typed ``time_column`` is kept when it
    parses as a timestamp OR as a number (ERDDAP serves time as numeric
    seconds-since-epoch when requested that way), so only rows whose
    time cell is neither — the units literal, e.g. ``UTC`` or
    ``seconds since 1970-01-01T00:00:00Z`` — are dropped, instead of
    the IS NOT NULL test that a string column would trivially pass.
    """
    reader = spark.read.option("header", "true")
    if schema is not None:
        df = reader.schema(schema).csv(path)
    else:
        df = reader.option("inferSchema", "true").csv(path)
    df = normalize_columns(df)
    if drop_units_row and time_column in df.columns:
        if isinstance(df.schema[time_column].dataType, T.StringType):
            df = df.where(
                F.try_to_timestamp(F.col(time_column)).isNotNull()
                | F.col(time_column).try_cast("double").isNotNull()
            )
        else:
            df = df.where(F.col(time_column).isNotNull())
    return df


def read_dataset_csv_batch(
    spark: SparkSession,
    glob: str,
    schema: T.StructType | None = None,
    id_column: str = "dataset_id",
    filename_regex: str = DATASET_ID_FILE_RE,
    time_column: str = "time",
) -> DataFrame:
    """Read a glob of per-dataset CSVs as one distributed scan.

    Replaces the reference's per-file loop (``/root/reference/gdutils/io.py:
    11-53``): the dataset id is extracted from the file path on executors.
    """
    df = read_erddap_csv(spark, glob, schema=schema, time_column=time_column)
    return df.withColumn(
        id_column, F.regexp_extract(F.input_file_name(), filename_regex, 1)
    )
