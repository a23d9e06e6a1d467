"""REST-JSON record sources (DAC deployments API, status API shapes).

The reference fetches JSON with requests and hand-coerces column types in
pandas (``/root/reference/gdutils/apis/dac.py:10-71``,
``/root/reference/gdutils/apis/status.py:10-73``). Spark-first: read the
records array with ``spark.read.json`` (or ``createDataFrame`` for
already-fetched payloads) and express the coercions as Catalyst casts so
they run JVM-side.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdutils_spark.functions.names import normalize_columns


def read_json_records(
    spark: SparkSession,
    path_or_records: str | Sequence[Mapping],
    bool_columns: Sequence[str] = (),
    epoch_ms_columns: Sequence[str] = (),
    timestamp_columns: Sequence[str] = (),
    int_columns: Sequence[str] = (),
    float_columns: Sequence[str] = (),
    null_flag_column: tuple[str, str] | None = None,
) -> DataFrame:
    """Load JSON records and apply the reference's type coercions as casts.

    * bools: NULL → false (``/root/reference/gdutils/__init__.py:911-917``)
    * epoch-ms longs → timestamp (``/root/reference/gdutils/apis/dac.py:44``)
    * strings → timestamp with coercion (NULL on parse failure,
      ``/root/reference/gdutils/apis/status.py:39``)
    * ints: NULL → 0 (``/root/reference/gdutils/apis/status.py:30``)
    * ``null_flag_column=(flag, probe)`` derives ``flag = probe IS NULL``
      — the 'orphaned' pattern (``/root/reference/gdutils/apis/status.py:52-54``).
    """
    if isinstance(path_or_records, str):
        df = spark.read.option("multiLine", "true").json(path_or_records)
    else:
        df = spark.createDataFrame(list(path_or_records))
    df = normalize_columns(df)
    for c in bool_columns:
        if c in df.columns:
            df = df.withColumn(c, F.coalesce(F.col(c).cast("boolean"), F.lit(False)))
    for c in epoch_ms_columns:
        if c in df.columns:
            df = df.withColumn(c, F.timestamp_millis(F.col(c).cast("long")))
    for c in timestamp_columns:
        if c in df.columns:
            # errors='coerce' semantics: malformed → NULL, not an error
            df = df.withColumn(c, F.try_to_timestamp(F.col(c)))
    for c in int_columns:
        if c in df.columns:
            df = df.withColumn(c, F.coalesce(F.col(c).cast("long"), F.lit(0)))
    for c in float_columns:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("double"))
    if null_flag_column is not None:
        flag, probe = null_flag_column
        df = df.withColumn(flag, F.col(probe).isNull())
    return df
