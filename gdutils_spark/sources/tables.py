"""Parquet table loaders for the driver testdata layout.

``sf_dir`` contains one parquet file per table (TESTDATA.md). Parquet gives
us free column pruning + predicate pushdown through Catalyst, which is the
Spark-native replacement for the reference's server-side URL constraints
(``/root/reference/gdutils/__init__.py:792-796``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Parquet files whose timestamp columns are TIMESTAMP(NANOS) — Spark has no
# nanosecond timestamp type, so we read them as long (legacy conf) and
# truncate to microseconds with integer arithmetic (ns epochs exceed
# double's 2^53 mantissa, so no float division).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Scans stay lazy; Catalyst prunes columns."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in nanos_cols:
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so spark.sql() queries see them."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
