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

# Testdata timestamp columns arrive in whatever physical encoding the
# driver's generator used that round — TIMESTAMP(NANOS) read as long via
# the legacy conf (round 1), or plain TIMESTAMP(MICROS, isAdjustedToUTC
# =false) which Spark reads as TIMESTAMP_NTZ (round 2+). The engine
# standardizes on session-UTC TIMESTAMP (SURVEY.md §7 trap 7), so the
# loader normalizes every variant to TimestampType:
#   * bigint nanos  -> timestamp_micros(ns div 1000)  (integer arithmetic;
#     ns epochs exceed double's 2^53 mantissa, so no float division)
#   * timestamp_ntz -> cast('timestamp')  (session tz is UTC, wall-clock
#     values are preserved and match DuckDB's naive-timestamp semantics)
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _tune_session(spark: SparkSession) -> None:
    """Per-query session tuning for driver-owned SparkSessions.

    The correctness/bench driver builds its own session, so engine-level
    knobs from :mod:`gdutils_spark.session` may be absent; set the ones
    that change plan shape here (runtime-settable SQL confs only):

    * UTC session timezone — date-part extraction must match DuckDB's
      naive-timestamp semantics (SURVEY.md §7 trap 7).
    * ``canChangeCachedPlanOutputPartitioning`` — cached intermediates
      (shingle tables, LSH candidates) otherwise pin their 32/64-way
      shuffle partitioning and AQE cannot coalesce the near-empty
      post-cache stages; measured 24s → 2s on minhash_lsh_pairs at
      sf0.01 and the same effect holds for any small-per-partition
      cached stage at cluster scale.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Scans stay lazy; Catalyst prunes columns."""
    _tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    ts_cols = _TS_COLS.get(name, ())
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in ts_cols:
        dt = dtypes.get(c)
        if dt is None:
            # fail loudly: a renamed/missing timestamp column silently
            # skipping normalization would surface as oracle mismatches
            # three steps downstream (re-check parquet schemas per round)
            raise ValueError(
                f"expected timestamp column {c!r} missing from {name} "
                f"({sorted(dtypes)})"
            )
        if dt == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so spark.sql() queries see them."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
