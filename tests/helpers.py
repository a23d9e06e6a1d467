"""Local mirror of the driver's duckdb-oracle comparison.

Sorts columns by name, compares row counts and values order-insensitively
(exact on ints/strings/dates, exact-double on decimal-routed aggregates).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from gdutils_spark.sources.tables import TABLES

_TABLE_VIEWS_SQL = """
CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}');
"""


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            _TABLE_VIEWS_SQL.format(name=name, path=f"{sf_dir}/{name}.parquet")
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_with_oracle(
    spark_df: DataFrame, oracle_sql: str, sf_dir: str, float_exact: bool = True
) -> None:
    got = _canon(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    want = _canon(con.sql(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.tolist(), w.tolist())):
                a_nan = a is None or (isinstance(a, float) and math.isnan(a))
                b_nan = b is None or (isinstance(b, float) and math.isnan(b))
                if a_nan and b_nan:
                    continue
                if float_exact:
                    assert a == b, f"col {c} row {i}: {a!r} != {b!r} (exact)"
                else:
                    assert math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12), (
                        f"col {c} row {i}: {a!r} != {b!r}"
                    )
        else:
            # null-aware equality mirroring the driver's hash compare
            # (null == null on both sides): pandas object-dtype `==`
            # treats None as missing and yields False for None == None
            eq = ((g.isna() & w.isna()) | (g == w)).fillna(False)
            if not bool(eq.all()):
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"col {c} first mismatch row {bad}: "
                    f"spark={g.iloc[bad]!r} oracle={w.iloc[bad]!r}"
                )
