"""Driver simulation: run every __spark_entry__ query against its DuckDB
oracle at sf0.01 with a plain non-UTC SparkSession, mirroring the driver's
order-insensitive value-hash compare.

Usage (from anywhere):
    python tools/drive_contract.py              # all registry queries
    python tools/drive_contract.py q1_pricing_summary doc_chunks   # subset
Exit code 1 on any mismatch. This is the /verify recipe.
"""

import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

# override for adversarial-fixture hunts (tools/make_hunt_fixtures.py);
# the driver's own gate always runs the real sf0.01
SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as se

rows = se.entry(spark).collect()
print(f"entry: {len(rows)} rows", flush=True)
if "sf_hunt" not in SF_DIR:
    # the >0-rows smoke only applies to real testdata; the adversarial
    # empty fixture legitimately yields an empty (but well-formed) entry
    assert len(rows) > 0, "entry() smoke check: must produce rows"

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: None if v is None else str(v))
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _arrow_type_key(t) -> str:
    """Normalize an arrow type the way the driver's hash plausibly does:
    string families collapse, timestamps collapse to naive microseconds
    (r4 evidence: tz-aware Spark timestamps hash-matched DuckDB naive
    ones), everything else — int WIDTH, decimal vs int (the q12 HUGEINT
    bug), float vs decimal — stays distinguishing."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp[us]"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_key(t.value_type)}>"
    return str(t)


def arrow_schema_mismatch(spark_df, duck_rel) -> str | None:
    """Type-STRICT schema compare via arrow on both sides — catches the
    class of bug the value-normalized compare cannot (DuckDB HUGEINT vs
    Spark BIGINT hashed differently by the driver despite equal values)."""
    got = {f.name: _arrow_type_key(f.type) for f in spark_df.toArrow().schema}
    want = {f.name: _arrow_type_key(f.type) for f in duck_rel.arrow().schema}
    if set(got) != set(want):
        return f"columns: {sorted(got)} vs {sorted(want)}"
    diffs = [f"{c}: spark={got[c]} oracle={want[c]}" for c in sorted(got) if got[c] != want[c]]
    return "; ".join(diffs) or None


def values_match(g: pd.DataFrame, w: pd.DataFrame) -> str | None:
    if list(g.columns) != list(w.columns):
        return f"schema: {list(g.columns)} vs {list(w.columns)}"
    if len(g) != len(w):
        return f"rows: {len(g)} vs {len(w)}"
    for c in g.columns:
        a, b = g[c], w[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn and yn:
                    continue
                if xn or yn or x != y:
                    return f"col {c} row {i}: {x!r} != {y!r}"
        else:
            eq = ((a.isna() & b.isna()) | (a == b)).fillna(False)
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                return f"col {c} row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}"
    return None


queries = se.queries()
oracles = se.oracle_sql()
names = list(queries)
if len(sys.argv) > 1:
    wanted = set(sys.argv[1:])
    unknown = wanted - set(names)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}")
    names = [n for n in names if n in wanted]

n_ok = n_bad = n_noora = 0
for name in names:
    try:
        sdf = queries[name](spark, SF_DIR)
        got = canon(sdf.toPandas())
    except Exception as exc:
        print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}", flush=True)
        n_bad += 1
        continue
    sql = oracles.get(name)
    if sql is None:
        print(f"noora {name}: rows={len(got)}", flush=True)
        n_noora += 1
        continue
    try:
        rel = con.sql(sql)
        want = canon(rel.df())
    except Exception as exc:
        print(f"FAIL {name}: duckdb raised {type(exc).__name__}: {exc}", flush=True)
        n_bad += 1
        continue
    err = values_match(got, want)
    if err is None:
        # values match under normalization — now the driver-faithful
        # TYPE check (re-running the query/oracle; both are cheap at
        # sf0.01 and this tool is a pre-flight, not a benchmark)
        try:
            err = arrow_schema_mismatch(queries[name](spark, SF_DIR), con.sql(sql))
            err = f"TYPE {err}" if err else None
        except Exception as exc:  # toArrow() gaps shouldn't kill the run
            print(f"warn {name}: arrow compare skipped ({exc})", flush=True)
            err = None
    if err:
        print(f"FAIL {name}: {err}", flush=True)
        n_bad += 1
    else:
        n_ok += 1

print(f"\nDRIVE RESULT: ok={n_ok} fail={n_bad} no_oracle={n_noora} of {len(names)}")
sys.exit(1 if n_bad else 0)
