"""Build adversarial sf-dir fixtures for latent-hunting the registry.

Two fixture dirs, same arrow schemas as the real testdata (built by
slicing the real sf0.001 parquet so timestamp encodings survive):

* ``/tmp/sf_hunt_empty`` — every table 0 rows. Every query must still
  plan, run, and agree with its oracle on the empty relation (the
  classic latent bugs: div-by-zero in a corpus-level constant,
  element_at on an empty collect_list, a collect()[0] on no rows).
* ``/tmp/sf_hunt_null`` — ~150 rows per table plus adversarial rows:
  NULL group keys (event_type/lang/source), NULL and NaN measures,
  empty and NULL text, invalid JSON props, a NULL embedding element.

Usage: python tools/make_hunt_fixtures.py
Then:  DRIVE_SF_DIR=/tmp/sf_hunt_empty python tools/drive_contract.py ...
"""

from __future__ import annotations

import datetime as _dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _extra_rows(name: str, schema: pa.Schema) -> list[dict] | None:
    nan = float("nan")
    if name == "events":
        return [
            # NULL group key, live measure
            {"event_id": 900001, "ts": None, "user_id": 42,
             "event_type": None, "value": 1.5, "props": "{}"},
            # NaN measure, valid group
            {"event_id": 900002, "ts": _dt.datetime(2024, 1, 2, 3, 4, 5),
             "user_id": 42, "event_type": "click", "value": nan,
             "props": "not json"},
            # NULL everything nullable
            {"event_id": 900003, "ts": None, "user_id": None,
             "event_type": None, "value": None, "props": None},
        ]
    if name == "documents":
        return [
            {"doc_id": 900001, "text": "", "lang": None, "source": "webz",
             "n_chars": 0},
            {"doc_id": 900002, "text": None, "lang": "en", "source": None,
             "n_chars": None},
            {"doc_id": 900003, "text": "   ", "lang": "xx", "source": "webz",
             "n_chars": 3},
        ]
    if name == "embeddings":
        dim = 8  # actual dim read from data below; placeholder replaced
        return None  # handled specially (needs the real dim)
    if name == "orders":
        return [
            {"o_orderkey": 900001, "o_custkey": None, "o_orderstatus": None,
             "o_totalprice": nan, "o_orderdate": None,
             "o_orderpriority": None},
        ]
    if name == "lineitem":
        return [
            {"l_orderkey": 900001, "l_partkey": None, "l_suppkey": None,
             "l_linenumber": 1, "l_quantity": None, "l_extendedprice": nan,
             "l_discount": None, "l_tax": None, "l_returnflag": None,
             "l_linestatus": None, "l_shipdate": None},
        ]
    if name == "customer":
        return [
            {"c_custkey": 900001, "c_name": None, "c_nationkey": None,
             "c_acctbal": nan, "c_mktsegment": None},
        ]
    if name == "supplier":
        return [
            {"s_suppkey": 900001, "s_name": None, "s_nationkey": None,
             "s_acctbal": None},
        ]
    if name == "part":
        return [
            {"p_partkey": 900001, "p_name": None, "p_brand": None,
             "p_type": None, "p_size": None, "p_retailprice": nan},
        ]
    return []


def build(dst: str, n_rows: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        out = tab.slice(0, n_rows)
        if n_rows > 0:
            extra = _extra_rows(t, tab.schema)
            if t == "embeddings":
                dim = len(tab.column("embedding")[0].as_py())
                extra = [
                    {"vec_id": 900001,
                     "embedding": [float("nan")] + [0.0] * (dim - 1),
                     "label": None},
                    {"vec_id": 900002, "embedding": None, "label": 3},
                ]
            if extra:
                extra_tab = pa.Table.from_pylist(extra, schema=tab.schema)
                out = pa.concat_tables([out, extra_tab])
        pq.write_table(out, f"{dst}/{t}.parquet")
    print(f"built {dst} ({n_rows} base rows/table)")


if __name__ == "__main__":
    build("/tmp/sf_hunt_empty", 0)
    build("/tmp/sf_hunt_null", 150)
