"""Build adversarial sf-dir fixtures for latent-hunting the registry.

Three fixture dirs, same arrow schemas as the real testdata (built by
slicing the real sf0.001 parquet so timestamp encodings survive):

* ``/tmp/sf_hunt_empty`` — every table 0 rows. Every query must still
  plan, run, and agree with its oracle on the empty relation (the
  classic latent bugs: div-by-zero in a corpus-level constant,
  element_at on an empty collect_list, a collect()[0] on no rows).
* ``/tmp/sf_hunt_null`` — ~150 rows per table plus adversarial rows:
  NULL group keys (event_type/lang/source), NULL and NaN measures,
  empty and NULL text, invalid JSON props, a NULL embedding element.
* ``/tmp/sf_hunt_unicode`` — ~150 rows per table plus multibyte /
  combining-mark / astral-plane / case-folding-edge text in documents,
  customer/supplier/part names and events JSON props: the r14 hunt leg
  probing codepoint-vs-byte semantics across Spark (JVM UTF8String /
  java.util.regex) and DuckDB (utf8proc / RE2) — levenshtein, q-gram
  and shingle extraction, tokenizer split classes, lower() folding
  (Turkish İ, German ß, full-width forms), length/n_chars conventions,
  PII digit classes, md5-of-UTF-8 fingerprints on NFC-vs-NFD twins.

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


def _unicode_rows(name: str) -> list[dict]:
    """Adversarial multibyte rows (r14 hunt leg 4). Texts are >= 4
    whitespace-separated tokens so shingle/q-gram extraction actually
    fires; n_chars is the CODEPOINT length (both engines' length())."""
    texts = [
        # CJK ideographs (3-byte UTF-8), no ASCII at all
        "你好 世界 机器 学习 模型 训练 数据 清洗 你好 世界",
        # combining-mark NFD vs precomposed NFC twin (different bytes,
        # SAME rendered text — must NOT exact-dedup together). The
        # shared >=12-char ASCII prefix keeps edit-distance prefix
        # comparisons in the engine-agreement zone (DuckDB levenshtein
        # is byte-level, Spark codepoint-level — a pinned divergence)
        "the cafe menu cafe\u0301 au lait cre\u0300me frai\u0302che du matin",
        "the cafe menu caf\u00e9 au lait cr\u00e8me fra\u00eeche du matin",
        # astral plane: surrogate pairs in UTF-16 engines, 4-byte UTF-8
        "🤖 data 📚 pipeline 🧪 test 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 math 𝒜𝒷𝒸 done",
        # RTL scripts with LTR digits embedded
        "مرحبا بالعالم 123 שלום עולם 456 test end",
        # zero-width chars INSIDE words (ZWSP/ZWJ/ZWNJ)
        "data\u200bscience model\u200dtraining eval\u200cset done here now",
        # Turkish dotless i (lowercase forms only: uppercase İ/U+0130 is
        # a PINNED engine divergence — JVM lower('İ')='i'+U+0307 vs
        # utf8proc 'i'; asserted in test_adversarial_fixtures.py, kept
        # out of case-folded registry columns)
        "Isparta ısparta istanbul kapı iii III",
        # German sharp s and its uppercase form
        "STRASSE straße GROSS groß ẞ test here now",
        # full-width forms + ideographic space U+3000
        "ＦＵＬＬ　ＷＩＤＴＨ　ｔｅｘｔ　１２３ normal words here too",
        # unicode digits (Arabic-Indic, Devanagari) near PII shapes
        "call ١٢٣٤٥٦٧٨٩٠ or ०१२३४५६७८९ ssn ١٢٣-٤٥-٦٧٨٩ end",
        # PII with real ASCII digits embedded in unicode context
        "联系 test@例え.jp or 555-12-3456 phone 5551234567 done",
        # Greek incl. word-initial uppercase sigma (folds identically);
        # a word ENDING in uppercase sigma is the pinned final-sigma
        # divergence (JVM contextual 'ς' vs utf8proc 'σ') — CI-pinned,
        # kept out of case-folded registry columns
        "Σίσυφος σίσυφος οδυσσευς ελλάδα words words words words",
        # unicode-whitespace padding (ideographic space + NBSP margins):
        # the trim(x, ' ') oracle pin keeps both engines byte-aligned
        "\u3000padded doc with ideographic margins test\u00a0",
    ]
    if name == "documents":
        return [
            {"doc_id": 910000 + i, "text": t, "lang": "xx",
             "source": "uni", "n_chars": len(t)}
            for i, t in enumerate(texts)
        ]
    if name == "customer":
        return [
            {"c_custkey": 910000 + i, "c_name": n, "c_nationkey": 0,
             "c_acctbal": 10.0, "c_mktsegment": "BUILDING"}
            for i, n in enumerate([
                "Müller & Söhne GmbH", "café corp", "café corp",
                "株式会社 データ", "Istanbul Ticaret A.Ş.",
            ])
        ]
    if name == "supplier":
        return [
            {"s_suppkey": 910000 + i, "s_name": n, "s_nationkey": 0,
             "s_acctbal": 10.0}
            for i, n in enumerate([
                "Mueller & Soehne GmbH", "café corporation",
                "株式会社 データ 供給", "ISTANBUL ticaret a.s.",
            ])
        ]
    if name == "part":
        return [
            {"p_partkey": 910000 + i, "p_name": n, "p_brand": "Brand#55",
             "p_type": "STANDARD BRUSHED TIN", "p_size": 7,
             "p_retailprice": 900.0}
            for i, n in enumerate([
                "teal café métal brossé", "緑 金属 部品 small",
                "ﬁre ﬂat ligature part",
            ])
        ]
    if name == "events":
        return [
            # unicode string values inside valid JSON props
            {"event_id": 910001, "ts": _dt.datetime(2024, 1, 2, 3, 4, 5),
             "user_id": 42, "event_type": "click",
             "value": 1.5, "props": '{"page": "/домой/начало", "tag": "汉字"}'},
            {"event_id": 910002, "ts": _dt.datetime(2024, 1, 2, 3, 4, 6),
             "user_id": 42, "event_type": "событие",
             "value": 2.5, "props": '{"emoji": "🤖🤖", "k": "v\\u00e9"}'},
        ]
    return []


def build(dst: str, n_rows: int, extra_fn=None) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        out = tab.slice(0, n_rows)
        if n_rows > 0:
            if extra_fn is not None:
                extra = extra_fn(t)
            else:
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
    build("/tmp/sf_hunt_unicode", 150, extra_fn=_unicode_rows)
