"""Head-to-head probe of Unicode string semantics: Spark (JVM
UTF8String + java.util.regex) vs DuckDB (utf8proc + RE2) — the r14
hunt leg's measurement tool. Prints one row per (primitive, input) with
both engines' answers and a MATCH/DIFF verdict; the DIFF rows are the
divergence classes the registry's oracles must pin around (the
NaN→DECIMAL→NULL convention from the r13 decimal probe).

Usage: python tools/unicode_probe.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

NFD_CAFE = "cafe\u0301"  # e + combining acute
NFC_CAFE = "caf\u00e9"
NBSP = "a\u00a0b"
ZWSP = "a\u200bb"
IDEO = "\u3000x\u3000"
CASES: list[tuple[str, str, str]] = [
    # (label, spark SQL expr, duckdb SQL expr) — same input literals
    ("length cjk", "length('你好世界')", "length('你好世界')"),
    ("length astral", "length('🤖𝔘')", "length('🤖𝔘')"),
    ("length nfd", f"length('{NFD_CAFE}')", f"length('{NFD_CAFE}')"),
    ("length fullwidth", "length('ＦＵ　１')", "length('ＦＵ　１')"),
    ("lower turkish İ", "lower('İ')", "lower('İ')"),
    ("lower ẞ", "lower('ẞ')", "lower('ẞ')"),
    ("upper ß", "upper('ß')", "upper('ß')"),
    ("lower final sigma", "lower('ΟΔΥΣΣΕΥΣ')", "lower('ΟΔΥΣΣΕΥΣ')"),
    ("lower fullwidth", "lower('ＦＵＬＬ')", "lower('ＦＵＬＬ')"),
    ("lev ascii-astral", "levenshtein('ab', 'a🤖')", "levenshtein('ab', 'a🤖')"),
    ("lev astral-astral", "levenshtein('🤖a', '🧪a')", "levenshtein('🤖a', '🧪a')"),
    (
        "lev nfc-nfd",
        f"levenshtein('{NFC_CAFE}', '{NFD_CAFE}')",
        f"levenshtein('{NFC_CAFE}', '{NFD_CAFE}')",
    ),
    ("lev cjk", "levenshtein('你好', '你坏')", "levenshtein('你好', '你坏')"),
    ("substr astral", "substring('🤖ab', 1, 2)", "substring('🤖ab', 1, 2)"),
    ("substr cjk", "substring('你好世界', 2, 2)", "substring('你好世界', 2, 2)"),
    (
        "ws split U+3000",
        r"regexp_replace('a　b', '\\s+', ' ')",
        "regexp_replace('a　b', '\\s+', ' ', 'g')",
    ),
    (
        "ws split NBSP",
        f"regexp_replace('{NBSP}', '\\\\s+', ' ')",
        f"regexp_replace('{NBSP}', '\\s+', ' ', 'g')",
    ),
    (
        "digit class arabic-indic",
        "regexp_replace('a١٢٣b', '\\\\d+', '#')",
        "regexp_replace('a١٢٣b', '\\d+', '#', 'g')",
    ),
    (
        "token split non-alnum",
        "split(lower('café corp'), '[^a-z0-9]+')",
        "regexp_split_to_array(lower('café corp'), '[^a-z0-9]+')",
    ),
    ("md5 unicode", "md5('你好🤖')", "md5('你好🤖')"),
    ("md5 nfd vs nfc differ", f"md5('{NFD_CAFE}')", f"md5('{NFD_CAFE}')"),
    (
        "zero-width in \\w",
        f"regexp_replace('{ZWSP}', '\\\\w+', '#')",
        f"regexp_replace('{ZWSP}', '\\w+', '#', 'g')",
    ),
    ("upper straße", "upper('straße')", "upper('straße')"),
    ("reverse astral", "reverse('a🤖b')", "reverse('a🤖b')"),
    ("trim ideographic space", f"trim('{IDEO}')", f"trim('{IDEO}')"),
]


def main() -> int:
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    n_diff = 0
    for label, s_expr, d_expr in CASES:
        try:
            sv = spark.sql(f"SELECT {s_expr} AS v").collect()[0]["v"]
        except Exception as e:  # noqa: BLE001
            sv = f"RAISE: {type(e).__name__}"
        try:
            dv = con.sql(f"SELECT {d_expr} AS v").fetchone()[0]
        except Exception as e:  # noqa: BLE001
            dv = f"RAISE: {type(e).__name__}"
        verdict = "MATCH" if str(sv) == str(dv) else "DIFF"
        if verdict == "DIFF":
            n_diff += 1
        print(f"{verdict}  {label:28s} spark={sv!r}  duckdb={dv!r}")
    print(f"\n{n_diff} divergences / {len(CASES)} probes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
