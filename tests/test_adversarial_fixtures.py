"""Adversarial-input contract pins (r13 hunt, VERDICT r12 task 3).

The full census lives in SCALE.md and the standing recipe is
``DRIVE_SF_DIR=... python tools/drive_contract.py`` over the fixture
dirs from ``tools/make_hunt_fixtures.py``; this module pins a fast
representative subset in CI — one query per fixed failure class — so a
regression in empty-input or NULL/NaN semantics fails a test, not just
a future manual hunt."""

from __future__ import annotations

import pytest

from gdutils_spark.queries import ORACLE, QUERIES
from tests.helpers import compare_with_oracle


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    from tools.make_hunt_fixtures import build

    d = str(tmp_path_factory.mktemp("sf_empty"))
    build(d, 0)
    return d


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    from tools.make_hunt_fixtures import build

    d = str(tmp_path_factory.mktemp("sf_null"))
    build(d, 60)
    return d


# one per fixed empty-input failure class: grouping-sets grand row,
# empty-audit COALESCE, KMV 0/0, JSONL read-back, JSON schema inference,
# mix-rate zero-weight guard, near-dup empty relation
EMPTY_PINNED = [
    "rollup_order_totals",
    "fk_integrity_audit",
    "lineitem_kmv_part_overlap",
    "rt_jsonl_shards",
    "rt_json_records_typed",
    "doc_domain_mix_plan",
    "emb_near_dup_pairs",
]

# one per fixed NULL/NaN divergence class: NaN->DECIMAL, NULL window
# order, NOT-IN NULL trap, calendar NULL date, NaN percentile policy,
# concat-NULL fixture ids, malformed JSON, NULL-weight stratum fold,
# well-formed-vector contract
NULL_PINNED = [
    "daily_revenue_7d_ma",
    "user_event_transitions",
    "q22_idle_high_balance",
    "calendar_ym_orders",
    "event_value_quantiles",
    "rt_client_datasets",
    "event_props_stats",
    "doc_domain_mix_plan",
    "emb_knn_bruteforce",
]


@pytest.mark.parametrize("name", EMPTY_PINNED)
def test_empty_fixture_contract(spark, empty_dir, name):
    compare_with_oracle(QUERIES[name](spark, empty_dir), ORACLE[name], empty_dir)


@pytest.mark.parametrize("name", NULL_PINNED)
def test_null_fixture_contract(spark, null_dir, name):
    compare_with_oracle(QUERIES[name](spark, null_dir), ORACLE[name], null_dir)


def test_empty_corpus_index_training_raises_clearly(spark, empty_dir):
    """The documented exception to empty-in-empty-out: similarity index
    TRAINING over an empty corpus raises the named error."""
    with pytest.raises(ValueError, match="empty corpus"):
        QUERIES["emb_knn_ivf"](spark, empty_dir).collect()


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory):
    from tools.make_hunt_fixtures import _unicode_rows, build

    d = str(tmp_path_factory.mktemp("sf_unicode"))
    build(d, 60, extra_fn=_unicode_rows)
    return d


# one per r14 unicode-hunt failure class: JSON string-value try_cast,
# codepoint tokenization + fingerprints (CJK/astral/ZW/NFC-vs-NFD),
# trim(x, ' ') oracle pin on unicode-padded docs, linkage tokenizer on
# accented names, edit-prefix pairs with shared-ASCII-prefix twins
UNICODE_PINNED = [
    "event_props_stats",
    "doc_text_stats",
    "doc_exact_dups",
    "doc_top_tokens",
    "customer_supplier_name_match",
    "doc_prefix_edit_pairs",
]


@pytest.mark.parametrize("name", UNICODE_PINNED)
def test_unicode_fixture_contract(spark, unicode_dir, name):
    compare_with_oracle(
        QUERIES[name](spark, unicode_dir), ORACLE[name], unicode_dir
    )


def test_unicode_engine_divergences_pinned(spark):
    """The three KNOWN engine divergences the registry deliberately
    scopes around (r14 unicode hunt, tools/unicode_probe.py): if either
    engine changes behavior, this pin fails and the fixture scoping in
    tools/make_hunt_fixtures.py must be revisited.

    * JVM lower('İ') appends U+0307; utf8proc folds to plain 'i'
    * JVM lowers word-final 'Σ' to contextual 'ς'; utf8proc to 'σ'
    * Spark levenshtein counts CODEPOINTS; DuckDB counts BYTES
    * DuckDB bare trim() strips Unicode whitespace; Spark strips 0x20
      only — which is why every oracle uses trim(x, ' ')
    """
    import duckdb

    row = spark.sql(
        "SELECT lower('İ') AS ti, lower('ΟΔΥΣΣΕΥΣ') AS sig, "
        "levenshtein('ab', 'a你') AS lev, trim('　x　') AS tr"
    ).collect()[0]
    assert row["ti"] == "i̇"
    assert row["sig"] == "οδυσσευς"  # contextual final sigma
    assert row["lev"] == 1  # codepoints
    assert row["tr"] == "　x　"  # ASCII space only
    con = duckdb.connect()
    d = con.sql(
        "SELECT lower('İ') AS ti, lower('ΟΔΥΣΣΕΥΣ') AS sig, "
        "levenshtein('ab', 'a你') AS lev, trim('　x　') AS tr, "
        "trim('　x　', ' ') AS tr_pin"
    ).fetchone()
    assert d[0] == "i"
    assert d[1] == "οδυσσευσ"  # always 'σ'
    assert d[2] == 3  # bytes ('你' = 3 UTF-8 bytes: 1 sub + 2 inserts)
    assert d[3] == "x"  # bare trim strips U+3000
    assert d[4] == "　x　"  # the oracle pin replays Spark
