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
