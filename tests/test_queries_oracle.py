"""Every registry query vs its DuckDB oracle at sf0.01 — the local mirror of
the driver's correctness gate."""

from __future__ import annotations

import pytest

from gdutils_spark.queries import ORACLE, QUERIES
from tests.helpers import compare_with_oracle

ORACLE_BACKED = sorted(set(QUERIES) & set(ORACLE))


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(spark, sf_correct, name):
    df = QUERIES[name](spark, sf_correct)
    compare_with_oracle(df, ORACLE[name], sf_correct)


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLE)
    # every registry entry is oracle-backed since round 5 (geo_user_tracks
    # gained a full-document reassembly oracle); keep the equality check so
    # a silent omission never ships
    assert missing == set()


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0
