"""Physical-plan assertions: the scale properties the engine promises.

These run `.explain` output through string checks — filter/projection
pushdown reaches the parquet scan, small dims broadcast, hot paths stay in
whole-stage codegen with no Python UDFs (BatchEvalPython) in relational
queries."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from gdutils_spark.queries import QUERIES
from gdutils_spark.sources.tables import load_table


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    """Count physical Exchange nodes (formatted explain lists each node
    twice: once in the tree, once as a '(n) Exchange' detail header)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def test_filter_pushdown_reaches_parquet(spark, sf_correct):
    df = load_table(spark, sf_correct, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: ReadSchema carries only what we asked for (+ filter col)
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q5_broadcasts_dims(spark, sf_correct):
    plan = plan_of(QUERIES["q5_region_revenue"](spark, sf_correct))
    assert "BroadcastHashJoin" in plan
    # the big fact side must NOT be broadcast: lineitem scan feeds a
    # non-broadcast side (probe) — presence of at least one shuffle-free
    # broadcast join per dim is the point
    assert plan.count("BroadcastHashJoin") >= 4


def test_interval_join_is_broadcast_equi(spark, sf_correct):
    plan = plan_of(QUERIES["user_first_week_events"](spark, sf_correct))
    assert "BroadcastHashJoin" in plan


def test_no_python_udfs_in_relational_queries(spark, sf_correct):
    for name in (
        "q1_pricing_summary",
        "daily_event_stats",
        "calendar_ymd_events",
        "doc_text_stats",
        "doc_simhash",
        "emb_knn_bruteforce",
    ):
        plan = plan_of(QUERIES[name](spark, sf_correct))
        assert "BatchEvalPython" not in plan, f"{name} fell off codegen into Python"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF"


def test_calendar_is_single_aggregate(spark, sf_correct):
    """calendar = one partial+final hash agg pair → exactly one agg
    shuffle (+ the final orderBy range exchange). DataFrame.pivot would
    plan two aggregation rounds; our conditional agg plans one."""
    plan = plan_of(QUERIES["calendar_ymd_events"](spark, sf_correct))
    assert n_exchanges(plan) <= 2  # agg shuffle + final orderBy range part
    assert "HashAggregate" in plan


def test_whole_stage_codegen_active(spark, sf_correct):
    # AQE hides codegen spans until runtime; disable it to inspect the
    # static plan. Simple-mode explain marks codegen stages with '*(n)'.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            QUERIES["q1_pricing_summary"](spark, sf_correct).explain()
        assert "*(" in buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
