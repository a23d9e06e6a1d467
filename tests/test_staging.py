"""Bucketed staging (shuffle-free joins) and salted skew joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdutils_spark.plans import formatted_plan, n_exchanges
from gdutils_spark.sources.staging import read_staged, salted_join, stage_bucketed
from gdutils_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_smoke, tmp_path_factory):
    d = tmp_path_factory.mktemp("staged")
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    stage_bucketed(orders, "orders_b", "o_orderkey", buckets=8, path=str(d / "o"))
    stage_bucketed(lineitem, "lineitem_b", "o_orderkey", buckets=8, path=str(d / "l"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_staged(spark, "lineitem_b").join(
            read_staged(spark, "orders_b"), "o_orderkey"
        )
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert n_exchanges(plan) == 0, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_is_shuffle_free(spark, bucketed):
    agg = read_staged(spark, "lineitem_b").groupBy("o_orderkey").count()
    assert n_exchanges(formatted_plan(agg)) == 0


def test_bucketed_join_matches_plain(spark, bucketed, sf_smoke):
    got = (
        read_staged(spark, "lineitem_b")
        .join(read_staged(spark, "orders_b"), "o_orderkey")
        .count()
    )
    want = (
        load_table(spark, sf_smoke, "lineitem")
        .join(
            load_table(spark, sf_smoke, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want


def test_partitioned_staging_prunes(spark, sf_smoke, tmp_path):
    from gdutils_spark.sources.staging import stage_partitioned

    events = load_table(spark, sf_smoke, "events").withColumn(
        "date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    stage_partitioned(events, path, "date")

    one_day = spark.read.parquet(path).where(F.col("date") == "2024-01-05")
    plan = formatted_plan(one_day)
    assert "PartitionFilters: [isnotnull(date" in plan
    # pruned scan reads a single partition directory
    import glob

    n_day_dirs = len(glob.glob(f"{path}/date=*"))
    assert n_day_dirs > 1
    got = one_day.count()
    want = events.where(F.col("date") == "2024-01-05").count()
    assert got == want > 0


def test_salted_join_matches_plain(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    dims = (
        events.select("user_id").distinct().withColumn("tier", F.col("user_id") % 3)
    )
    got = salted_join(events, dims, "user_id", salts=8)
    want = events.join(dims, "user_id")
    assert got.count() == want.count()
    assert got.agg(F.sum("value")).collect() == want.agg(F.sum("value")).collect()
    assert set(got.columns) == set(want.columns)


def test_salted_join_spreads_hot_key(spark, sf_smoke):
    """The hot key's rows must land in >1 task-side groups: the join key
    (key, salt) has multiple distinct salt values for a single user."""
    events = load_table(spark, sf_smoke, "events")
    hot = events.limit(200).withColumn("user_id", F.lit(42).cast("long"))
    n_salts = (
        hot.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8)),
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_salted_join_rejects_dim_preserving_joins(spark, sf_smoke):
    """right/full would emit unmatched dim rows once per salt copy."""
    import pytest

    events = load_table(spark, sf_smoke, "events")
    dims = events.select("user_id").distinct()
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="duplicate unmatched dim rows"):
            salted_join(events, dims, "user_id", salts=4, how=how)


def test_salted_join_left_keeps_unmatched_facts_once(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    dims = (
        events.select("user_id")
        .distinct()
        .where(F.col("user_id") % 2 == 0)
        .withColumn("tier", F.lit("even"))
    )
    got = salted_join(events, dims, "user_id", salts=8, how="left")
    assert got.count() == events.count()


def test_snapshot_diff_on_bucketed_snapshots_is_shuffle_free(
    spark, sf_smoke, tmp_path_factory
):
    """snapshot_diff's docstring claims bucketed snapshots make the full
    outer join shuffle-free — pin it: two versions staged with the same
    bucket spec diff with ZERO Exchange nodes."""
    from gdutils_spark.operators.cdc import snapshot_diff

    d = tmp_path_factory.mktemp("snapdiff")
    orders = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    stage_bucketed(orders, "snap_old_b", "o_orderkey", buckets=4,
                   path=str(d / "old"))
    stage_bucketed(
        orders.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 5 == 0,
                   F.col("o_totalprice") * 2).otherwise(F.col("o_totalprice")),
        ),
        "snap_new_b", "o_orderkey", buckets=4, path=str(d / "new"),
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        diff = snapshot_diff(
            read_staged(spark, "snap_old_b"),
            read_staged(spark, "snap_new_b"),
            ["o_orderkey"],
        )
        plan = formatted_plan(diff)
        assert "FullOuter" in plan
        assert n_exchanges(plan) == 0, "bucketed snapshot diff must not shuffle"
        assert diff.count() > 0  # the %5 perturbation produced changed rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS snap_old_b")
        spark.sql("DROP TABLE IF EXISTS snap_new_b")


def test_salted_join_and_stage_partitioned_validate_degenerate_args(spark, tmp_path):
    """r13 latent hunt: salts=0 used to explode the dim to NOTHING
    (inner/semi silently empty, anti keeps every fact row); an empty
    partition_cols list used to write a flat layout that every
    'partition-pruned' query would full-scan."""
    import pytest as _pt

    from gdutils_spark.sources.staging import salted_join, stage_partitioned

    f = spark.createDataFrame([(1, "a")], "k long, v string")
    d = spark.createDataFrame([(1, "x")], "k long, w string")
    with _pt.raises(ValueError, match="salts"):
        salted_join(f, d, "k", salts=0)
    with _pt.raises(ValueError, match="non-empty"):
        stage_partitioned(f, str(tmp_path / "flat"), [])
