"""User-behavior analytics over event streams: cohort retention and
ordered conversion funnels.

Beyond-reference operators (the reference's event-shaped analogue is the
per-deployment daily activity matrix, /root/reference/gdutils/__init__.py:
574-589); these are the standard product-analytics reports any engine a
gdutils user migrates to would be asked for next.

Scale notes are inline per operator; both are built so the event scan is
pruned and partially aggregated map-side before anything shuffles.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are grouped by the ISO week (Monday
    start) of their first event; for each cohort and week offset, the
    number of distinct users active in that week and the share of the
    cohort they represent.

    Plan shape: the event scan collapses to distinct (user, week) pairs
    with a map-side-combinable hash aggregate (the only pass over the
    full data), then one user-key aggregate derives each user's cohort
    and week set together — ``min`` + ``collect_set`` over the already
    per-user-deduplicated weeks, so state is bounded by weeks-of-history
    per user, not events. The final (cohort, offset) aggregate and the
    cohort-size window run on cohort-count-sized data.
    """
    # null-strict (r13 null-fixture hunt): a NULL user or NULL ts can't
    # cohort — and half-strict behavior is engine-divergent (Spark's
    # collect_set silently drops the NULL week while a SQL replay's
    # join keeps it as a NULL offset row)
    df = df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    user_weeks = df.select(
        F.col(user_col).alias("user_id"), week.alias("week")
    ).distinct()
    per_user = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"),
        F.collect_set("week").alias("weeks"),
    )
    counts = (
        per_user.select(
            "cohort_week",
            F.explode("weeks").alias("week"),
        )
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cohort_week")
    cohort_size = F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))).over(w)
    return counts.select(
        "cohort_week",
        "week_offset",
        "n_users",
        (F.col("n_users").cast("double") / cohort_size).alias("retention_rate"),
    )


def _funnel_state(steps: tuple[str, ...], ts_type: str) -> Column:
    """Initial all-null fold state: one slot per funnel step."""
    return F.struct(
        *[F.lit(None).cast(ts_type).alias(f"t{i}") for i in range(len(steps))]
    )


def funnel(
    df: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: timedelta | None = None,
) -> DataFrame:
    """Strict ordered conversion funnel: a user converts step *i* at the
    first step-*i* event strictly after their step-*i-1* conversion time
    (first-touch attribution). Output: one row per step with the number
    of users who reached it.

    ``within`` adds the standard product-analytics time bound: step *i*
    converts only if it lands within ``within`` of the step-*i-1*
    conversion. Because the fold walks events in time order, the first
    step-*i* event after the anchor is the earliest candidate — if that
    one is already past the window every later one is too, so the
    strict-first-touch and first-in-window semantics coincide and the
    check is a single extra comparison in the fold.

    Plan shape: the scan is pruned to funnel-step events only (for a
    3-step funnel over a 100-type stream that's the big reduction), then
    ONE user-key shuffle builds each user's time-ordered step-event list
    and a Catalyst ``aggregate`` fold walks it once, carrying the k
    conversion timestamps as the accumulator — no self-joins, no
    repeated passes, no Python. Per-user state is bounded by that user's
    step-event count; cap upstream if a bot user could hold millions.
    The final per-step count is a tiny conditional aggregate.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    bound = (
        F.expr(f"INTERVAL {int(within.total_seconds())} SECONDS")
        if within is not None
        else None
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    base = df.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_type"),
    ).where(F.col("_type").isin(*steps))
    per_user = base.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_type"))).alias("_evs")
    )

    def _advance(acc: Column, ev: Column) -> Column:
        outs = []
        prev_new: Column | None = None
        for i, s in enumerate(steps):
            cur = acc[f"t{i}"]
            if i == 0:
                cond = cur.isNull() & (ev["_type"] == s)
            else:
                cond = (
                    cur.isNull()
                    & (ev["_type"] == s)
                    & prev_new.isNotNull()
                    & (ev["_ts"] > prev_new)
                )
                if bound is not None:
                    cond = cond & (ev["_ts"] <= prev_new + bound)
            new = F.when(cond, ev["_ts"]).otherwise(cur)
            outs.append(new.alias(f"t{i}"))
            prev_new = new
        return F.struct(*outs)

    state = per_user.select(
        F.aggregate(
            "_evs", _funnel_state(steps, ts_type), _advance
        ).alias("_st")
    )
    # coalesce: on an empty input sum() is NULL, but the count semantics
    # (and any COUNT(*)-based oracle) call for 0
    counts = state.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("_st")[f"t{i}"].isNotNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(i).alias("step_index"),
            F.lit(s).alias("step"),
            F.col(f"_n{i}").cast("long").alias("n_users"),
        )
        for i, s in enumerate(steps)
    ]
    return counts.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.step_index", "r.step", "r.n_users")
