"""Change-data-capture application: MERGE-INTO semantics and SCD2
history builds, the warehouse maintenance operators a batch engine needs
once data stops being append-only.

Spark has no MERGE INTO without a table format (Delta/Iceberg), but the
relational core is two shuffles:

* :func:`apply_cdc` — apply an (insert/update/delete) change batch to a
  snapshot: latest-change-per-key, then ``snapshot ANTI JOIN changed
  keys UNION ALL upserts``. One shuffle on the merge key each side; the
  snapshot never moves except on that key, so at 100 TB this is exactly
  the copy-on-write merge a lakehouse format runs internally — with
  bucketed tables the anti join is shuffle-free.
* :func:`scd2_history` — collapse a change stream into type-2 dimension
  rows ``(key, attrs, valid_from, valid_to, is_current)``: change-point
  detection by ``lag`` + interval close by ``lead``, two window passes
  over the same (key, ts) sort order — one shuffle total.

Both are pure window/join compositions — deterministic, no UDFs, and
replayable as ANSI SQL (driver-verified).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Apply a CDC batch to a snapshot (MERGE INTO semantics).

    ``changes`` carries full rows in the snapshot's schema plus
    ``op_col`` ('I' | 'U' | 'D') and optionally ``seq_col`` (a change
    sequence number; when given, only the latest change per key
    applies). Deletes drop the key; inserts and updates both land the
    change row (upsert — 'I' vs 'U' is audit metadata, not behavior,
    matching MERGE WHEN [NOT] MATCHED).

    The op domain is VALIDATED: a NULL or unrecognized op raises instead
    of silently corrupting the merge (a NULL op would fail the upsert
    filter yet still anti-join its snapshot row away — a dirty-feed row
    must not delete data). The probe is LIMIT-bounded over the (small)
    change batch. Equal sequences tie-break on op ('U' > 'I' > 'D', so
    an update beats a simultaneous delete deterministically); rows equal
    in (key, seq, op) but differing in payload are the caller's contract
    to prevent — use unique sequences per key. Without ``seq_col`` the
    batch must carry at most ONE DISTINCT change row per key — VALIDATED
    with a LIMIT-bounded probe (conflicting changes would all survive
    the upsert filter and silently break snapshot key uniqueness);
    fully identical duplicates (at-least-once delivery retries) are
    idempotent and collapse instead of raising.

    ``validate=False`` skips BOTH eager probes (the op-domain check and,
    without ``seq_col``, the duplicate-key check) — the trusted-feed
    escape hatch, same convention as ``pagerank``'s ``ordered_fold=
    False``: each probe is an extra Spark JOB over the change batch,
    pure overhead for a production merge loop whose feed already
    guarantees clean ops and key-unique batches (a CDC connector with
    exactly-once delivery). The LAZY no-seq dropDuplicates retry-
    collapse is kept either way: it is plan work (one batch-sized
    exchange), not a probe job, and dropping it would let an
    at-least-once redelivery write a key twice — strictly more safety
    loss than the perf motivation covers. The caller then OWNS the
    probe contracts: a bad op or a CONFLICTING no-seq duplicate
    silently corrupts the merge exactly as documented above. Keep the
    default for anything hand-built or third-party.
    """
    keys = list(keys)
    if validate:
        bad = (
            changes.where(
                F.col(op_col).isNull() | ~F.col(op_col).isin("I", "U", "D")
            )
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"apply_cdc: change batch contains a row with {op_col}="
                f"{bad[0][op_col]!r}; ops must be 'I', 'U' or 'D'"
            )
    latest = changes
    if seq_col is None:
        # no-seq contract: at most ONE DISTINCT change row per key —
        # with several conflicting changes for a key, every non-delete
        # would survive the upsert filter and silently break the
        # snapshot's key uniqueness. Fully identical duplicate rows
        # (an at-least-once feed retrying the same change) are
        # idempotent, so they collapse rather than raise — a retried
        # delete must not crash a streaming merge. The collapse is lazy
        # and always on; only the conflicting-duplicate PROBE (an eager
        # LIMIT-bounded job, like the op-domain check) is validate-gated.
        latest = changes.dropDuplicates()
        if validate:
            dup = (
                latest.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    "apply_cdc: change batch has multiple distinct rows "
                    f"for key {tuple(dup[0][k] for k in keys)!r} but "
                    "seq_col is None; pass seq_col so the latest change "
                    "per key can be chosen"
                )
    if seq_col is not None:
        w = Window.partitionBy(*keys).orderBy(
            F.col(seq_col).desc(), F.col(op_col).desc()
        )
        latest = (
            changes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    payload = [c for c in snapshot.columns]
    upserts = latest.where(F.col(op_col) != F.lit("D")).select(*payload)
    untouched = snapshot.join(latest.select(*keys), keys, "left_anti")
    return untouched.unionByName(upserts)


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from an event
    stream: one row per (key, attribute-state) interval, opened at the
    first event that put the key in that state and closed by the next
    state change (open intervals have ``valid_to`` NULL and
    ``is_current`` true).

    Consecutive events with identical attributes collapse into one
    interval. Ordering is (ts, *tiebreak_cols) — pass a unique
    tie-breaker (an event id) if timestamps can collide, otherwise the
    history is not well-defined. NULL-safe attribute comparison (a
    NULL→value transition is a change). Rows with a NULL timestamp are
    DROPPED — a state change at an unknown time has no place on a
    validity timeline (and NULLs sort first, which would fabricate a
    NULL-valid_from interval plus a spurious change point).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    df = df.where(F.col(ts_col).isNotNull())
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # first row per key by row_number, not lag(ts).isNull() — the
    # latter conflates "no previous row" with "previous ts was NULL"
    first = F.row_number().over(w) == 1
    points = df.select(
        *keys, *attrs, F.col(ts_col), *tiebreak_cols
    ).withColumn("_chg", first | changed)
    cp = points.where(F.col("_chg")).drop("_chg")
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        cp.select(
            *keys,
            *attrs,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots of the same table —
    ``(keys..., change, changed_cols)`` with ``change`` one of
    ``added`` (key only in ``new``), ``removed`` (only in ``old``) or
    ``changed`` (in both, at least one compared column differs under
    NULL-safe equality); unchanged keys are omitted. ``changed_cols``
    is the comma-joined sorted list of differing columns — a STRING,
    not an array, so the relation stays driver-hashable (the
    emb_quantize convention). The reconciliation report a pipeline runs
    between a table's nightly versions: :func:`apply_cdc` APPLIES a
    known change batch; this RECOVERS the change batch when all you
    kept is the two snapshots (audit, backfill-drift detection,
    cross-engine migration checks).

    ``compare_cols`` defaults to every shared non-key column. Keys must
    be unique per snapshot (a snapshot is by definition one row per
    key) — enforced upstream or by the caller; the join itself never
    duplicates beyond input multiplicity.

    Plan shape: ONE full outer sort-merge join on the key (both sides
    shuffle once on the same key — bucketed tables make it
    shuffle-free), then the classification is a pure projection:
    per-column NULL-safe comparisons folded into a concat_ws. No
    window, no second pass, no driver-side anything; at 100 TB this is
    the minimal movement any diff can do."""
    if not key_cols:
        raise ValueError("snapshot_diff: need at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in set(key_cols)
        ]
    missing = [
        c
        for c in list(key_cols) + list(compare_cols)
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"snapshot_diff: columns missing from a snapshot: {missing}")
    reserved = {"change", "changed_cols"} & set(key_cols)
    if reserved:
        # a key named like an output column would emit a duplicate-name
        # schema that only fails at a distant downstream select (the
        # normalize_columns hazard class, r11 hunt)
        raise ValueError(
            f"snapshot_diff: key columns {sorted(reserved)} collide with "
            "the output's change/changed_cols columns — rename them first"
        )
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    # PLAIN key equality, not eqNullSafe: (a) it matches the SQL oracle's
    # `ON o.k = n.k` exactly, (b) null-safe join keys break the bucketed
    # shuffle-free path (HashPartitioning only satisfies plain equi-keys
    # — plan-pinned in test_staging.py), and (c) a NULL key has no row
    # identity — such rows surface VISIBLY as one 'removed' (old side)
    # plus one 'added' (new side) instead of being silently paired.
    cond = None
    for k in key_cols:
        eq = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in sorted(compare_cols)
    ]
    changed_cols = F.concat_ws(",", *diffs) if diffs else F.lit("")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
                for k in key_cols
            ],
            "change",
            F.when(F.col("change") == "changed", changed_cols)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )
