"""Full-lineage before/after plans for the iterative graph operators.

The graph loops pin each iteration behind ``localCheckpoint``, so a
normal ``explain`` of the returned DataFrame shows only the final
``Scan ExistingRDD`` tail — the per-iteration join strategy (the thing
the r14 broadcast gate changes) is invisible. This probe makes
``localCheckpoint`` an IDENTITY while building the plan (plan shape
only — never used for timing, and the gate's bounded ``count()`` /
``first()`` probes still execute real jobs), then dumps
``explain("formatted")`` of the full unrolled lineage twice per
operator:

* ``*_before``: broadcast gate OFF (``broadcast_max_nodes/edges=None``)
  — the pre-r14 shuffle path (per-iteration Exchange + Sort under
  SortMergeJoin).
* ``*_after``: gate at its default — the shipped path (per-iteration
  BroadcastHashJoin, edge list never re-exchanged).

Inputs are the SAME copurchase edge builder and constants the registry
queries use, so the dumped shapes are the queries' shapes.

Usage: ``python tools/iteration_plan_probe.py`` (writes
``plans/r14/<name>_iterbody_{before,after}.txt``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.dataframe as _D  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gdutils_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


class _no_checkpoint:
    """Context manager: DataFrame.localCheckpoint -> identity.

    Spark 4 resolves the method on the CONCRETE class
    (``pyspark.sql.classic.dataframe.DataFrame``), which overrides the
    abstract ``pyspark.sql.dataframe.DataFrame`` — patch both."""

    def __enter__(self):
        import pyspark.sql.classic.dataframe as _CD

        self._targets = [
            (cls, cls.__dict__.get("localCheckpoint"))
            for cls in (_D.DataFrame, _CD.DataFrame)
            if "localCheckpoint" in cls.__dict__
        ]
        for cls, _ in self._targets:
            cls.localCheckpoint = lambda df, eager=True: df
        return self

    def __exit__(self, *exc):
        for cls, orig in self._targets:
            cls.localCheckpoint = orig
        return False


def _dump(df, name: str, tag: str) -> None:
    from gdutils_spark.plans import formatted_plan

    plan = formatted_plan(df)
    path = os.path.join(OUT, f"{name}_iterbody_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    n_ex = plan.count("Exchange") - plan.count("BroadcastExchange")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    print(
        f"{name:34s} {tag:6s} shuffle-Exchange={n_ex:3d} "
        f"BroadcastHashJoin={n_bhj:3d} SortMergeJoin={n_smj:3d} -> {path}"
    )


def main() -> None:
    spark = get_spark("gdutils-iterplan-probe")
    from gdutils_spark.operators.graph import (
        k_core,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from gdutils_spark.queries_ext import (
        _copurchase_edges,
        KCORE_ITERS,
        KCORE_K,
        LPA_ITERS,
        PR_DAMPING,
        PR_ITERS,
        PR_TOP,
    )

    both = _copurchase_edges(spark, SF_DIR, both_directions=True)
    half = _copurchase_edges(spark, SF_DIR, both_directions=False)
    wedges = both.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))

    def topk(pr):
        return (
            pr.orderBy(F.col("pr").desc(), F.col("node"))
            .limit(PR_TOP)
            .select(F.col("node").alias("part"), "pr")
        )

    cases = [
        (
            "part_copurchase_pagerank",
            lambda gate: topk(
                pagerank(
                    both,
                    damping=PR_DAMPING,
                    n_iters=PR_ITERS,
                    broadcast_max_nodes=gate,
                )
            ),
            8_000_000,
        ),
        (
            "part_copurchase_pagerank_weighted",
            lambda gate: topk(
                pagerank(
                    wedges,
                    damping=PR_DAMPING,
                    n_iters=PR_ITERS,
                    weight="w",
                    validate=False,
                    broadcast_max_nodes=gate,
                )
            ),
            8_000_000,
        ),
        (
            "part_copurchase_communities",
            lambda gate: label_propagation(
                both, n_iters=LPA_ITERS, broadcast_max_nodes=gate
            ),
            8_000_000,
        ),
        (
            # ONE iteration body only: each k-core round references the
            # previous edge set 5x (degrees union + two semi-join probes),
            # so the fully unrolled KCORE_ITERS lineage is 5^n copies of
            # the base (~200 MB of text at n=4). One body is exactly the
            # unit the broadcast gate changes; every round has this shape.
            "part_copurchase_kcore",
            lambda gate: k_core(
                half, k=KCORE_K, n_iters=1, broadcast_max_nodes=gate
            ),
            8_000_000,
        ),
        (
            "part_copurchase_triangles",
            lambda gate: triangle_count(half, broadcast_max_edges=gate),
            4_000_000,
        ),
    ]
    for name, build, default_gate in cases:
        with _no_checkpoint():
            _dump(build(None), name, "before")
        with _no_checkpoint():
            _dump(build(default_gate), name, "after")


if __name__ == "__main__":
    main()
