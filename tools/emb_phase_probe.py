"""Job-count + phase probe for the emb_* ANN queries (r15, guide §1).

VERDICT r14 item 3 says the emb family's cost is JOB/STAGE COUNT, not
data. This probe verifies that: for each named query it times
(a) CONSTRUCTION (the eager driver-side work: seeds/Lloyd/toPandas/
guards) and (b) the final collect, and reports how many Spark jobs each
phase launched (statusTracker job ids delta).

Usage:
    python tools/emb_phase_probe.py emb_ivfpq_residual_recall ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdutils_spark.queries import QUERIES  # noqa: E402
from gdutils_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("gdutils-emb-phase-probe")
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    # warm the session like bench.py
    from gdutils_spark.sources.tables import load_table

    load_table(spark, SF_DIR, "embeddings").agg(F.count(F.lit(1))).collect()

    def n_jobs() -> int:
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    for name in names:
        fn = QUERIES[name]
        # warm run first (bench methodology is warm min-of-3)
        fn(spark, SF_DIR).collect()
        for rep in range(2):
            j0, t0 = n_jobs(), time.perf_counter()
            df = fn(spark, SF_DIR)
            j1, t1 = n_jobs(), time.perf_counter()
            df.collect()
            j2, t2 = n_jobs(), time.perf_counter()
            print(
                f"{name} rep{rep}: construct {t1 - t0:6.3f}s "
                f"({j1 - j0:3d} jobs)   collect {t2 - t1:6.3f}s "
                f"({j2 - j1:3d} jobs)   total {t2 - t0:6.3f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
