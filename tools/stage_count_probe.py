"""Runtime job/stage counts per registry query (r15 evidence probe).

The iterative graph loops pin every round behind ``localCheckpoint``,
so plan dumps (tools/iteration_plan_probe.py) need a stub that also
changes what executes (the pinned relations re-derive per reference in
the unrolled lineage).  This probe measures the REAL execution instead:
run each named query once (collect), then read the driver's
StatusTracker for the job group and report how many Spark jobs ran and
how many stages (and tasks) they contained.  A removed per-iteration
shuffle Exchange is one fewer stage per iteration here — ground truth
the stubbed plan cannot give.

Usage: python tools/stage_count_probe.py q1 q2 ...
Prints one line per query plus a JSON tail.
"""

from __future__ import annotations

import json
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
    spark = get_spark("gdutils-stage-count-probe")
    from gdutils_spark.sources.tables import load_table

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        load_table(spark, SF_DIR, t).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        group = f"stage_count:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).collect()
        wall = round(time.perf_counter() - t0, 3)
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
            "wall_s": wall,
        }
        print(
            f"{name}: jobs={len(job_ids)} stages={n_stages} "
            f"tasks={n_tasks} wall={wall}s",
            flush=True,
        )
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
