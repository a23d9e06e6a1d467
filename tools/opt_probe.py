"""Targeted optimization probe (r14): time named registry queries with
the bench methodology (warm min-of-N on the bench session at
$SPARK_GRAFT_SF_DIR) and optionally dump their ``explain("formatted")``
plans into plans/r14/.

Usage:
    python tools/opt_probe.py q1 q2 ...              # time only
    python tools/opt_probe.py --plans before q1 ...  # also write
        plans/r14/<name>_before.txt (or after)
    python tools/opt_probe.py --runs 5 q1            # more samples

Timing matches bench.py: fn(spark, SF_DIR).collect() wall time, report
min + all samples. Streaming queries are timed once per run like any
other (bench.py's single-run exception only covers two names).
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
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("gdutils-opt-probe")
    # same infrastructure warmup as bench.py: parquet footers + codegen +
    # python worker pool, so first-run numbers aren't JVM-cold outliers
    from pyspark.sql import functions as F

    from gdutils_spark.sources.tables import load_table

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        load_table(spark, SF_DIR, t).count()
    spark.range(1000).select(
        F.sum((F.col("id").cast("decimal(18,2)") * 2).cast("double")).alias("s")
    ).collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if plans_tag:
            os.makedirs(PLANS_DIR, exist_ok=True)
            from gdutils_spark.plans import formatted_plan

            df = fn(spark, SF_DIR)
            plan = formatted_plan(df)
            with open(
                os.path.join(PLANS_DIR, f"{name}_{plans_tag}.txt"), "w"
            ) as f:
                f.write(plan)
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(f"{name}: min={min(samples)} samples={samples}", flush=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
