"""Interleaved A/B probe for runtime-settable SQL conf levers (r14).

The host oscillates between fast and slow modes (SCALE.md r11-r14), so
back-to-back interleaving inside ONE session is the only honest protocol
for config experiments: A,B,A,B,... per query, report per-arm min.

Usage:
    python tools/conf_ab_probe.py --conf spark.sql.join.preferSortMergeJoin=false \
        [--conf k=v ...] [--rounds 3] q1 q2 ...

Arm A = session defaults (gdutils_spark.session.get_spark), arm B = the
given confs applied via spark.conf.set; every conf is restored between
arms so each sample runs under exactly one arm. Timing matches bench.py
(fn(spark, SF_DIR).collect() wall).
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
    args = sys.argv[1:]
    confs: dict[str, str] = {}
    rounds = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        elif a == "--rounds":
            rounds = int(args[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1
    if not confs:
        raise SystemExit("need at least one --conf k=v")
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("gdutils-conf-ab")
    baseline = {k: spark.conf.get(k, None) for k in confs}
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warm

    def set_arm(b: bool) -> None:
        for k in confs:
            if b:
                spark.conf.set(k, confs[k])
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    out: dict[str, dict[str, list[float]]] = {}
    for name in names:
        fn = QUERIES[name]
        samples: dict[str, list[float]] = {"A": [], "B": []}
        # one untimed warm run (either arm) primes footers/codegen
        set_arm(False)
        fn(spark, SF_DIR).collect()
        for _ in range(rounds):
            for arm, b in (("A", False), ("B", True)):
                set_arm(b)
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                t0 = time.time()
                fn(spark, SF_DIR).collect()
                samples[arm].append(round(time.time() - t0, 4))
        set_arm(False)
        out[name] = samples
        a, b = min(samples["A"]), min(samples["B"])
        print(
            f"{name}: A(min)={a:.3f} B(min)={b:.3f} "
            f"B/A={b / a:.3f}  A={samples['A']} B={samples['B']}",
            flush=True,
        )
    tot_a = sum(min(s["A"]) for s in out.values())
    tot_b = sum(min(s["B"]) for s in out.values())
    print(f"TOTAL A={tot_a:.2f} B={tot_b:.2f} B/A={tot_b / tot_a:.3f}")


if __name__ == "__main__":
    main()
