"""Measure what `salted_join` buys on a hot-key fixture.

Builds a skewed fact table from the sf0.1 events scan (one synthetic key
owns ~50% of all rows), then compares the plain shuffle join against
`sources.staging.salted_join` on two observables:

* **shuffle balance** — rows landing in the busiest shuffle partition
  when distributing by the join key (what the join's Exchange does)
  versus by (key, salt). The hot key pins its full row count onto ONE
  task in the plain plan; salting spreads it over S tasks.
* **wall time** — the same join executed both ways with AQE's skew-join
  mitigation disabled, so the plain plan's straggler is visible. (AQE
  ON is the production default and handles moderate skew by splitting
  oversized partitions at runtime; salting is the explicit fix when a
  single key exceeds one task's memory, which AQE splitting cannot help
  because all rows of one key must meet in one task for a shuffle join.)

Run from the repo root: ``python tools/skew_probe.py``. Prints the
markdown rows cited in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PARTITIONS = 32
SALTS = 16


def main() -> None:
    from pyspark.sql import functions as F

    from gdutils_spark.session import get_spark
    from gdutils_spark.sources.staging import salted_join
    from gdutils_spark.sources.tables import load_table

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, SF_DIR, "events")
    # hot-key fixture: half of all rows collapse onto key 0, the rest
    # keep a uniform key — the "one platform owns half the observations"
    # shape from SCALE.md
    facts = events.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id") + 1)
        .alias("key"),
        "event_id",
        "value",
    )
    dims = (
        facts.select("key")
        .distinct()
        .withColumn("attr", F.concat(F.lit("k"), F.col("key")))
    )
    n = facts.count()

    def busiest(df, *cols):
        per = (
            df.repartition(PARTITIONS, *cols)
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
        )
        row = per.agg(
            F.max("count").alias("mx"), F.count("*").alias("parts")
        ).first()
        return row.mx, row.parts

    plain_max, plain_parts = busiest(facts, "key")
    salt = F.pmod(F.xxhash64("key", "event_id", "value"), F.lit(SALTS))
    salted_max, salted_parts = busiest(
        facts.withColumn("__salt", salt.cast("int")), "key", "__salt"
    )

    # wall time with AQE skew handling off so the straggler is visible;
    # dim broadcast disabled so both plans actually shuffle-join
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def timed(df):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.groupBy().agg(F.count(F.lit(1))).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    t_plain = timed(facts.join(dims, "key"))
    t_salted = timed(salted_join(facts, dims, "key", salts=SALTS))
    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    print(f"fixture: {n} fact rows, hot key owns ~50%  (sf_dir={SF_DIR})")
    print("| distribution | busiest-partition rows | share of table | used partitions |")
    print("|---|---|---|---|")
    print(
        f"| by key (plain join) | {plain_max} | {plain_max / n:.1%} | {plain_parts} |"
    )
    print(
        f"| by (key, salt×{SALTS}) | {salted_max} | {salted_max / n:.1%} | {salted_parts} |"
    )
    print()
    print("| join (AQE skew-join off, no broadcast) | warm best-of-3 |")
    print("|---|---|")
    print(f"| plain shuffle join | {t_plain:.2f} s |")
    print(f"| salted_join (S={SALTS}) | {t_salted:.2f} s |")


if __name__ == "__main__":
    main()
