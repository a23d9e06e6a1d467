"""Decompose the ~6 s wall cost of the rt_stream_stream_* bench queries
into fixed micro-batch machinery vs real join work (VERDICT r9 task 6).

Four measurements around ONE representative query (the inner
stream-stream interval join at sf0.1, the rt_stream_stream_join shape):

1. **batch-equivalent** — the same interval join as a plain batch query:
   the actual data work, no streaming machinery.
2. **streaming, tiny input** — the identical streaming pipeline over a
   100-row slice: everything left is machinery (query start/stop,
   checkpoint + offset-log IO, state-store instance create/commit per
   shuffle partition per micro-batch, the final no-data batch, sink
   parquet commit, read-back).
3. **streaming, full input, default partitions** — the bench number.
4. **streaming, full input, shuffle.partitions=4** — same data, 8× fewer
   state-store instances; the delta against (3) is the per-partition
   state-store overhead share.

Run from the repo root: ``python tools/streaming_overhead_probe.py``.
Prints the markdown rows cited in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from gdutils_spark.session import get_spark
    from gdutils_spark.sources.tables import load_table
    from gdutils_spark.streaming import stream_stream_join

    spark = get_spark("streaming-overhead-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "events").where(
        F.col("user_id") < 60
    ).select("user_id", "event_type", "ts", "event_id")
    n_full = base.count()

    def run_streaming(e, tag: str, partitions: int | None = None) -> float:
        d = os.path.join(tempfile.gettempdir(), f"gdutils_probe_{tag}")
        shutil.rmtree(d, ignore_errors=True)
        src, chk, out = (os.path.join(d, x) for x in ("src", "chk", "out"))
        e.write.mode("append").parquet(src)
        old = spark.conf.get("spark.sql.shuffle.partitions")
        if partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        try:
            t0 = time.perf_counter()
            stream = spark.readStream.schema(e.schema).parquet(src)
            clicks = stream.where(F.col("event_type") == "click").select(
                "user_id",
                F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"),
            )
            purchases = stream.where(
                F.col("event_type") == "purchase"
            ).select(
                "user_id",
                F.col("ts").alias("purchase_ts"),
                F.col("event_id").alias("purchase_id"),
            )
            joined = stream_stream_join(
                clicks,
                purchases,
                key="user_id",
                left_time="click_ts",
                right_time="purchase_ts",
                max_delay="6 hours",
            ).select("user_id", "click_id", "purchase_id")
            q = (
                joined.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300)
            n = spark.read.parquet(out).count()
            return time.perf_counter() - t0, n
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    def best(fn, runs=3):
        results = [fn(i) for i in range(runs)]
        return min(t for t, _ in results), results[0][1]

    # 1. batch-equivalent work
    def batch_run(_i):
        t0 = time.perf_counter()
        clicks = base.where(F.col("event_type") == "click").select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        purchases = base.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        n = (
            clicks.join(purchases, "user_id")
            .where(
                (F.col("purchase_ts") >= F.col("click_ts"))
                & (
                    F.col("purchase_ts")
                    <= F.col("click_ts") + F.expr("INTERVAL 6 HOURS")
                )
            )
            .count()
        )
        return time.perf_counter() - t0, n

    t_batch, n_batch = best(batch_run)
    tiny = base.limit(100).localCheckpoint()
    t_tiny, n_tiny = best(lambda i: run_streaming(tiny, f"tiny{i}"))
    t_full, n_out = best(lambda i: run_streaming(base, f"full{i}"))
    t_p4, n_p4 = best(lambda i: run_streaming(base, f"p4_{i}", partitions=4))

    print(f"fixture: {n_full} event rows (user_id<60), join output {n_out}")
    print()
    print("| measurement | warm best-of-3 |")
    print("|---|---|")
    print(f"| batch interval join (the real work) | {t_batch:.2f} s |")
    print(f"| streaming pipeline, 100-row input (pure machinery) | {t_tiny:.2f} s |")
    print(f"| streaming pipeline, full input, default partitions | {t_full:.2f} s |")
    print(f"| streaming pipeline, full input, shuffle.partitions=4 | {t_p4:.2f} s |")
    assert n_p4 == n_out  # partitions must not change the result


if __name__ == "__main__":
    main()
