"""Standalone quiet-box probe: the bench's fixed-work shuffle calib
(bench._shuffle_probe) plus the pure-python loop, run in a throwaway
local session. Prints one JSON line. Used between full-bench attempts to
decide when the box has left a bandwidth wave WITHOUT paying a full
bench launch (r14: a run launched on <0.3%-steal samples still opened at
shuffle_s 10.4s — steal does not see the bandwidth-wave mode, only an
actual exchange does).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    t0 = time.monotonic()
    acc = 0
    for i in range(10_000_000):
        acc += i * 31 & 1023
    py_s = round(time.monotonic() - t0, 3)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe_quiet")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    # warm one tiny job so JVM/codegen startup is not in the probe
    spark.range(1000).count()
    samples = []
    for _ in range(2):
        t0 = time.monotonic()
        spark.range(32_000_000).selectExpr("id % 100000 AS k").groupBy(
            "k"
        ).count().selectExpr("sum(count)").collect()
        samples.append(round(time.monotonic() - t0, 3))
    spark.stop()
    print(json.dumps({"py_loop_s": py_s, "shuffle_s": min(samples),
                      "shuffle_samples": samples}))


if __name__ == "__main__":
    main()
