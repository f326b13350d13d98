"""Standalone quiet-box probe: the bench's fixed-work shuffle calib
(bench._shuffle_probe, imported — not duplicated — so the probe cannot
drift from what the bench gates on) plus the pure-python loop, run in a
throwaway local session. Prints one JSON line. Used between full-bench
attempts to decide when the box has left a bandwidth wave WITHOUT paying
a full bench launch (r14: a run launched on <0.3%-steal samples still
opened at shuffle_s 10.4s — steal does not see the bandwidth-wave mode,
only an actual exchange does).

r15 ADVICE fixes: the session mirrors bench._make_session's partitioning
(shuffle.partitions = SPARK_GRAFT_CPUS, not a hardcoded 32) so shuffle_s
is comparable to the bench calib floor at any core count, and the
reported ``shuffle_s`` is the MAX of the samples — the bench's gate takes
a single sample, so a wave tail (slow sample 1, quiet sample 2) must not
report a clearing min.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _shuffle_probe  # noqa: E402


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
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .getOrCreate()
    )
    # warm one tiny job AND one untimed shuffle-probe execution: the first
    # run of the probe query pays whole-stage codegen (~1s, observed as a
    # consistent sample-1 > sample-2 bias), which would make the max-rule
    # below gate on compilation, not the box
    spark.range(1000).count()
    _shuffle_probe(spark)
    samples = [_shuffle_probe(spark) for _ in range(2)]
    spark.stop()
    # go/no-go on the WORSE sample: the bench calib gate is single-sample
    print(json.dumps({"py_loop_s": py_s, "shuffle_s": max(samples),
                      "shuffle_samples": samples}))


if __name__ == "__main__":
    main()
