"""Replicates the DRIVER's t2 canonicalization path (not the pytest oracle
replay): every queries() entry is collected via toPandas() and run through
pandas sort_values over all columns — the exact operation that failed for
array-typed columns in round 5 ("TypeError: unhashable type: 'list'" in
the driver's canonicalizer). Catches driver-comparability regressions
(unsortable dtypes, mixed-object columns) before the driver does.

Usage: python tools/driver_sim.py [first_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    first_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10**9
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for i, (name, fn) in enumerate(entry.queries().items()):
        if i >= first_n:
            break
        t0 = time.monotonic()
        try:
            pdf = fn(spark, SF_DIR).toPandas()
            pdf.sort_values(list(pdf.columns))  # the driver's canon step
            # NULL/NaN policy: entries must be null-free (unknown driver
            # comparator semantics on missing values)
            n_null = int(pdf.isna().sum().sum())
            status = "ok" if n_null == 0 else f"HAS_NULLS({n_null})"
            if n_null:
                failures.append((name, status))
        except Exception as exc:  # noqa: BLE001 — report, don't stop
            status = f"FAIL {type(exc).__name__}: {exc}"
            failures.append((name, status))
        print(
            f"{i:3d} {name}: {status} rows={len(pdf) if 'pdf' in dir() else '?'} "
            f"({time.monotonic() - t0:.1f}s)",
            flush=True,
        )
    print(f"\n{len(failures)} problem(s)")
    for name, status in failures:
        print(f"  {name}: {status}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
