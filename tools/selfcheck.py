#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compare row count, column
names, and a value hash over (column-name-sorted, row-sorted, float-rounded)
cells.  Usage::

    python tools/selfcheck.py [sf_dir] [entry ...]

Defaults to /root/testdata/sf0.01 and all entries.  Prints one line per
entry and a failure summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0.000000e+00"
        return f"{v:.6e}"
    if isinstance(v, (np.floating,)):
        return _norm_cell(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_df(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    ]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("selfcheck")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            continue
        rows_ok = len(spdf) == len(opdf)
        schema_ok = sorted(spdf.columns) == sorted(opdf.columns)
        hash_ok = rows_ok and schema_ok and _hash_df(spdf) == _hash_df(opdf)
        status = "ok" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        print(
            f"{status:<4} {name}: rows={len(spdf)}/{len(opdf)} "
            f"schema={schema_ok} hash={hash_ok} [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL":
            failures.append(
                (name, f"rows={len(spdf)}/{len(opdf)} schema={schema_ok} hash={hash_ok}")
            )
    print(f"\n{len(failures)} failures")
    for n, msg in failures:
        print(f"  {n}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
