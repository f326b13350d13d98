"""Strict raw-value comparison of every queries() entry against its
oracle_sql() twin — NO float rounding (unlike tests/test_entry_oracle.py,
which rounds both sides to 6dp before comparing). The driver's value-hash
comparator's tolerance is unknown, so any entry that only matches after
rounding is a driver-red risk: its floats should be rounded IN the query
and IN the oracle SQL, not by the comparator.

The oracle side is fetched via ``fetchdf()`` (the driver's pandas path),
and each column's pandas dtype KIND is compared against the kind the
Spark schema maps to — this catches representation bugs the raw
``fetchall()`` comparison is blind to, e.g. an un-CAST DuckDB ``sum()``
returning HUGEINT, which pandas renders as float64 (121.0) while Spark
emits int64 (121): raw values equal, driver hash red (the round-6
``conductance`` defect).

Reports per-entry: exact match / dtype-kind mismatch / float drift
(max abs delta) / hard mismatch. Usage:
python tools/strict_compare.py [name ...]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from graphframes_rs_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _key(row, float_digits=6):
    out = []
    for v in row:
        if isinstance(v, float):
            out.append(round(v, float_digits) if not math.isnan(v) else "nan")
        else:
            out.append(v)
    return tuple(out)


def spark_pandas_kind(dt) -> str:
    """The pandas dtype kind a NULL-free Spark column of type ``dt``
    lands on after toPandas (the entry policy forbids NULLs, so the
    nullable-int-to-float pandas promotion never applies)."""
    if isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, (T.TimestampType, T.DateType)):
        # Arrow-backed toPandas lands DateType on datetime64 too
        return "M"
    return "O"


def main():
    wanted = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = entry.oracle_sql()
    risky = []
    for name, fn in entry.queries().items():
        if wanted and name not in wanted:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            # toPandas, not collect: the driver compares pandas-to-pandas,
            # so e.g. a NULL double is NaN on BOTH sides (collect() would
            # give None on the Spark side and false-flag entries like
            # snapshot_diff whose inserted/deleted rows carry NULL bals)
            spdf = sdf.toPandas()
            cols = list(spdf.columns)
            s_kinds = {c: spdf[c].dtype.kind for c in cols}
            schema_kinds = {
                f.name: spark_pandas_kind(f.dataType)
                for f in sdf.schema.fields
            }
            degraded = {
                c: (schema_kinds[c], s_kinds[c])
                for c in cols
                if schema_kinds.get(c) not in (None, s_kinds[c])
            }
            if degraded:
                # NULLs degraded a Spark column's pandas dtype (int64 ->
                # float64/object) — worth knowing, but the driver sees the
                # degraded kind, so compare with that
                print(f"{name}: note: null-degraded kinds {degraded}", flush=True)
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            s_rows = sorted(
                tuple(_key([r[i] for i in order], 12))
                for r in spdf.itertuples(index=False, name=None)
            )
            # the driver's pandas path: dtype kinds come from fetchdf,
            # where e.g. HUGEINT (an un-CAST sum) degrades to float64
            ddf = con.execute(oracles[name]).fetchdf()
            d_cols = list(ddf.columns)
            d_kinds = {c: ddf[c].dtype.kind for c in d_cols}
            d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            d_rows = sorted(
                tuple(_key([r[i] for i in d_order], 12))
                for r in ddf.itertuples(index=False, name=None)
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}", flush=True)
            risky.append((name, "error"))
            continue
        kind_diffs = {
            c: (s_kinds.get(c), d_kinds.get(c))
            for c in set(s_kinds) | set(d_kinds)
            if s_kinds.get(c) != d_kinds.get(c)
        }
        if kind_diffs:
            print(f"{name}: KIND_MISMATCH {kind_diffs}", flush=True)
            risky.append((name, f"dtype kinds {kind_diffs}"))
            continue
        if s_rows == d_rows:
            print(f"{name}: exact", flush=True)
            continue
        # quantify float drift: compare row-by-row after 6dp rounding
        s6 = sorted(tuple(_key(r, 6)) for r in s_rows)
        d6 = sorted(tuple(_key(r, 6)) for r in d_rows)
        if s6 == d6:
            max_d = 0.0
            for a, b in zip(s_rows, d_rows):
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        max_d = max(max_d, abs(x - y))
            print(f"{name}: FLOAT_DRIFT max_abs_delta={max_d:.3e}", flush=True)
            risky.append((name, f"drift {max_d:.1e}"))
        else:
            print(f"{name}: MISMATCH_EVEN_AT_6DP", flush=True)
            risky.append((name, "hard mismatch"))
    print(f"\n{len(risky)} risky entries:")
    for name, why in risky:
        print(f"  {name}: {why}")
    spark.stop()


if __name__ == "__main__":
    main()
