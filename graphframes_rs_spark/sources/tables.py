"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

``events.ts`` has been written by different driver generations as either a
parquet TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark ≥3.4
infers as TIMESTAMP_NTZ — a type that refuses numeric casts and would make
every epoch-seconds oracle column tz-ambiguous) or a TIMESTAMP(NANOS)
(which Spark's vectorized reader rejects outright, [PARQUET_TYPE_ILLEGAL]).
The loader pins both cases to one canonical type — TIMESTAMP (LTZ) whose
stored value IS the parquet epoch-micros, i.e. the wall-clock interpreted
as UTC exactly like the DuckDB oracle does — by flipping two scan-time
switches (schema resolution happens inside ``spark.read.parquet``, so
restoring the confs immediately after is safe):

* ``inferTimestampNTZ.enabled=false``: micros columns read as TIMESTAMP.
* ``nanosAsLong=true``: nanos columns read as LongType, then rebuilt with
  integer division (never float division — nanosecond epochs exceed
  double's 53-bit mantissa and would corrupt low-order digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_NANOS_TS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    ts_cols = _NANOS_TS.get(name, [])
    if not ts_cols:
        return spark.read.parquet(path)
    prev_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    prev_ntz = spark.conf.get(
        "spark.sql.parquet.inferTimestampNTZ.enabled", "true"
    )
    try:
        # both sets live inside the try so a failure on the second set can
        # never leave nanosAsLong flipped session-wide
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        df = spark.read.parquet(path)
        for c in ts_cols:
            if isinstance(df.schema[c].dataType, LongType):  # nanos-as-long
                df = df.withColumn(
                    c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
                )
        return df
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev_nanos)
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", prev_ntz
        )


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
