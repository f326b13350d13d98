"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's vectorized
reader rejects outright ([PARQUET_TYPE_ILLEGAL]). The loader flips the
``nanosAsLong`` legacy switch for the scan and rebuilds a microsecond
timestamp with integer division (never float division — nanosecond epochs
exceed double's 53-bit mantissa and would corrupt low-order digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    nanos_cols = _NANOS_TS.get(name, [])
    if not nanos_cols:
        return spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        for c in nanos_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return df
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
