"""JSONL (newline-delimited JSON) document source.

Training corpora ship as JSONL far more often than parquet; the loader
mirrors the parquet table loader's contract (explicit schema, typed
columns) and makes the malformed-line policy EXPLICIT — the silent
default (PERMISSIVE with nulls) loses data without a trace at 100 TB.

Modes:
- ``'capture'`` (default): malformed lines land in a ``_corrupt`` column
  (the raw text), well-formed rows parse normally — audit then decide;
- ``'drop'``: DROPMALFORMED — silently discards bad lines (count the
  input first if you need a loss budget);
- ``'fail'``: FAILFAST — any malformed line aborts the read.

An explicit schema is REQUIRED: schema inference reads the whole input
once before the real scan (two passes over 100 TB) and types drift with
whatever batch happened to be sampled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
    malformed: str = "capture",
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema and a named
    malformed-line policy (see module docstring)."""
    modes = {"capture": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}
    if malformed not in modes:
        raise ValueError(f"malformed must be one of {sorted(modes)}")
    reader = spark.read
    if malformed == "capture":
        schema = StructType(
            list(schema.fields) + [StructField("_corrupt", StringType())]
        )
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt")
    return reader.schema(schema).option("mode", modes[malformed]).json(path)


def corrupt_report(df: DataFrame) -> DataFrame:
    """[n_rows, n_corrupt, corrupt_frac] for a ``capture``-mode read.

    Spark's analyzer refuses ANY aggregate that references the internal
    corrupt-record column over a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — verified: even aggs also reading
    data columns trip it), and the documented cache() workaround is
    wrong at corpus scale. Instead the count runs as one Arrow-batched
    ``mapInPandas`` pass (no column pruning, so the scan is legal) with
    per-partition partials summed by a normal aggregate — one pass, a
    few counters per task."""
    import pandas as pd

    if "_corrupt" not in df.columns:
        raise ValueError("corrupt_report needs a capture-mode read_jsonl frame")

    def _partials(batches):
        n = nc = 0
        for pdf in batches:
            n += len(pdf)
            nc += int(pdf["_corrupt"].notna().sum())
        yield pd.DataFrame({"n": [n], "nc": [nc]})

    part = df.mapInPandas(_partials, "n long, nc long")
    return part.groupBy().agg(
        F.sum("n").alias("n_rows"),
        F.sum("nc").alias("n_corrupt"),
        F.round(F.sum("nc") / F.sum("n"), 6).alias("corrupt_frac"),
    )
