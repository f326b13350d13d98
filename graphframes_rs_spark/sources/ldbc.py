"""LDBC Graphalytics test-graph loader.

Mirrors reference src/utils/testing_utils.rs:45-85: space-delimited,
headerless CSV with explicit schemas (never inference). Layout per dataset
``<ds>`` under a base dir:

    <ds>/<ds>.v.csv        id
    <ds>/<ds>.e.csv        src dst [weight]
    <ds>/<ds>-BFS.csv      vertex_id expected_distance
    <ds>/<ds>-WCC.csv      vertex_id expected_component
    <ds>/<ds>-PR.csv       vertex_id expected_pr
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from graphframes_rs_spark.graphframe import GraphFrame

VERTEX_SCHEMA = StructType([StructField("id", LongType(), False)])
EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)
WEIGHTED_EDGE_SCHEMA = StructType(
    EDGE_SCHEMA.fields + [StructField("weight", DoubleType(), True)]
)


def _read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.csv(path, schema=schema, sep=" ", header=False)


def load_ldbc_graph(
    spark: SparkSession, base_dir: str, name: str, weighted: bool = False
) -> GraphFrame:
    d = os.path.join(base_dir, name)
    vertices = _read_csv(spark, os.path.join(d, f"{name}.v.csv"), VERTEX_SCHEMA)
    edges = _read_csv(
        spark,
        os.path.join(d, f"{name}.e.csv"),
        WEIGHTED_EDGE_SCHEMA if weighted else EDGE_SCHEMA,
    )
    return GraphFrame(vertices, edges)


def load_ldbc_expected(
    spark: SparkSession, base_dir: str, name: str, algorithm: str
) -> DataFrame:
    """Golden output for BFS / WCC / PR."""
    value_type = DoubleType() if algorithm == "PR" else LongType()
    schema = StructType(
        [
            StructField("vertex_id", LongType(), False),
            StructField("expected", value_type, False),
        ]
    )
    path = os.path.join(base_dir, name, f"{name}-{algorithm}.csv")
    return _read_csv(spark, path, schema)
