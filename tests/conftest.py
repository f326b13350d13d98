import os

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("spark_ckpt"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graphframes-rs-spark-tests")
        # Small shuffle fan-out: test graphs are tiny and iterative loops run
        # many small jobs; 4 partitions keeps scheduler overhead low. Prod
        # sizing guidance lives in README (shuffle partitions ≈ cluster cores).
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(ckpt)
    yield spark
    spark.stop()


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")
