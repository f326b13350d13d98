"""graphframes_rs_spark — a PySpark-native graph analytics engine.

A from-scratch re-expression of the capabilities of
``SemyonSinchenko/graphframes-rs`` (a single-node Rust/DataFusion graph
library) as an idiomatic PySpark package: ``GraphFrame`` wraps two
DataFrames, a generic Pregel engine drives vertex-centric iteration as
relational dataflow (joins + groupBy + checkpointed loop), and the five
reference algorithms (PageRank, multi-source shortest paths, connected
components, k-core, maximal independent set) are thin builders on top.

Beyond reference parity, ``graphframes_rs_spark.pipeline`` adds the
operators a large-scale LLM training-data pipeline needs (dedup,
similarity search, text analysis, multimodal plumbing).

Reference surface inventory: SURVEY.md §2 (citations into /root/reference).
"""

from graphframes_rs_spark.graphframe import GraphFrame, GraphFrameError
from graphframes_rs_spark.pregel import MessageDirection, Pregel
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

__all__ = [
    "GraphFrame",
    "GraphFrameError",
    "Pregel",
    "MessageDirection",
    "ParquetCheckpointer",
]

__version__ = "0.1.0"
