from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

__all__ = ["ParquetCheckpointer"]
