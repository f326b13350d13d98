#!/usr/bin/env python
"""r14 experiment: count Exchanges in ONE Louvain move round before/after
the single-edge-exchange restructure (repartition(v) ahead of the (v, uc)
aggregation so the enrich join reuses the placement).

Usage: python tools/exp_louvain_round_shape.py [--old]
Prints the executed plan's Exchange count for a representative round.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OLD = "--old" in sys.argv

spark = (
    SparkSession.builder.master("local[2]")
    .appName("exp-louvain-round-shape")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

tmp = tempfile.mkdtemp()
ck = ParquetCheckpointer(spark, tmp)

n_v, n_e = 10_000, 40_000
edges = spark.range(n_e).select(
    (F.col("id") % n_v).alias("a"),
    ((F.col("id") * 7 + 3) % n_v).alias("b"),
    F.lit(1.0).alias("w"),
)
adj = ck.push_bucketed(
    edges.select(F.col("a").alias("v"), F.col("b").alias("u"), "w").unionByName(
        edges.select(F.col("b").alias("v"), F.col("a").alias("u"), "w")
    ),
    "u", 4, "adj",
)
nodes = ck.push_bucketed(
    spark.range(n_v).select(
        F.col("id").alias("v"), F.col("id").alias("comm"), F.lit(4.0).alias("k")
    ),
    "v", 4, "nodes",
)
m = float(n_e)
shuffle_n = 4

old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

tot = nodes.groupBy("comm").agg(F.sum("k").alias("tot"))
ntot = nodes.join(tot, "comm")
msg = adj.join(
    ntot.select(
        F.col("v").alias("u"), F.col("comm").alias("uc"), F.col("tot").alias("tot_c")
    ),
    "u",
)
if OLD:
    nbrc = msg.groupBy("v", "uc").agg(
        F.sum("w").alias("kvc"), F.max("tot_c").alias("tot_c")
    )
else:
    nbrc = (
        msg.select("v", "uc", "w", "tot_c")
        .repartition(shuffle_n, "v")
        .groupBy("v", "uc")
        .agg(F.sum("w").alias("kvc"), F.max("tot_c").alias("tot_c"))
    )
enriched = nbrc.join(
    ntot.select("v", "comm", "k", F.col("tot").alias("tot_own")), "v"
)
own = enriched.filter(F.col("uc") == F.col("comm")).select(
    "v", F.col("kvc").alias("kv_own")
)
cand = enriched.filter(F.col("uc") != F.col("comm")).join(own, "v", "left")
gain = (
    (F.col("kvc") - F.coalesce(F.col("kv_own"), F.lit(0.0))) / F.lit(m)
    - F.col("k") * (F.col("tot_c") - F.col("tot_own") + F.col("k")) / F.lit(2.0 * m * m)
)
best = cand.groupBy("v").agg(
    F.max(F.struct(gain.alias("g"), (-F.col("uc")).alias("negc"))).alias("b")
)
parity_ok = F.pmod(F.xxhash64(F.col("v"), F.lit(0)), F.lit(2)) == 0
wants = best.filter(F.col("b.g") > 1e-12).select(
    "v", (-F.col("b.negc")).alias("__to"), parity_ok.alias("__go")
)
out = nodes.join(wants, "v", "left").select(
    "v",
    F.when(F.col("__go"), F.col("__to")).otherwise(F.col("comm")).alias("comm"),
    "k",
)
out.collect()
plan = out._jdf.queryExecution().executedPlan().toString()
if "== Initial Plan ==" in plan:
    plan = plan[: plan.index("== Initial Plan ==")]
label = "OLD" if OLD else "NEW"
print(f"{label}: Exchanges = {plan.count('Exchange')}")
for line in plan.splitlines():
    if "Exchange" in line:
        print("   ", line.strip()[:120])
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
ck.purge()
spark.stop()
