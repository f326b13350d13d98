#!/usr/bin/env python
"""r14 interleaved A/B: old vs new implementations in ONE warm session,
alternating runs so box waves hit both arms equally (the methodology of
tools/exp_matching_ab.py / exp_wcc_doubling.py — cross-process A/B was
uninterpretable on this box today: the same code drew 53s and 139s on
the 1m exactsubstr tier two sessions apart).

Arms:
  louvain     : old two-exchange move round (copied from r13 HEAD) vs the
                single-v-exchange restructure (repartition(v) before the
                (v, uc) aggregate)
  substr1m    : exact_substr_spans 1M docs, rolling hasher,
                materialize=False (old plan, gram pass x2) vs True
  substr200k  : same at the 200k/gram tier (does pinning pay when the
                generation pass is JVM codegen?)
  dedup200k   : duplicate_clusters with the old explode+groupBy sizes
                (monkeypatched) vs the narrow size() form

Usage: python tools/exp_r14_ab.py [pairs] [arm ...]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

PAIRS = 3
args = [a for a in sys.argv[1:]]
if args and args[0].isdigit():
    PAIRS = int(args.pop(0))
ARMS = set(args) or {"louvain", "substr1m", "substr200k", "dedup200k"}

bench._init_ram_tmp()
spark = bench._make_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
bench._warm_session(spark, sf_dir)

from graphframes_rs_spark.operators.louvain import LouvainBuilder
from graphframes_rs_spark.pipeline import dedup

_move_round_new = LouvainBuilder._move_round


def _move_round_old(self, adj, nodes, m, rnd, ckpt, shuffle_n):
    """r13 HEAD _move_round (two-exchange shape) — verbatim copy."""
    tot = nodes.groupBy("comm").agg(F.sum("k").alias("tot"))
    ntot = nodes.join(tot, "comm")
    nbrc = (
        adj.join(
            ntot.select(
                F.col("v").alias("u"),
                F.col("comm").alias("uc"),
                F.col("tot").alias("tot_c"),
            ),
            "u",
        )
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
        - F.col("k")
        * (F.col("tot_c") - F.col("tot_own") + F.col("k"))
        / F.lit(2.0 * m * m)
    )
    best = cand.groupBy("v").agg(
        F.max(F.struct(gain.alias("g"), (-F.col("uc")).alias("negc"))).alias("b")
    )
    parity_ok = F.pmod(F.xxhash64(F.col("v"), F.lit(rnd)), F.lit(2)) == 0
    wants = best.filter(F.col("b.g") > 1e-12).select(
        "v", (-F.col("b.negc")).alias("__to"), parity_ok.alias("__go")
    )
    from pyspark.sql import Observation

    obs = Observation()
    new_nodes = ckpt.push_bucketed(
        nodes.join(wants, "v", "left")
        .select(
            "v",
            F.when(F.col("__go"), F.col("__to"))
            .otherwise(F.col("comm"))
            .alias("comm"),
            "k",
            F.col("__to").isNotNull().alias("__want"),
        )
        .observe(obs, F.sum(F.col("__want").cast("int")).alias("wanted"))
        .drop("__want"),
        "v",
        shuffle_n,
        f"nodes_r{rnd}",
        assume_partitioned=True,
    )
    ckpt.evict_all_but_latest(1)
    return int(obs.get["wanted"] or 0), new_nodes


_jaccard_new = dedup.ngram_jaccard_pairs


def _jaccard_old(docs, text_col="text", n=3, threshold=0.5,
                 max_doc_freq=dedup.DEFAULT_MAX_DOC_FREQ):
    sh = docs.select(
        "doc_id", F.explode(dedup.shingles(F.col(text_col), n)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    postings = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    ).filter(F.size("ds") > 1)
    if max_doc_freq is not None:
        postings = postings.filter(F.size("ds") <= max_doc_freq)
    common = (
        postings.select(F.posexplode("ds").alias("i", "doc_a"), F.col("ds"))
        .select(
            "doc_a",
            F.explode(F.slice("ds", F.col("i") + 2, F.size("ds"))).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def run_louvain(old: bool):
    LouvainBuilder._move_round = _move_round_old if old else _move_round_new
    try:
        d = tempfile.mkdtemp()
        g = bench._scale_graph(spark, "6m")
        b = g.louvain().max_levels(2).max_moves(3).set_checkpoint_dir(d)
        out = b.run()
        n = out.count()
        moves = b.moves_
        shutil.rmtree(d, ignore_errors=True)
        return f"rows={n} moves={moves}"
    finally:
        LouvainBuilder._move_round = _move_round_new


def run_substr(n_docs, hasher, materialize):
    bench._prepare_scale_docs_n(spark, n_docs)
    docs = spark.read.parquet(bench._scale_docs_n_paths[n_docs])
    out = dedup.exact_substr_spans(
        docs, min_len=60, min_count=2, hasher=hasher, materialize=materialize
    )
    return f"rows={out.count()}"


def run_dedup(old: bool):
    dedup.ngram_jaccard_pairs = _jaccard_old if old else _jaccard_new
    try:
        bench._prepare_scale_docs(spark)
        docs = spark.read.parquet(bench._scale_docs_path[0])
        d = tempfile.mkdtemp()
        out = dedup.duplicate_clusters(docs, threshold=0.5, checkpoint_dir=d)
        n = out.count()
        shutil.rmtree(d, ignore_errors=True)
        return f"rows={n}"
    finally:
        dedup.ngram_jaccard_pairs = _jaccard_new


RUNNERS = {
    "louvain": (lambda: run_louvain(True), lambda: run_louvain(False)),
    "substr1m": (
        lambda: run_substr(1_000_000, "rolling", False),
        lambda: run_substr(1_000_000, "rolling", True),
    ),
    "substr200k": (
        lambda: run_substr(200_000, "gram", False),
        lambda: run_substr(200_000, "gram", True),
    ),
    "dedup200k": (lambda: run_dedup(True), lambda: run_dedup(False)),
}

# prep untimed
if "louvain" in ARMS:
    bench._prepare_scale_graph(spark, "6m")
if ARMS & {"substr200k", "dedup200k"}:
    bench._prepare_scale_docs(spark)
if "substr1m" in ARMS:
    bench._prepare_scale_docs_n(spark, 1_000_000)

results = {}
for arm in [a for a in ("louvain", "substr1m", "substr200k", "dedup200k") if a in ARMS]:
    old_fn, new_fn = RUNNERS[arm]
    results[arm] = {"old": [], "new": []}
    for p in range(PAIRS):
        for label, fn in (("old", old_fn), ("new", new_fn)):
            spark.catalog.clearCache()
            s0 = bench._steal_ms()
            t0 = time.monotonic()
            info = fn()
            wall = round(time.monotonic() - t0, 2)
            steal = bench._steal_ms() - s0
            results[arm][label].append((wall, steal))
            print(f"# {arm} {label} pair{p}: {wall}s steal={steal}ms {info}",
                  flush=True)
    o = [w for w, _ in results[arm]["old"]]
    n = [w for w, _ in results[arm]["new"]]
    print(f"== {arm}: old min={min(o)} all={o} | new min={min(n)} all={n}",
          flush=True)

spark.stop()
if bench._RAM_TMP_BASE is not None:
    shutil.rmtree(bench._RAM_TMP_BASE, ignore_errors=True)
