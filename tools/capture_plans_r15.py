#!/usr/bin/env python
"""Render explain('formatted') before/after evidence for every query the
r15 optimization round touched, into plans/r15/<query>_{before,after}.txt.

"Before" variants are either the materialize=False dial (tfidf/bm25/
word-gram pins: False IS the old plan) or the r14 code shapes kept
verbatim in tools/r15_old_impls.py (WCC bucketed rounds).

The WCC entry's run() output plan only shows the final relabel+min-label
join (the loop checkpoints per round), so the per-round dataflow is
captured separately from a representative contraction round built exactly
as run() builds it: old = plain push_partitioned checkpoints (the parquet
re-read declares no partitioning, so every consumer re-Exchanges), new =
bucketed checkpoints (scan declares HashPartitioning). The Louvain move
round is captured at rnd=1 (the adaptive combine's first combined round)
old (raw repartition) vs new (map-side combine first).
"""
import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")
os.makedirs(OUT, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[4]")
    .appName("capture-plans-r15")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
from graphframes_rs_spark.pipeline import dedup, text


def dump(df, path):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, path), "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


Q = entry.queries()

# --- tfidf / bm25 / word-gram pins: before = materialize=False ----------
for name, fn_orig, patch in (
    ("tfidf_topk", text.tfidf_topk_terms, "tfidf_topk_terms"),
    ("bm25_topk", text.bm25_search, "bm25_search"),
):
    mod = text

    def _old(*a, _f=fn_orig, **kw):
        kw["materialize"] = False
        return _f(*a, **kw)

    setattr(mod, patch, _old)
    try:
        dump(Q[name](spark, sf_dir), f"{name}_before.txt")
    finally:
        setattr(mod, patch, fn_orig)
    dump(Q[name](spark, sf_dir), f"{name}_after.txt")

# word-gram pair (ngram_dup_coverage / dedup_strip_spans): the r15 pin
# was measured 4-10x SLOWER than recomputing the cheap narrow gram map
# (plans/r15/pins_ab.log) and the shipped default stays lazy = the r14
# plan — no before/after pair (no shipped plan change); the flag-on shape
# is pinned by test_plan_shape.py::test_r15_materialize_pins_single_generation_pass.

# --- WCC: the bucketed-round restructure was measured and REVERTED ------
# (parity 18m, +11% 54m, -35% power-law skew18m — bucket-aligned relabel
# joins forfeit AQE skew splitting; see connected_components.py docstring
# and plans/r15/wcc_bucketed_ab_*.log for the interleaved A/B evidence).
# No before/after plan pair is committed because no WCC change shipped.
from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

# --- Louvain adaptive combine: measured and DISABLED ---------------------
# (multiplicity <= 1.027 at the bench's move budget — the combined form
# would ~double shuffled rows per round; see louvain.py COMBINE_FROM_ROUND
# and plans/r15/louvain_adaptive_ab.log). No plan pair: no shipped change.

spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
spark.stop()
print("done")
