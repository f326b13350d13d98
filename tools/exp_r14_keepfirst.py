#!/usr/bin/env python
"""r14 interleaved A/B: exact_substr_spans(keep_first=True) at the 200k
bench tier — old (current library: marked consumed twice via the sweep's
unionAll, dup consumed twice inside marked => freq agg x4, dup join x4 in
the executed plan) vs new (sweep events via explode(array(..)) so marked
is consumed ONCE, plus dup pinned under the materialize flag => freq x1,
dup join x1).

Both forms produce the identical row multiset (the sweep consumes the
same event multiset through a groupBy; the pin only caches). Verified
here with a full row checksum on the first pair, untimed.

Usage: python tools/exp_r14_keepfirst.py [pairs]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

bench._init_ram_tmp()
spark = bench._make_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
bench._warm_session(spark, sf_dir)

from graphframes_rs_spark.pipeline import dedup

L = 60


def _subtract_protected_spans_new(marked, Lw):
    """Event sweep with both endpoints exploded from ONE pass over
    ``marked`` (the library form unions two selects of it)."""
    from pyspark.sql.window import Window

    up = (F.lit(1) - F.col("__isp")).cast("int")
    dp = F.col("__isp").cast("int")
    ev = marked.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("pos").alias("c"), up.alias("du"), dp.alias("dp")
                ),
                F.struct(
                    (F.col("pos") + Lw).alias("c"),
                    (-up).alias("du"),
                    (-dp).alias("dp"),
                ),
            )
        ).alias("__e"),
    ).select("doc_id", "__e.c", "__e.du", "__e.dp")
    ag = ev.groupBy("doc_id", "c").agg(
        F.sum("du").alias("du"), F.sum("dp").alias("dp")
    )
    w = Window.partitionBy("doc_id").orderBy("c")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    sw = ag.select(
        "doc_id",
        "c",
        F.sum("du").over(cum).alias("u"),
        F.sum("dp").over(cum).alias("p"),
        F.lead("c").over(w).alias("nc"),
    )
    seg = sw.filter(
        (F.col("u") > 0)
        & (F.col("p") == 0)
        & F.col("nc").isNotNull()
        & (F.col("nc") > F.col("c"))
    ).select("doc_id", F.col("c").alias("s"), F.col("nc").alias("e"))
    w2 = Window.partitionBy("doc_id").orderBy("s")
    cum2 = w2.rowsBetween(Window.unboundedPreceding, 0)
    return (
        seg.withColumn(
            "__brk",
            F.when(F.col("s") > F.lag("e").over(w2), 1).otherwise(0),
        )
        .withColumn("__isl", F.sum("__brk").over(cum2))
        .groupBy("doc_id", "__isl")
        .agg(
            F.min("s").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def spans_keepfirst_new(docs, min_len=50, min_count=2, hasher="gram",
                        pin_dup=True):
    """exact_substr_spans(keep_first=True, materialize=True) with the two
    r14 edits: dup pinned (optional), sweep events exploded."""
    grams = dedup._position_grams(docs, "text", min_len, hasher)
    grams = grams.localCheckpoint()
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__occ"))
    dup = grams.join(
        freq.where(F.col("__occ") >= min_count).select("gram"), "gram"
    )
    if pin_dup:
        dup = dup.localCheckpoint()
    first = (
        dup.groupBy("gram")
        .agg(F.min(F.struct("doc_id", "pos")).alias("__f"))
        .select(
            "gram",
            F.col("__f.doc_id").alias("doc_id"),
            F.col("__f.pos").alias("pos"),
            F.lit(1).alias("__isp"),
        )
    )
    marked = dup.join(first, ["gram", "doc_id", "pos"], "left").select(
        "doc_id", "pos", F.coalesce("__isp", F.lit(0)).alias("__isp")
    )
    return _subtract_protected_spans_new(marked, min_len)


def checksum(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("doc_id", "span_start", "span_end").cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).collect()[0]


bench._prepare_scale_docs(spark)
docs = spark.read.parquet(bench._scale_docs_path[0])

# untimed equality check (full row-multiset checksum both forms)
c_old = checksum(
    dedup.exact_substr_spans(docs, min_len=L, min_count=2, keep_first=True)
)
c_new = checksum(spans_keepfirst_new(docs, min_len=L, min_count=2))
print(f"# checksum old={tuple(c_old)} new={tuple(c_new)}", flush=True)
assert tuple(c_old) == tuple(c_new), "OLD/NEW OUTPUTS DIFFER — ABORT"

ARMS = {
    "old": lambda: dedup.exact_substr_spans(
        docs, min_len=L, min_count=2, keep_first=True
    ),
    "explode": lambda: spans_keepfirst_new(
        docs, min_len=L, min_count=2, pin_dup=False
    ),
    "pinexp": lambda: spans_keepfirst_new(
        docs, min_len=L, min_count=2, pin_dup=True
    ),
}
results = {a: [] for a in ARMS}
order = list(ARMS.items())
for p in range(PAIRS):
    # rotate arm order per pair so a box wave striking a fixed slot in
    # the cycle cannot systematically contaminate one arm
    rot = order[p % len(order):] + order[:p % len(order)]
    for label, build in rot:
        spark.catalog.clearCache()
        s0 = bench._steal_ms()
        t0 = time.monotonic()
        n = build().count()
        wall = round(time.monotonic() - t0, 2)
        steal = bench._steal_ms() - s0
        results[label].append((wall, steal))
        print(f"# keepfirst200k {label} pair{p}: {wall}s steal={steal}ms rows={n}",
              flush=True)

for label, rs in results.items():
    w = [x for x, _ in rs]
    print(f"== keepfirst200k {label}: min={min(w)} all={rs}", flush=True)

spark.stop()
if bench._RAM_TMP_BASE is not None:
    shutil.rmtree(bench._RAM_TMP_BASE, ignore_errors=True)
