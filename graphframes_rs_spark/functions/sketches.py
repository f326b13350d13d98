"""KMV (k-minimum-values) distinct-count and overlap sketches.

Beyond-reference sketch family member (with the FM neighborhood sketch
and the Count-Min frequency sketch): the KMV/bottom-k sketch
(Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07) keeps the k
smallest hash values of a set. It answers two questions the other
sketches can't:

* distinct count: E[|S|] ≈ (k-1) / U_(k) where U_(k) is the k-th
  smallest hash scaled to (0,1);
* OVERLAP between two sets: merge the two sketches, take the k smallest
  of the union — the fraction of those present in both input sketches
  estimates the Jaccard similarity, and J x |A ∪ B| the intersection
  size. Estimating corpus overlap this way needs only 2k rows to meet,
  not a corpus-sized join.

Everything derives from the md5-based ``hash60`` (uniform in
[0, 2^60)), so sketches are deterministic and the DuckDB oracle replays
them exactly (ORDER BY hash LIMIT k).

Scale shape: a global sketch is ``orderBy(hash).limit(k)`` — Spark plans
``TakeOrderedAndProject`` (per-partition bottom-k, then a k x p driver
merge); per-group sketches use a bottom-k window per group. Sketch
merge = union + re-take-k, associative and idempotent."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline.text import hash60

HASH_SPACE = float(2**60)


def kmv_sketch(
    df: DataFrame, col: str, k: int = 256, seed: int = 42
) -> DataFrame:
    """[h] — the k smallest distinct ``hash60(value|seed)`` over the
    column (fewer rows if the column has < k distinct values)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.select(
            hash60(F.concat_ws("|", F.col(col), F.lit(seed))).alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """One row [n_sketch, n_distinct_est] from a :func:`kmv_sketch`
    frame. With fewer than k hashes the sketch IS the distinct set, so
    the estimate is exact."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("__kth")
    )
    return agg.select(
        "n_sketch",
        F.round(
            F.when(
                F.col("n_sketch") < k, F.col("n_sketch").cast("double")
            ).otherwise(
                (F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.col("__kth")
            ),
            6,
        ).alias("n_distinct_est"),
    )


def kmv_overlap(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256
) -> DataFrame:
    """One row [union_k, n_both, jaccard_est, intersection_est] from two
    same-k sketches: the k smallest hashes of the union, how many of
    them appear in BOTH sketches, their ratio (the Jaccard estimate),
    and jaccard x union-distinct (the intersection-size estimate)."""
    a = sketch_a.select(F.col("h"), F.lit(1).alias("__a"))
    b = sketch_b.select(F.col("h"), F.lit(1).alias("__b"))
    merged = (
        a.join(b, "h", "full")
        .select(
            "h",
            F.coalesce("__a", F.lit(0)).alias("__a"),
            F.coalesce("__b", F.lit(0)).alias("__b"),
        )
        .orderBy("h")
        .limit(k)
    )
    agg = merged.agg(
        F.count(F.lit(1)).alias("union_k"),
        F.sum((F.col("__a") * F.col("__b"))).alias("n_both"),
        F.max("h").alias("__kth"),
    )
    union_est = F.when(
        F.col("union_k") < k, F.col("union_k").cast("double")
    ).otherwise((F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / F.col("__kth"))
    jac = F.col("n_both") / F.col("union_k")
    return agg.select(
        "union_k",
        "n_both",
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 6).alias("intersection_est"),
    )
