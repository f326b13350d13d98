"""Pure-function tests for the custom expressions (reference
finite_axpb.rs:141-260, kcore_merge.rs:205-326)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.functions.hashes import finite_axpb, gf2_64_axpb, gf2_64_mul


def u64(*vals):
    return np.array(vals, dtype=np.uint64)


def test_axpb_identity_and_zero():
    # 1 is the multiplicative identity; 0 annihilates
    x = u64(0, 1, 2, 12345678901234567, 2**63)
    assert (gf2_64_mul(u64(1, 1, 1, 1, 1), x) == x).all()
    assert (gf2_64_mul(u64(0, 0, 0, 0, 0), x) == 0).all()
    # axpb(a, 0, b) == b
    assert (gf2_64_axpb(u64(7, 9), u64(0, 0), u64(3, 4)) == u64(3, 4)).all()


def test_mul_commutative_and_distributive():
    rng = np.random.default_rng(42)
    a = rng.integers(0, 2**64, 50, dtype=np.uint64)
    b = rng.integers(0, 2**64, 50, dtype=np.uint64)
    c = rng.integers(0, 2**64, 50, dtype=np.uint64)
    assert (gf2_64_mul(a, b) == gf2_64_mul(b, a)).all()
    # distributes over xor (characteristic 2)
    assert (gf2_64_mul(a, b ^ c) == (gf2_64_mul(a, b) ^ gf2_64_mul(a, c))).all()


def test_mul_small_cases():
    # x * 2 is a left shift while below the modulus
    assert gf2_64_mul(u64(2), u64(4))[0] == 8
    # overflow wraps through the reduction polynomial:
    # x^63 * x = x^64 = x^4 + x^3 + x + 1 = 0b11011 = 27
    assert gf2_64_mul(u64(2**63), u64(2))[0] == 27


def test_axpb_invertibility_sample():
    """a != 0 => x -> a*x+b is injective (field): check on a small sample."""
    a = np.full(256, 0x9E3779B97F4A7C15, dtype=np.uint64)
    b = np.full(256, 12345, dtype=np.uint64)
    x = np.arange(256, dtype=np.uint64)
    out = gf2_64_axpb(a, x, b)
    assert len(np.unique(out)) == 256


def test_finite_axpb_through_dataframe(spark):
    df = spark.createDataFrame([(1, 5, 3), (1, 0, 0), (None, 2, 2)], "a long, x long, b long")
    rows = df.select(finite_axpb(F.col("a"), F.col("x"), F.col("b")).alias("h")).collect()
    assert rows[0]["h"] == 5 ^ 3  # 1*x+b
    assert rows[1]["h"] == 0
    assert rows[2]["h"] is None  # null-propagating


def test_kcore_merge_expr_cases(spark):
    from graphframes_rs_spark.operators.k_core import kcore_merge_expr

    df = spark.createDataFrame(
        [
            (1, [3, 3, 3], 3),     # 3 neighbours all >= 3 -> 3
            (2, [3, 3, 3], 2),     # capped by current core -> 2
            (3, [1, 1, 1, 1], 9),  # h-index 1
            (4, [5, 4, 3, 2], 9),  # h-index 3
            (5, None, 7),          # no messages -> keep core
            (6, [2**62, 2**62], 2**62),  # pathological large core: no OOM
        ],
        "id long, msgs array<long>, core long",
    )
    out = {
        r["id"]: r["m"]
        for r in df.select(
            "id", kcore_merge_expr(F.col("msgs"), F.col("core")).alias("m")
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1, 4: 3, 5: 7, 6: 2}


def test_kmv_distinct_and_overlap(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    from graphframes_rs_spark.functions.sketches import (
        kmv_distinct_estimate,
        kmv_overlap,
        kmv_sketch,
    )

    # small set (< k): estimate is exact
    small = spark.createDataFrame([(f"w{i}",) for i in range(50)], "t string")
    sk = kmv_sketch(small, "t", k=256)
    est = kmv_distinct_estimate(sk, k=256).collect()[0]
    assert est["n_sketch"] == 50 and est["n_distinct_est"] == 50.0

    # large set (>> k): estimate within 20% of truth at k=256
    big = spark.range(10_000).select(F.concat(F.lit("x"), "id").alias("t"))
    est2 = kmv_distinct_estimate(kmv_sketch(big, "t", k=256), k=256).collect()[0]
    assert 8_000 <= est2["n_distinct_est"] <= 12_000

    # overlap: A = 0..5999, B = 4000..9999 -> J = 2000/10000 = 0.2
    a = spark.range(0, 6_000).select(F.concat(F.lit("x"), "id").alias("t"))
    b = spark.range(4_000, 10_000).select(F.concat(F.lit("x"), "id").alias("t"))
    ov = kmv_overlap(
        kmv_sketch(a, "t", k=256), kmv_sketch(b, "t", k=256), k=256
    ).collect()[0]
    assert 0.1 <= ov["jaccard_est"] <= 0.32
    assert 1_000 <= ov["intersection_est"] <= 3_200
    # deterministic across runs
    ov2 = kmv_overlap(
        kmv_sketch(a, "t", k=256), kmv_sketch(b, "t", k=256), k=256
    ).collect()[0]
    assert tuple(ov) == tuple(ov2)

    with _pt.raises(ValueError):
        kmv_sketch(small, "t", k=1)
