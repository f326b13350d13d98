"""Product quantization: determinism, the exact-rescore contract (reported
cosines are true cosines, bit-equal to the brute-force scorer on the same
pairs), validation, and a planted-cluster recall sanity check."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline import similarity


def _emb_df(spark, n=120, d=16, seed=0):
    rng = np.random.RandomState(seed)
    # three planted clusters + noise: PQ should trivially keep cluster
    # neighbours in the candidate set
    centers = rng.randn(3, d) * 5
    rows = []
    for i in range(n):
        v = centers[i % 3] + rng.randn(d) * 0.1
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_recall_on_planted_clusters(spark):
    emb = _emb_df(spark)
    q = emb.filter(F.col("vec_id") < 3)
    exact = similarity.cosine_topk(emb, q, k=5)
    # within-cluster members are near-duplicates (cosine ~0.99+), so exact
    # top-5 rank hinges on noise PQ cannot see — but ADC trivially separates
    # clusters, so a rerank window >= cluster size recovers the true top-5
    approx = similarity.pq_topk(emb, q, k=5, m=4, nbits=4, rerank=45)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(ex & ap) >= 13  # >= 0.85 overall recall


def test_pq_scores_are_exact_cosines(spark):
    emb = _emb_df(spark, n=60)
    q = emb.filter(F.col("vec_id") < 2)
    approx = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.pq_topk(emb, q, k=5, m=4, nbits=3, rerank=10).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(emb, q, k=59).collect()
    }
    for pair, cos in approx.items():
        assert cos == exact[pair]  # bit-equal: same fold, same rounding


def test_pq_deterministic_across_runs(spark):
    emb = _emb_df(spark)
    q = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, similarity.pq_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, similarity.pq_topk(emb, q, k=5).collect()))
    assert a == b


def test_pq_validation(spark):
    emb = _emb_df(spark, d=16)
    q = emb.filter(F.col("vec_id") < 1)
    with pytest.raises(ValueError):
        similarity.pq_topk(emb, q, m=5)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        similarity.pq_topk(emb, q, nbits=9)
    with pytest.raises(ValueError):
        similarity.pq_topk(emb, q, k=10, rerank=5)


def test_embedding_outliers_flags_planted_outlier(spark):
    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.randn(8) * 0.1]) for i in range(100)]
    rows.append((999, [50.0] * 8))  # planted far-away point
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.embedding_outliers(emb).collect()}
    assert out[999]["is_outlier"] is True
    assert sum(1 for r in out.values() if r["is_outlier"]) == 1
    assert out[999]["z"] > 3
    # z-scores are centered: mean ~ 0 over the corpus
    zs = [r["z"] for r in out.values()]
    assert abs(sum(zs) / len(zs)) < 0.1
    with pytest.raises(ValueError):
        similarity.embedding_outliers(
            spark.createDataFrame([], "vec_id long, embedding array<double>")
        )
