"""BM25 ranking and markup-stripping semantics (hand-checked cases)."""

import math

import pytest
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline import text as txt


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_hand_computed_single_term(spark):
    # 3 docs, query {cat}: df=2, N=3 -> idf = ln(1 + 1.5/2.5)
    # doc0: tf=2, dl=4; doc1: tf=1, dl=2; doc2: no match
    docs = _docs(spark, ["cat cat dog bird", "cat dog", "dog bird"])
    out = txt.bm25_search(docs, ["cat"], k=10).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    assert set(got) == {0, 1}
    idf = math.log(1 + 1.5 / 2.5)
    avgdl = (4 + 2 + 2) / 3
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[0] == pytest.approx(round(s(2, 4), 6), abs=1e-6)
    assert got[1] == pytest.approx(round(s(1, 2), 6), abs=1e-6)


def test_bm25_multi_term_sums_and_ranks(spark):
    docs = _docs(spark, ["a b c", "a a a", "b b c", "d d d"])
    out = txt.bm25_search(docs, ["a", "b"], k=10).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    # doc0 matches both terms; every rank unique and contiguous from 1
    assert sorted(ranks.values()) == list(range(1, len(ranks) + 1))
    assert 3 not in ranks  # no query term -> absent, not zero-scored


def test_bm25_k_truncates(spark):
    docs = _docs(spark, ["x"] * 7)
    out = txt.bm25_search(docs, ["x"], k=3)
    assert out.count() == 3


def test_strip_markup_tags_entities_whitespace(spark):
    df = spark.createDataFrame(
        [
            (0, '<div class="x">hello <b>world</b></div>'),
            (1, "a &lt; b &amp;&amp; c &gt; d"),
            (2, "one&nbsp;two  three\t\nfour"),
            (3, "2 < 3 and 5 > 4"),  # bare comparisons survive
            (4, "&amp;lt; stays encoded one level"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["clean"]
        for r in df.select(
            "doc_id", txt.strip_markup(F.col("text")).alias("clean")
        ).collect()
    }
    assert got[0] == "hello world"
    assert got[1] == "a < b && c > d"
    assert got[2] == "one two three four"
    # '< 3 and 5 >' is tag-shaped by the grammar-free regex; the words
    # outside the angle span survive
    assert got[3] == "2 4"
    assert got[4] == "&lt; stays encoded one level"
