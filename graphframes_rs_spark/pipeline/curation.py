"""Corpus-curation operators: training-mixture sampling and benchmark
decontamination.

Both are pure JVM-side SQL expressions (no Python in the hot path) and
deterministic — sampling decisions derive from md5-based hashes, not RNG
state, so a re-run over re-partitioned data keeps the exact same rows and
a DuckDB oracle can reproduce every decision bit-for-bit.

Scale notes: ``stratified_sample`` is a stateless filter (no shuffle at
all — it composes with the scan and pushes down). ``decontamination_report``
joins the corpus' shingle stream against the DISTINCT shingle set of the
eval split; eval/benchmark sets are tiny relative to a training corpus, so
that side is broadcast — the corpus never shuffles on shingle.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphframes_rs_spark.pipeline.dedup import shingles
from graphframes_rs_spark.pipeline.text import hash60


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 42,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mixture operator
    (e.g. keep 50% of English, 10% of everything else).

    A row survives iff ``hash60(seed:stratum:key) mod resolution <
    fraction(stratum) * resolution``. Hash-based, so the sample is (a)
    reproducible across runs and partitionings, (b) consistent — the same
    key always gets the same verdict, enabling incremental re-runs over a
    growing corpus, and (c) a pure narrow filter: no shuffle, no RNG state,
    pushes down with the scan. Unknown strata fall back to
    ``default_fraction``."""
    frac = F.lit(float(default_fraction))
    for k in sorted(fractions):
        frac = F.when(
            F.col(strata_col) == F.lit(k), F.lit(float(fractions[k]))
        ).otherwise(frac)
    key = F.concat_ws(
        ":",
        F.lit(str(seed)),
        F.col(strata_col).cast("string"),
        F.col(key_col).cast("string"),
    )
    bucket = F.pmod(hash60(key), F.lit(resolution))
    return df.filter(bucket < frac * F.lit(float(resolution)))


def decontamination_report(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    eval_mod: int = 100,
    eval_docs: Optional[DataFrame] = None,
) -> DataFrame:
    """[doc_id, n_shingles, n_collisions, contaminated]: word-n-gram overlap
    between every training document and a held-out eval/benchmark split —
    the standard pre-training decontamination check (an eval n-gram
    appearing verbatim in training data leaks the benchmark).

    ``eval_docs`` supplies the benchmark set explicitly (a [doc_id, text]
    frame); by default the split is carved deterministically from the
    corpus itself (``doc_id % eval_mod == 0``) so the operator is
    self-contained and oracle-checkable. Counts are over DISTINCT shingles
    per document (``shingles`` deduplicates); ``contaminated`` flags any
    collision — thresholding on ``n_collisions / n_shingles`` is the
    caller's policy dial.

    Production note: real decontamination uses longer n-grams (8-13); the
    eval shingle set stays small either way, hence the broadcast join.

    Plan shape (single-pass): the train side is exploded ONCE — shingle
    totals and eval collisions come from one broadcast LEFT join + one
    aggregation over that stream, not separate totals/hits subplans that
    would each re-explode the corpus. On the self-split path the eval
    filter is applied to the *documents* before exploding, so the eval
    side explodes ~1/eval_mod of the corpus instead of all of it (the
    alternative — checkpointing the full exploded shingle stream and
    reading it twice — writes a dataset larger than the corpus text
    itself, a bad trade at 100 TB; two pruned scans of columnar input
    are cheaper than one materialization of the explode)."""
    sh_expr = shingles(F.col(text_col), n)
    if eval_docs is not None:
        train_docs = docs
        eval_side = eval_docs
    else:
        is_eval = (F.col("doc_id") % eval_mod) == 0
        train_docs = docs.filter(~is_eval)
        eval_side = docs.filter(is_eval)
    train_sh = train_docs.select("doc_id", F.explode(sh_expr).alias("shingle"))
    eval_sh = eval_side.select(F.explode(sh_expr).alias("shingle")).distinct()
    hit = F.count(F.col("__eval_hit")).alias("n_collisions")
    out = (
        train_sh.join(
            F.broadcast(eval_sh.select("shingle", F.lit(1).alias("__eval_hit"))),
            "shingle",
            "left",
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"), hit)
    )
    return out.select(
        "doc_id",
        "n_shingles",
        "n_collisions",
        (F.col("n_collisions") > 0).alias("contaminated"),
    )
