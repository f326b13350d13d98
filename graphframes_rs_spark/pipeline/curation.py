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

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphframes_rs_spark.pipeline.dedup import shingles
from graphframes_rs_spark.pipeline.text import hash60


def sample_keep_expr(
    strata_col: str,
    fractions: Dict[str, float],
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 42,
    resolution: int = 1_000_000,
):
    """The boolean keep-predicate column behind :func:`stratified_sample`,
    exposed so wider curation projections can inline the sampling verdict
    instead of filtering (same hash rule, same determinism guarantees)."""
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
    return bucket < frac * F.lit(float(resolution))


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
    return df.filter(
        sample_keep_expr(
            strata_col, fractions, default_fraction, key_col, seed, resolution
        )
    )


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


def semantic_decontamination(
    emb: DataFrame,
    eval_emb: Optional[DataFrame] = None,
    threshold: float = 0.95,
    eval_mod: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """[vec_id, max_eval_cosine, contaminated] — embedding-space twin of
    :func:`decontamination_report`: flag training vectors whose cosine
    against ANY held-out eval/benchmark vector reaches ``threshold``.
    N-gram decontamination misses paraphrases; this catches semantic
    leakage (a reworded benchmark question embeds next to the original
    even with zero shingle overlap).

    ``eval_emb`` supplies the benchmark set explicitly (same schema); by
    default the split is carved deterministically from the corpus itself
    (``vec_id % eval_mod == 0``) so the operator is self-contained and
    oracle-checkable. Every train row is returned with its max eval
    cosine (rounded to 6), so thresholding can be re-run without another
    scan.

    Scale shape: the eval side is benchmarks — thousands of vectors, not
    billions — so it broadcasts; the corpus side stays distributed and is
    scanned ONCE (cross join against the broadcast + a combine-enabled
    max aggregate, the same plan family as ``cosine_topk``'s scan dual).
    For eval sets too big to broadcast, bucket them through
    :func:`~graphframes_rs_spark.pipeline.similarity.ivf_topk` instead.

    An EMPTY eval side yields an empty result (there is nothing to
    compare against, so no max is defined) — callers wanting pass-through
    semantics should skip the call when the benchmark frame is empty.
    """
    from graphframes_rs_spark.pipeline.similarity import cosine_expr

    if eval_emb is not None:
        train = emb
        eval_side = eval_emb
    else:
        is_eval = (F.col(id_col) % eval_mod) == 0
        train = emb.filter(~is_eval)
        eval_side = emb.filter(is_eval)
    t = train.select(F.col(id_col), F.col(vec_col).alias("__tv"))
    e = eval_side.select(F.col(vec_col).alias("__ev"))
    return (
        t.crossJoin(F.broadcast(e))
        .groupBy(id_col)
        .agg(
            F.round(
                F.max(cosine_expr(F.col("__tv"), F.col("__ev"))), 6
            ).alias("max_eval_cosine")
        )
        .select(
            id_col,
            "max_eval_cosine",
            (F.col("max_eval_cosine") >= threshold).alias("contaminated"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    quality_min: float = 0.4,
    top_bigram_max: float = 0.15,
    eval_mod: int = 100,
    decontam_n: int = 3,
    fractions: Optional[Dict[str, float]] = None,
    default_fraction: float = 0.25,
    seed: int = 42,
) -> DataFrame:
    """[doc_id, lang_pred, quality, top_bigram_frac, reason, keep]: the
    END-TO-END curation verdict — every document gets one keep/drop
    decision and the FIRST failing stage as its reason, in the order a
    production pass applies them:

    ``eval_holdout`` (the carved-out benchmark split itself) →
    ``exact_dup`` (non-canonical identical copies) → ``low_quality``
    (quality_score < quality_min) → ``repetitive`` (Gopher top-bigram
    filter) → ``contaminated`` (shares an n-gram with the eval split) →
    ``sampled_out`` (lost the deterministic mixture draw) → ``kept``.

    Plan shape at scale: the narrow per-row features (language id, quality
    score, repetition fraction, sampling hash) are computed INLINE in one
    projection — they never shuffle. Only the two stages that genuinely
    need corpus-global state shuffle at all: exact-dup (one groupBy on the
    content hash) and decontamination (one broadcast join against the eval
    shingle set + one aggregation), and both join back on doc_id. Every
    verdict is deterministic (hash-based sampling, min-id canonicals), so
    re-runs over re-partitioned data keep identical decisions — the
    property that makes incremental corpus refreshes auditable."""
    from graphframes_rs_spark.pipeline.dedup import exact_duplicates
    from graphframes_rs_spark.pipeline.text import (
        language_id,
        quality_score,
        top_bigram_frac,
    )

    fractions = {"en": 0.5, "und": 0.1} if fractions is None else fractions
    c = F.col(text_col)
    narrow = docs.select(
        "doc_id",
        language_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        top_bigram_frac(c).alias("top_bigram_frac"),
    )
    dups = exact_duplicates(docs, text_col=text_col).select(
        "doc_id", "is_duplicate"
    )
    decon = decontamination_report(
        docs, text_col=text_col, n=decontam_n, eval_mod=eval_mod
    ).select("doc_id", "contaminated")
    joined = narrow.join(dups, "doc_id").join(decon, "doc_id", "left")
    reason = (
        F.when((F.col("doc_id") % eval_mod) == 0, "eval_holdout")
        .when(F.col("is_duplicate"), "exact_dup")
        .when(F.col("quality") < quality_min, "low_quality")
        .when(F.col("top_bigram_frac") > top_bigram_max, "repetitive")
        .when(F.coalesce(F.col("contaminated"), F.lit(False)), "contaminated")
        .when(
            ~sample_keep_expr(
                "lang_pred", fractions, default_fraction, "doc_id", seed
            ),
            "sampled_out",
        )
        .otherwise("kept")
    )
    return joined.select(
        "doc_id",
        "lang_pred",
        "quality",
        "top_bigram_frac",
        reason.alias("reason"),
        (reason == F.lit("kept")).alias("keep"),
    )


def source_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source corpus profile — the mixture dashboard a curation run
    reads before choosing :func:`stratified_sample` fractions:

      [source, n_docs, n_tokens, mean_quality, exact_dup_rate, n_langs]

    ``exact_dup_rate`` = fraction of docs whose md5 content hash appears
    earlier within the same source (the rows :func:`~graphframes_rs_spark.
    pipeline.dedup.exact_duplicates` would drop, scoped per source).

    Scale notes: one groupBy(source) pass with every metric map-side
    combinable — the dup rate comes from count−distinct(md5) and language
    breadth from a distinct-agg, so there is exactly one shuffle keyed on
    the (low-cardinality) source column; AQE coalesces the handful of
    result partitions."""
    from graphframes_rs_spark.pipeline.text import quality_score, token_count

    c = F.col(text_col)
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(c)).alias("n_tokens"),
            F.round(F.avg(quality_score(c)), 6).alias("mean_quality"),
            F.round(
                (F.count(F.lit(1)) - F.countDistinct(F.md5(c)))
                / F.count(F.lit(1)),
                6,
            ).alias("exact_dup_rate"),
            F.countDistinct(F.col("lang")).alias("n_langs"),
        )
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: Dict[str, float],
    default_weight: float = 1.0,
    key_col: str = "doc_id",
    seed: int = 42,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Weighted UP/DOWN-sampling for training-mixture construction: each
    row is emitted ``floor(w)`` times plus one more with probability
    ``frac(w)`` (w = its stratum's weight) — so ``weights={"web": 0.3,
    "code": 2.5}`` keeps ~30% of web docs and repeats code docs ~2.5
    epochs, the standard way domain mix ratios are realized in LLM
    pre-training data (cf. the epoch factors in Llama/GPT-3 data tables).

    Output adds an ``epoch`` column (0-based copy index) so downstream
    shuffling/packing can spread repeats across shards.

    Deterministic and shuffle-free: the fractional decision reuses the
    same md5-hash rule as :func:`stratified_sample` (stable under
    re-partitioning, replayable in SQL); the integer repeats are a
    row-local ``explode(sequence(...))``. Weights must be < 100 —
    epoch-style repetition beyond that is a config error, not a mix."""
    if any(w < 0 or w >= 100 for w in weights.values()) or not (
        0 <= default_weight < 100
    ):
        raise ValueError("mixture weights must be in [0, 100)")
    w_expr = F.lit(float(default_weight))
    for k in sorted(weights):
        w_expr = F.when(
            F.col(strata_col) == F.lit(k), F.lit(float(weights[k]))
        ).otherwise(w_expr)
    key = F.concat_ws(
        ":",
        F.lit(str(seed)),
        F.col(strata_col).cast("string"),
        F.col(key_col).cast("string"),
    )
    bucket = F.pmod(hash60(key), F.lit(resolution))
    whole = F.floor(w_expr).cast("int")
    frac_keep = (
        bucket < (w_expr - whole.cast("double")) * F.lit(float(resolution))
    )
    n_copies = (whole + frac_keep.cast("int")).alias("__n")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def temperature_mixture_weights(
    docs: DataFrame,
    strata_col: str = "source",
    tau: float = 0.5,
    token_budget: int = 1_000_000,
    text_col: str = "text",
) -> DataFrame:
    """[source, n_docs, n_tokens, p_raw, p_target, epochs]: the
    temperature-mixing calculation that PRODUCES the per-domain weights
    :func:`mixture_sample` applies. ``p_target ∝ n_tokens^tau`` (tau=1 is
    proportional sampling, tau→0 uniform across domains — the multilingual
    / domain rebalancing rule from the T5 and UniMax papers), and
    ``epochs = token_budget * p_target / n_tokens`` is the repeat factor
    that realizes the target under the given budget (>1 means the domain
    is upsampled past one pass — the overfitting signal UniMax caps).

    Scale design: one map-side-combined groupBy over the corpus (token
    counts are a JVM size(split()) expression, no Python), then all
    normalization happens on the |domains|-row aggregate — a global
    single-partition window over domain cardinality, never data rows.
    Deterministic; fractions are rounded to 6dp for stable comparison."""
    per = docs.groupBy(F.col(strata_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).cast("long").alias(
            "n_tokens"
        ),
    )
    w = Window.partitionBy()
    powed = F.pow(F.col("n_tokens").cast("double"), F.lit(float(tau)))
    return (
        per.withColumn("__pw", powed)
        .withColumn("p_raw", F.col("n_tokens") / F.sum("n_tokens").over(w))
        .withColumn("p_target", F.col("__pw") / F.sum("__pw").over(w))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round("p_raw", 6).alias("p_raw"),
            F.round("p_target", 6).alias("p_target"),
            F.round(
                F.lit(float(token_budget))
                * F.col("p_target")
                / F.col("n_tokens"),
                6,
            ).alias("epochs"),
        )
    )


def corpus_shuffle(
    df: DataFrame,
    num_shards: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """[shard, pos, <row...>] — deterministic global shuffle + sharding
    for training-data writing: every row's shard is a seeded md5 hash mod
    ``num_shards`` (each shard is therefore a uniform random sample of
    the corpus — what data loaders assume when streaming shards
    independently), and ``pos`` orders rows WITHIN the shard by a second
    hash draw, breaking any storage-order locality.

    Scale shape: no global total order anywhere — a global
    ``row_number()`` would funnel 100 TB through one task. The per-shard
    position window parallelizes across shards (pick num_shards >> cores;
    training shard counts are typically 2^10-2^14, so skew is ±sqrt
    noise). Follow with ``.repartition("shard")`` +
    ``partitionBy("shard")`` on write so each shard lands contiguously.
    Epoch variation = change the seed."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    h = hash60(
        F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
    )
    from pyspark.sql.window import Window

    shard = F.pmod(h, F.lit(num_shards)).cast("int")
    order = hash60(
        F.concat_ws(":", F.lit(f"pos|{seed}"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("__ord", key_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("__ord", order)
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .select("shard", "pos", *df.columns)
    )


def domain_cap(
    df: DataFrame,
    group_col: str = "source",
    cap: int = 100,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-domain document cap (C4/RefinedWeb-style): keep at most ``cap``
    rows per ``group_col``, chosen by a seeded md5 hash of the row key —
    a uniform random but fully deterministic survivor set, so reruns and
    engine swaps pick the same rows. Output adds ``grp_rank`` (0-based
    hash rank within the group).

    Scale shape: one ``row_number()`` window keyed on the domain — the
    sort parallelizes across domains and is bounded by the biggest one,
    the same cost any exact per-domain top-k pays. Web-corpus hub
    domains (millions of docs vs a cap of hundreds) should pre-thin
    before the sort: filter to ``pmod(hash, N) < ceil(c·cap)`` for a
    survival margin c, which keeps ≥cap rows w.h.p. and shrinks the
    sorted slice by N/(c·cap); the window then finishes exactly."""
    from pyspark.sql.window import Window

    h = hash60(
        F.concat_ws(
            ":", F.lit(str(seed)), F.col(group_col), F.col(key_col).cast("string")
        )
    )
    w = Window.partitionBy(group_col).orderBy("__h", key_col)
    ranked = (
        df.withColumn("__h", h)
        .withColumn("grp_rank", F.row_number().over(w).cast("long") - 1)
    )
    return ranked.filter(F.col("grp_rank") < cap).drop("__h")


def train_val_test_split(
    df: DataFrame,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    key_col: str = "doc_id",
    seed: int = 42,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'val' | 'test') by deterministic
    key hash: bucket = hash60(seed:key) mod resolution, cut at the
    cumulative weight boundaries. The properties that matter for corpus
    plumbing, all inherited from the hash design of
    :func:`stratified_sample`: reproducible across runs/partitionings, a
    pure narrow projection (zero shuffle), and STABLE under corpus growth —
    adding documents never moves an existing document between splits
    (uniform random assignment can't promise that across re-runs).

    One pass, one output: filter ``split = 'train'`` downstream and the
    predicate pushes to the scan."""
    w = list(weights)
    if len(w) != 3 or any(x < 0 for x in w) or sum(w) <= 0:
        raise ValueError("weights must be 3 non-negative values")
    total = sum(w)
    c1 = int(round(w[0] / total * resolution))
    c2 = c1 + int(round(w[1] / total * resolution))
    bucket = hash60(
        F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
    ) % resolution
    return df.withColumn(
        "split",
        F.when(bucket < c1, F.lit("train"))
        .when(bucket < c2, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    strata_col: Optional[str] = None,
    key_col: str = "doc_id",
    seed: int = 42,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Exact-size weighted sampling WITHOUT replacement: per stratum (or
    globally when ``strata_col`` is None), pick exactly ``k`` rows with
    inclusion probability proportional to ``weight_col`` — the
    Efraimidis–Spirakis exponential-key scheme (IPL 97(5), 2006): draw
    u ~ U(0,1) per row, order by the key ``-ln(u) / w`` ascending, take
    the first ``k``. Rows with non-positive or NULL weight are excluded
    (they'd have infinite keys).

    Deterministic like every sampler in this module: ``u`` derives from
    ``hash60(seed:stratum:key)`` (``(bucket + 0.5) / resolution``, never
    exactly 0 or 1), so re-runs, re-partitionings, and a SQL oracle all
    select the identical set. Output adds ``sample_rank`` (1-based
    position in the stratum's key order).

    Scale shape: the key is a narrow per-row projection; per-stratum
    top-k is one rank window (single shuffle on the stratum key, and
    Spark's WindowGroupLimit pushes the rank<=k filter into partial
    top-k sorts map-side — no stratum ever materializes fully sorted).
    The global variant uses one all-rows window partition: prefer
    strata, or at 100 TB swap in orderBy(key).limit(k) which
    tree-reduces per-partition top-k on the driver-free path."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    strata = (
        F.col(strata_col).cast("string")
        if strata_col is not None
        else F.lit("")
    )
    key = F.concat_ws(
        ":", F.lit(str(seed)), strata, F.col(key_col).cast("string")
    )
    u = (
        F.pmod(hash60(key), F.lit(resolution)).cast("double") + F.lit(0.5)
    ) / F.lit(float(resolution))
    es_key = -F.log(u) / F.col(weight_col).cast("double")
    from pyspark.sql.window import Window

    part = (
        Window.partitionBy(strata_col) if strata_col is not None else Window.partitionBy()
    )
    ranked = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__es", es_key)
        .withColumn(
            "sample_rank",
            F.row_number().over(part.orderBy(F.col("__es"), F.col(key_col))),
        )
    )
    return ranked.filter(F.col("sample_rank") <= k).drop("__es")


def dsir_weights(
    docs: DataFrame,
    target_sources: Sequence[str],
    text_col: str = "text",
    source_col: str = "source",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    checkpoint_dir: Optional[str] = None,
    materialize: bool = True,
) -> DataFrame:
    """[doc_id, n_grams, logratio] — per-document importance weight for
    Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
    hashed-n-gram bag-of-words log-likelihood ratio between a TARGET
    slice of the corpus (the high-quality domain you want more of) and
    the RAW corpus.  ``logratio = Σ_g ln p_target(bucket(g)) −
    ln p_raw(bucket(g))`` over every unigram and bigram occurrence ``g``;
    resample the corpus proportional to ``exp(logratio)`` (or take the
    top fraction) to shift the mixture toward the target distribution.

    Hashing uses the cross-engine ``hash60`` (md5-prefix) so an external
    SQL engine replays the identical bucket assignment. Probabilities
    are Laplace-smoothed per bucket; the per-bucket log-ratio is
    quantized to INTEGER micro-units (round(lr·10⁶) as BIGINT) before
    the per-doc dot product, so the doc score is an exact integer sum —
    bit-identical regardless of float summation order — and only divided
    back to a double at the end.

    Scale shape — SINGLE corpus pass: the gram explode + md5 bucketing
    run ONCE into a combine-enabled groupBy(doc_id, source, bucket)
    count, materialized via ``localCheckpoint`` (the compact per-doc
    histogram — ≤ distinct-buckets-per-doc rows per document, far
    smaller than the gram stream). Bucket tallies re-aggregate that
    frame onto ``n_buckets`` keys (tiny, broadcast back) and scoring is
    one more combine-enabled groupBy(doc_id) — so the expensive term
    (corpus text scan + 20M+ md5 hashes) is paid once, not twice.
    Measured 2.0x on the 200k-doc bench tier (21s -> 10.4s). No stage
    depends on |target|×|raw|.
    """
    if not target_sources:
        raise ValueError("target_sources must be non-empty")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        "doc_id",
        F.col(source_col).alias("__src"),
        F.explode(F.concat(toks, bigrams)).alias("gram"),
    ).select(
        "doc_id",
        "__src",
        F.pmod(hash60(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
    )
    # one hashing pass: collapse the gram stream to the per-(doc, bucket)
    # histogram and pin it — both the ratio build and the scoring read
    # this compact frame instead of re-exploding the corpus.
    # Materialization contract (three modes, cluster-caller's choice):
    #   checkpoint_dir set -> RELIABLE parquet checkpoint (survives
    #     executor loss — the right mode on a real cluster);
    #   materialize=True (default) -> eager localCheckpoint: fastest on a
    #     healthy cluster / local mode, but executor-storage-only (lost
    #     blocks are unrecoverable) and it runs a job at plan-construction
    #     time even if the caller never executes the result;
    #   materialize=False -> no pinning: pure lazy plan, the corpus scan
    #     is re-executed by each downstream branch (2 passes) — for
    #     callers who only explain() or who checkpoint downstream.
    per_db = grams.groupBy("doc_id", "__src", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if checkpoint_dir is not None:
        import os as _os
        import uuid as _uuid

        from graphframes_rs_spark.plans.checkpointer import ParquetCheckpointer

        # unique subdir per call: two calls sharing a checkpoint_dir must
        # not overwrite each other's still-referenced files (the first
        # result would silently read the second call's histogram). The
        # caller owns cleanup of checkpoint_dir, as with any reliable
        # checkpoint location.
        per_db = ParquetCheckpointer(
            docs.sparkSession,
            _os.path.join(checkpoint_dir, f"dsir_{_uuid.uuid4().hex[:10]}"),
        ).push(per_db, "dsir_per_db")
    elif materialize:
        per_db = per_db.localCheckpoint()
    is_target = F.col("__src").isin(*[str(s) for s in target_sources])
    tallies = per_db.groupBy("bucket").agg(
        F.sum(F.when(is_target, F.col("cnt")).otherwise(0)).alias("cnt_t"),
        F.sum("cnt").alias("cnt_r"),
    )
    totals = tallies.agg(
        F.sum("cnt_t").alias("tot_t"), F.sum("cnt_r").alias("tot_r")
    )
    s = float(smoothing)
    ratio = (
        tallies.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.col("cnt_t") + s) / (F.col("tot_t") + s * n_buckets))
                    - F.log((F.col("cnt_r") + s) / (F.col("tot_r") + s * n_buckets))
                )
                * 1_000_000,
                0,
            )
            .cast("long")
            .alias("lr_u"),
        )
    )
    # scoring: broadcast the tiny ratio table onto the per-doc histogram —
    # Σ cnt·lr_u is an exact integer dot product, reproducible under any
    # aggregation order
    return (
        per_db.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("cnt") * F.col("lr_u")) / 1e6, 6).alias(
                "logratio"
            ),
        )
    )
