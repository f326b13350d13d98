"""Streaming deduplication: the continuous-ingest face of the batch dedup
operators (``pipeline.dedup``). A training-data pipeline that ingests a
corpus as a stream needs first-arrival-wins exact dedup at the door —
downstream near-dup passes stay batch (they need corpus-global candidate
generation), but exact dedup is a per-key decision Spark's streaming
state store answers natively.

Scale notes: ``dropDuplicates`` on an unbounded stream grows one state
entry per distinct hash forever; ``dropDuplicatesWithinWatermark`` bounds
the store by evicting hashes older than the event-time watermark — the
right default when duplicates cluster in time (re-crawls, retries,
mirror bursts). Content hashing stays a JVM-side ``md5`` projection.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """First-arrival-wins exact dedup over a streaming documents source:
    input rows + a ``content_hash`` column, one output row per distinct
    content hash.

    With ``ts_col`` + ``watermark`` the dedup state is watermark-bounded
    (``dropDuplicatesWithinWatermark``): a duplicate arriving later than
    the watermark re-emits — the bounded-memory trade every unbounded
    streaming dedup must pick. Without them the state store holds every
    hash seen (exact forever, unbounded growth — batch-backfill and
    bounded-ingest use only)."""
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def _banded_buckets(
    docs: DataFrame,
    text_col: str,
    order_col: Optional[str],
    k: int,
    bands: int,
    n: int,
    seed: int,
) -> DataFrame:
    """[doc_id, __ord, band, bucket] — each document's LSH band buckets
    (the batch pipeline's minhash + band keys, reused verbatim so the
    streaming and batch faces can never disagree on bucketing), plus the
    arbitration order ``__ord`` (``order_col`` or doc_id)."""
    from graphframes_rs_spark.pipeline.dedup import (
        _lsh_band_keys,
        minhash_signatures,
    )

    # NULL-text docs would produce NULL signatures -> NULL buckets, and
    # the null-unsafe claim joins downstream would silently DROP them
    # (absence means rejection in this family); they carry no content to
    # collide on, so the consumers accept them unconditionally instead —
    # keep them out of the bucket pipeline entirely
    docs = docs.filter(F.col(text_col).isNotNull())
    sigs = minhash_signatures(docs, text_col=text_col, k=k, n=n, seed=seed)
    if order_col is not None:
        sigs = sigs.join(docs.select("doc_id", order_col), "doc_id").withColumn(
            "__ord", F.col(order_col)
        )
    else:
        sigs = sigs.withColumn("__ord", F.col("doc_id"))
    return sigs.select(
        "doc_id",
        "__ord",
        F.posexplode(F.array(*_lsh_band_keys(k, bands))).alias(
            "band", "bucket"
        ),
    )


def _require_local_path(path: str, caller: str) -> str:
    """Validate that ``path`` targets the driver-local filesystem and
    return it with any ``file:`` scheme stripped (so ``os`` and Spark
    agree on the location). The crash-safe index swap in this module is
    implemented with driver-local ``os.rename``/``shutil.rmtree``; on a
    non-local store those checks silently see "no index" and reset dedup
    state, so any other URI scheme raises instead."""
    if "://" in path or (":" in path.split("/", 1)[0] if "/" in path else ":" in path):
        scheme, _, rest = path.partition(":")
        if scheme.lower() != "file":
            raise ValueError(
                f"{caller}: index_dir {path!r} uses scheme {scheme!r}, but "
                "the persistent claim index is LOCAL-FILESYSTEM ONLY (the "
                "existence check and crash-safe rename swap run through "
                "driver-local os/shutil; a non-local store would silently "
                "read as 'no index' and reset dedup state). Use a plain "
                "local path or file: URI, or front the index with a "
                "transactional table format."
            )
        # file:///tmp/x -> ///tmp/x (empty authority); file:/tmp/x -> /tmp/x
        return rest[2:] if rest.startswith("///") else rest
    return path


def neardup_first_arrival(
    docs: DataFrame,
    text_col: str = "text",
    order_col: Optional[str] = None,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """[doc_id] — the documents that SURVIVE first-arrival-wins near-dup
    at LSH-bucket granularity: a doc is accepted iff it is the earliest
    arrival (min ``(order_col, doc_id)``; plain min doc_id when
    ``order_col`` is None) in EVERY one of its ``bands`` band buckets.
    Later docs sharing any bucket with any earlier doc are dropped —
    candidate-level near-dup filtering at the ingestion door (a batch
    near-dup pass downstream still does exact rescoring; this operator's
    job is to stop the flood of obvious re-crawls before it).

    Two properties make this the right streaming contract (the batch
    twin here is what :func:`streaming_neardup_dedup` computes
    incrementally):
      * bucket claims are independent of acceptance (a doc beaten in one
        bucket still claims the others), so the result is a pure
        per-bucket min over the whole input — INVARIANT to how the
        stream is chopped into microbatches;
      * the per-doc decision is an all-buckets conjunction, i.e. one
        groupBy after the claim join — no sequential greedy feedback.

    Scale shape: narrow minhash + band keys (zero shuffle), one
    bucket-keyed min aggregate (map-side combinable), one join back on
    (band, bucket), one per-doc bool_and. All shuffle keys are bucket- or
    doc-sized; no pair materialization at all (contrast
    ``minhash_lsh_candidates``' |bucket|^2 output — the dedup decision
    never needs the pairs)."""
    bb = _banded_buckets(docs, text_col, order_col, k, bands, n, seed)
    return _first_arrival_survivors(docs, bb, text_col)


def _first_arrival_survivors(
    docs: DataFrame, bb: DataFrame, text_col: str
) -> DataFrame:
    """Shared first-arrival arbitration over a bucket frame
    ``[doc_id, __ord, band, bucket]`` (MinHash LSH buckets or simhash
    pigeonhole bands — the family contract is identical): survive iff
    earliest ``(__ord, doc_id)`` claimant of EVERY bucket, plus the
    unconditional NULL-text acceptance (no content to collide on; the
    bucket builders exclude them, so absence would read as rejection)."""
    winners = bb.groupBy("band", "bucket").agg(
        F.min(F.struct("__ord", "doc_id")).alias("w")
    )
    claims = bb.join(winners, ["band", "bucket"]).select(
        "doc_id",
        (
            (F.col("w.__ord") == F.col("__ord"))
            & (F.col("w.doc_id") == F.col("doc_id"))
        ).alias("claimed"),
    )
    survivors = (
        claims.groupBy("doc_id")
        .agg(F.bool_and("claimed").alias("__all"))
        .filter(F.col("__all"))
        .select("doc_id")
    )
    return survivors.unionByName(
        docs.filter(F.col(text_col).isNull()).select("doc_id")
    )


def neardup_ingest_batch(
    batch: DataFrame,
    index_dir: str,
    text_col: str = "text",
    order_col: Optional[str] = None,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
    horizon: Optional[float] = None,
) -> DataFrame:
    """Process ONE (micro)batch of documents against a persistent
    LSH-bucket claim index under ``index_dir``: returns the batch rows
    that survive :func:`neardup_first_arrival` semantics against
    everything already indexed PLUS this batch, and merges this batch's
    bucket claims into the index (claims register whether or not the doc
    was accepted — the property that makes the result microbatch-
    boundary invariant).

    The index is one parquet table [band, bucket, ord, doc_id] holding
    each bucket's earliest claimant — bucket-count rows, not corpus
    rows. ``horizon``: evict index entries with ``ord`` older than
    ``max(batch ord) - horizon`` after the merge — the watermark analog
    that bounds state when duplicates cluster in time (re-crawls,
    mirror bursts); evicted buckets can be re-claimed later, the same
    re-emit trade ``dropDuplicatesWithinWatermark`` makes.

    Exactness contract: if batches arrive in non-decreasing
    ``(order_col, doc_id)`` order (a file-source replay, an ordered
    ingest queue) and ``horizon`` is None, the union of accepted rows
    across batches EQUALS :func:`neardup_first_arrival` on the
    concatenated input — pinned by the streaming==batch pytest. With
    out-of-order arrival, acceptance is first-PROCESSED-wins: an early
    row arriving late cannot retroactively un-emit a winner.

    LOCAL-FILESYSTEM ONLY: ``index_dir`` must be a plain path (or
    ``file:`` URI) on a filesystem the DRIVER shares with Spark — the
    existence check and the crash-safe rename swap run through
    driver-local ``os``/``shutil``. On HDFS/S3 (or a cluster where the
    driver doesn't mount the store) ``os.path.isdir`` would return False
    and the batch would silently re-arbitrate against an EMPTY index —
    exactly the dedup-state reset this function must never allow — so a
    non-local URI raises up front. Porting to a shared store means
    routing these four filesystem ops through Hadoop's FileSystem API
    (``jvm.org.apache.hadoop.fs.FileSystem``) or a transactional table
    format; the arbitration dataflow itself is already cluster-safe."""
    index_dir = _require_local_path(index_dir, "neardup_ingest_batch")
    bb = _banded_buckets(batch, text_col, order_col, k, bands, n, seed)
    return _ingest_claims_batch(batch, bb, index_dir, text_col, horizon)


def _ingest_claims_batch(
    batch: DataFrame,
    bb: DataFrame,
    index_dir: str,
    text_col: str,
    horizon: Optional[float],
) -> DataFrame:
    """Shared claim-index microbatch arbitration for the bucket-claim
    dedup family (MinHash via :func:`neardup_ingest_batch`, simhash via
    :func:`simhash_ingest_batch`): merge the batch's per-bucket earliest
    claimants into the persisted ``[band, bucket, ord, doc_id]`` index
    with the crash-safe rename-aside swap, and return the batch rows
    accepted under :func:`_first_arrival_survivors` semantics against
    index ∪ batch. ``bb`` is the caller's bucket frame
    ``[doc_id, __ord, band, bucket]`` — the only space-specific part."""
    import os as _os
    import shutil as _sh

    spark = batch.sparkSession
    staged = index_dir.rstrip("/") + ".staging"
    old = index_dir.rstrip("/") + ".old"
    # Crash recovery for the write-then-swap below. The only window where
    # index_dir is absent mid-swap leaves ".old" behind (the swap renames
    # the live index aside before promoting the staged one); restoring it
    # is exact — the crashed batch's acceptances were never appended by
    # the caller either, so the replay re-arbitrates from the pre-batch
    # state. Leftover ".staging"/".old" beside a LIVE index are artifacts
    # of a crash after promotion; the live dir is authoritative.
    if not _os.path.isdir(index_dir) and _os.path.isdir(old):
        _os.rename(old, index_dir)
    _sh.rmtree(staged, ignore_errors=True)
    _sh.rmtree(old, ignore_errors=True)

    # the bucket pipeline feeds three separate actions below (batch_best,
    # the claims join, the horizon max) — persist so the signature scan
    # runs once per microbatch, not once per action
    bb = bb.persist()
    batch_best = bb.groupBy("band", "bucket").agg(
        F.min(F.struct(F.col("__ord").alias("ord"), "doc_id")).alias("w")
    )
    # existence check, not try/except: a CORRUPT index must raise, not
    # silently reset the dedup state to empty
    have_index = _os.path.isdir(index_dir)
    if have_index:
        idx = spark.read.parquet(index_dir)
        prior = idx.select(
            "band",
            "bucket",
            F.struct(F.col("ord"), F.col("doc_id")).alias("w"),
        )
        combined = (
            batch_best.unionByName(prior)
            .groupBy("band", "bucket")
            .agg(F.min("w").alias("w"))
        )
    else:
        combined = batch_best
    claims = bb.join(combined, ["band", "bucket"]).select(
        "doc_id",
        (
            (F.col("w.ord") == F.col("__ord"))
            & (F.col("w.doc_id") == F.col("doc_id"))
        ).alias("claimed"),
    )
    accepted_ids = (
        claims.groupBy("doc_id")
        .agg(F.bool_and("claimed").alias("__all"))
        .filter(F.col("__all"))
        .select("doc_id")
        # NULL-text docs carry nothing to collide on — accepted
        # unconditionally (they are excluded from the bucket pipeline,
        # see _banded_buckets, so absence here would silently reject)
        .unionByName(
            batch.filter(F.col(text_col).isNull()).select("doc_id")
        )
    )
    # materialize acceptances BEFORE the index overwrite: `accepted`
    # reads the old index lazily, and overwriting it first would corrupt
    # the read (and the batch's own decision); localCheckpoint cuts the
    # lineage to the soon-to-be-replaced files
    accepted = batch.join(accepted_ids, "doc_id").localCheckpoint(eager=True)
    new_index = combined.select(
        "band", "bucket", F.col("w.ord").alias("ord"), F.col("w.doc_id").alias("doc_id")
    )
    if horizon is not None:
        hi = bb.agg(F.max("__ord")).collect()[0][0]
        if hi is not None:
            import datetime as _dt

            # order_col may be a timestamp — horizon is then seconds
            # (the watermark analog); numeric orders subtract directly
            cutoff = hi - (
                _dt.timedelta(seconds=horizon)
                if isinstance(hi, _dt.datetime)
                else horizon
            )
            new_index = new_index.filter(F.col("ord") >= F.lit(cutoff))
    # Write-then-swap. Order matters for crash safety (the recovery
    # prologue above understands exactly these states): stage the new
    # index, move the live one ASIDE (never delete before the promote —
    # an rmtree-then-rename window would read as "no index = empty
    # corpus" after a crash and silently reset dedup state), promote,
    # then drop the old.
    new_index.write.mode("overwrite").parquet(staged)
    bb.unpersist()
    if _os.path.isdir(index_dir):
        _os.rename(index_dir, old)
    _os.rename(staged, index_dir)
    _sh.rmtree(old, ignore_errors=True)
    return accepted


def streaming_neardup_dedup(
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    order_col: Optional[str] = None,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
    horizon: Optional[float] = None,
):
    """Continuous first-arrival near-dup ingestion: the streaming face of
    :func:`neardup_first_arrival` (and the near-dup sibling of
    :func:`streaming_exact_dedup`). Each microbatch is arbitrated against
    the persistent bucket-claim index via :func:`neardup_ingest_batch`
    (``foreachBatch`` — the same pattern as the CDC upsert sink: the
    per-batch logic IS the batch operator, so streaming and batch cannot
    drift); survivors append to ``out_dir`` as parquet.

    State is the bucket-claim index: one row per distinct band bucket
    ever claimed — bounded by bucket cardinality, not corpus size, and
    further bounded by ``horizon`` (evict claims older than the newest
    batch minus horizon; the watermark analog). Returns the started
    StreamingQuery.

    Failure semantics: arbitration is retry-idempotent (a replayed batch
    re-finds its own claims at the same ``(ord, doc_id)`` and accepts
    the same rows), but the parquet ``append`` to ``out_dir`` is not —
    a crash between the index swap and the append can duplicate rows on
    replay, the standard foreachBatch at-least-once trade; dedup
    ``out_dir`` on doc_id downstream or swap the sink for a
    transactional table format when exactly-once matters.

    ``index_dir`` is LOCAL-FILESYSTEM ONLY (driver-local crash-safe
    swap — see :func:`neardup_ingest_batch`; non-local URIs raise).
    ``out_dir``/``checkpoint_dir`` are written by Spark itself and may
    live on any supported filesystem."""

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        accepted = neardup_ingest_batch(
            batch,
            index_dir,
            text_col=text_col,
            order_col=order_col,
            k=k,
            bands=bands,
            n=n,
            seed=seed,
            horizon=horizon,
        )
        accepted.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _simhash_buckets(
    docs: DataFrame,
    text_col: str,
    order_col: Optional[str],
    bits: int,
    max_hamming: int,
) -> DataFrame:
    """[doc_id, __ord, band, bucket] — each document's simhash pigeonhole
    band values (the batch pipeline's shared ``_simhash_band_vals``
    banding, so streaming and batch can never band differently), plus the
    arbitration order. The simhash twin of :func:`_banded_buckets`."""
    from graphframes_rs_spark.pipeline.dedup import (
        _simhash_band_vals,
        simhash,
    )

    docs = docs.filter(F.col(text_col).isNotNull())
    sigs = simhash(docs, text_col=text_col, bits=bits)
    if order_col is not None:
        sigs = sigs.join(docs.select("doc_id", order_col), "doc_id").withColumn(
            "__ord", F.col(order_col)
        )
    else:
        sigs = sigs.withColumn("__ord", F.col("doc_id"))
    return sigs.select(
        "doc_id",
        "__ord",
        F.posexplode(_simhash_band_vals(bits, max_hamming)).alias(
            "band", "bucket"
        ),
    )


def simhash_first_arrival(
    docs: DataFrame,
    text_col: str = "text",
    order_col: Optional[str] = None,
    bits: int = 32,
    max_hamming: int = 1,
) -> DataFrame:
    """[doc_id] — first-arrival-wins near-dup filtering in the SIMHASH
    space: a doc survives iff it is the earliest ``(order, doc_id)``
    claimant of every one of its ``max_hamming + 1`` pigeonhole band
    buckets (by pigeonhole, any pair within the Hamming budget shares at
    least one whole band — so a doc within ``max_hamming`` bits of any
    earlier doc is guaranteed to lose a bucket and drop). Same
    bucket-granularity contract as :func:`neardup_first_arrival` (drop on
    band collision, no pairwise rescore — the ingestion-door filter;
    band collisions beyond the Hamming budget also drop, the
    conservative direction) and the same two scale properties: claims
    independent of acceptance (microbatch-boundary invariant) and zero
    pair materialization.

    BAND-WIDTH RULE (why the default budget is 1, not the pair
    operators' 3): bucket-granularity dropping has no popcount rescore,
    so every SPURIOUS band collision drops a distinct document. Band
    width is ``bits // (max_hamming + 1)`` and the spurious-collision
    odds scale like n² / 2^width — at bits=32, budget 3 means 8-bit
    bands (256 buckets: a few hundred docs already collide everywhere,
    measured 490/500 spuriously dropped on the test corpus), while
    budget 1 means 16-bit bands (65k buckets). Size ``2^width`` well
    above the corpus (or horizon-bounded window): bits up to 62 are
    long-safe, giving 31-bit bands at budget 1. For aggressive near-dup
    dropping at web scale prefer the MinHash face, whose band keys live
    in a ~2^64 space."""
    bb = _simhash_buckets(docs, text_col, order_col, bits, max_hamming)
    return _first_arrival_survivors(docs, bb, text_col)


def simhash_ingest_batch(
    batch: DataFrame,
    index_dir: str,
    text_col: str = "text",
    order_col: Optional[str] = None,
    bits: int = 32,
    max_hamming: int = 1,
    horizon: Optional[float] = None,
) -> DataFrame:
    """One microbatch of :func:`simhash_first_arrival` against a
    persistent band-bucket claim index — the simhash twin of
    :func:`neardup_ingest_batch` (same ``[band, bucket, ord, doc_id]``
    index layout, same crash-safe rename-aside swap + recovery, same
    ``horizon`` eviction trade, same LOCAL-FILESYSTEM-ONLY contract, and
    the same exactness contract: in-order batches + no horizon ==
    :func:`simhash_first_arrival` on the concatenated input). The
    ``bits``/``max_hamming`` dials must match across every batch fed to
    one ``index_dir`` — claim buckets from different bandings never
    collide, silently waving duplicates through (same discipline the
    MinHash face requires of its ``k``/``bands``/``seed``)."""
    index_dir = _require_local_path(index_dir, "simhash_ingest_batch")
    bb = _simhash_buckets(batch, text_col, order_col, bits, max_hamming)
    return _ingest_claims_batch(batch, bb, index_dir, text_col, horizon)


def streaming_simhash_dedup(
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    order_col: Optional[str] = None,
    bits: int = 32,
    max_hamming: int = 1,
    horizon: Optional[float] = None,
):
    """Continuous simhash first-arrival ingestion — the streaming face of
    :func:`simhash_first_arrival`, wired exactly like
    :func:`streaming_neardup_dedup` (``foreachBatch`` over
    :func:`simhash_ingest_batch`, survivors appended to ``out_dir``;
    same at-least-once sink trade and LOCAL-FS index contract). Returns
    the started StreamingQuery."""

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        accepted = simhash_ingest_batch(
            batch,
            index_dir,
            text_col=text_col,
            order_col=order_col,
            bits=bits,
            max_hamming=max_hamming,
            horizon=horizon,
        )
        accepted.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def embedding_first_arrival(
    embeddings: DataFrame,
    threshold: float = 0.9,
    order_col: Optional[str] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    nlist="auto",
    nprobe: int = 4,
) -> DataFrame:
    """[<id_col>] — first-arrival-wins near-dup filtering in EMBEDDING
    space: a vector survives iff NO strictly earlier vector (by
    ``(order_col, id)``; plain id order when ``order_col`` is None) has
    cosine >= ``threshold`` with it. "Earlier" counts every processed
    vector, accepted or not — the claim-independence property that makes
    the result microbatch-boundary invariant (the semantics
    :func:`streaming_embedding_dedup` computes incrementally), and the
    embedding twin of the bucket-claim faces. Transitive chains drop
    conservatively (C near only the dropped B still drops — the cluster
    intuition of ``semantic_dedup_clusters``).

    NULL-vector rows are accepted unconditionally (nothing to compare —
    same contract as the NULL-text documents in the other faces).
    Candidate generation is ``pipeline.dedup.embedding_near_duplicates``
    with these dials: exact below the auto crossover, IVF-approximate
    above it (recall-gated family contract — pass ``method="blocked"``
    for exact at any size, paying the quadratic FLOPs)."""
    from graphframes_rs_spark.pipeline.dedup import embedding_near_duplicates

    nn = embeddings.filter(F.col(vec_col).isNotNull())
    pairs = embedding_near_duplicates(
        nn, vec_col=vec_col, id_col=id_col, threshold=threshold,
        method=method, nlist=nlist, nprobe=nprobe,
    )
    ordf = nn.select(
        F.col(id_col).alias("__id"),
        (F.col(order_col) if order_col is not None else F.col(id_col)).alias(
            "__o"
        ),
    )
    p = pairs.join(
        ordf.select(F.col("__id").alias("id_a"), F.col("__o").alias("__oa")),
        "id_a",
    ).join(
        ordf.select(F.col("__id").alias("id_b"), F.col("__o").alias("__ob")),
        "id_b",
    )
    a_earlier = (F.col("__oa") < F.col("__ob")) | (
        (F.col("__oa") == F.col("__ob")) & (F.col("id_a") < F.col("id_b"))
    )
    dropped = p.select(
        F.when(a_earlier, F.col("id_b")).otherwise(F.col("id_a")).alias("__id")
    ).distinct()
    return (
        nn.select(F.col(id_col))
        .join(dropped, F.col(id_col) == F.col("__id"), "left_anti")
        .unionByName(
            embeddings.filter(F.col(vec_col).isNull()).select(id_col)
        )
    )


def embedding_ingest_batch(
    batch: DataFrame,
    index_dir: str,
    threshold: float = 0.9,
    order_col: Optional[str] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    method: str = "auto",
    broadcast_batch: bool = True,
) -> DataFrame:
    """One microbatch of :func:`embedding_first_arrival` against a
    persistent IVF vector index under ``index_dir`` (layout: ``ivf/``, an
    :class:`pipeline.similarity.IVFIndex` save dir, + ``ords/``
    ``[id, ord]`` arrival orders): returns the accepted batch rows and
    registers ALL batch vectors (accepted or not — claim independence,
    the microbatch-invariance property) in the index.

    Dataflow: within-batch arbitration is the batch twin itself;
    batch-vs-index candidates come from
    ``pipeline.dedup.embedding_dedup_against_index`` over the stored
    index (``nprobe`` cells per query; ``nprobe >= nlist`` makes the
    probe exhaustive and the result exact — the equality-pytest dials),
    and a candidate drops the batch row iff the index copy is STRICTLY
    earlier by ``(ord, id)`` — so a replayed batch (same ids, same ords
    already indexed) re-accepts exactly the same rows instead of being
    annihilated by its own copies, the retry-idempotence contract of
    the claim-index faces.

    First batch bootstraps the index: IVF centroids are fit on it
    (``nlist`` capped at the batch size) and FROZEN thereafter — the
    standard IVF add path; when a recall probe says the centroids have
    aged, rebuild with ``similarity.ivf_index`` over the accumulated
    vectors (``ivf_index_maintain`` is that loop). Crash safety: the
    bootstrap stages + renames (a torn first save can never be read);
    steady-state appends write ``ords`` BEFORE vectors, so the only torn
    state is ord rows without vector twins — inert, since candidates
    only arise from indexed vectors. State grows O(processed vectors)
    (contrast the bucket-claim faces' O(buckets)): eviction means a
    rebuild over a filtered corpus, there is no cheap horizon here.
    LOCAL-FILESYSTEM ONLY (driver-local bootstrap rename — same contract
    as :func:`neardup_ingest_batch`)."""
    import os as _os
    import shutil as _sh

    from graphframes_rs_spark.pipeline import similarity as _sim
    from graphframes_rs_spark.pipeline.dedup import (
        embedding_dedup_against_index,
    )

    index_dir = _require_local_path(index_dir, "embedding_ingest_batch")
    ivf_path = index_dir.rstrip("/") + "/ivf"
    ords_path = index_dir.rstrip("/") + "/ords"
    spark = batch.sparkSession
    nn = batch.filter(F.col(vec_col).isNotNull())
    ordf = nn.select(
        F.col(id_col).alias("id"),
        (F.col(order_col) if order_col is not None else F.col(id_col)).alias(
            "ord"
        ),
    )
    have = _os.path.isdir(ivf_path)
    wb = embedding_first_arrival(
        batch, threshold=threshold, order_col=order_col, id_col=id_col,
        vec_col=vec_col, method=method, nlist="auto" if method == "auto" else nlist,
        nprobe=nprobe,
    )
    if have:
        idx = _sim.ivf_index_load(spark, ivf_path)
        cands = embedding_dedup_against_index(
            nn, idx, threshold=threshold, nprobe=nprobe, vec_col=vec_col,
            id_col=id_col, skip_same_id=False, broadcast_batch=broadcast_batch,
        )
        iords = spark.read.parquet(ords_path).select(
            F.col("id").alias("index_id"), F.col("ord").alias("__iord")
        )
        bords = ordf.select(
            F.col("id").alias("new_id"), F.col("ord").alias("__bord")
        )
        idx_earlier = (F.col("__iord") < F.col("__bord")) | (
            (F.col("__iord") == F.col("__bord"))
            & (F.col("index_id") < F.col("new_id"))
        )
        dropped = (
            cands.join(iords, "index_id")
            .join(bords, "new_id")
            .filter(idx_earlier)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        accepted_ids = wb.join(dropped, id_col, "left_anti")
    else:
        accepted_ids = wb
    # materialize acceptances BEFORE the index writes (the decision plan
    # reads the pre-batch index lazily)
    accepted = batch.join(accepted_ids, id_col).localCheckpoint(eager=True)
    # ords FIRST: the torn state (ords without vectors) is inert —
    # candidates only arise from vectors present in assigned/
    ordf.write.mode("append").parquet(ords_path)
    if have:
        _sim.ivf_index_append(spark, ivf_path, nn)
    elif nn.take(1):
        n = nn.count()
        staged = ivf_path + ".staging"
        _sh.rmtree(staged, ignore_errors=True)
        _sim.ivf_index(
            nn, nlist=max(1, min(int(nlist), n)), vec_col=vec_col,
            id_col=id_col,
        ).save(staged)
        _os.rename(staged, ivf_path)  # promote: a torn save is never live
    return accepted


def streaming_embedding_dedup(
    stream: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    order_col: Optional[str] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    method: str = "auto",
):
    """Continuous embedding-space first-arrival ingestion — the streaming
    face of :func:`embedding_first_arrival` (``foreachBatch`` over
    :func:`embedding_ingest_batch`; survivors append to ``out_dir``; same
    at-least-once sink trade and LOCAL-FS index contract as the other
    faces). With ``nprobe >= nlist`` the arbitration is exact; smaller
    ``nprobe`` trades recall for per-batch probe cost under the ANN
    family's recall-gate discipline. Returns the started
    StreamingQuery."""

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        accepted = embedding_ingest_batch(
            batch,
            index_dir,
            threshold=threshold,
            order_col=order_col,
            id_col=id_col,
            vec_col=vec_col,
            nlist=nlist,
            nprobe=nprobe,
            method=method,
        )
        accepted.write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
