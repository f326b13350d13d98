"""Engine configuration via ``spark.graphframes.*`` session conf keys.

Mirrors the reference's ``GraphFramesConfig`` registered engine options
(reference: src/utils/options.rs:5-21 — ``graphframes.prefer_smj``,
``graphframes.checkpoint_dir``) as Spark session configuration, the
idiomatic place for engine knobs. All keys are read lazily at algorithm
run time, so ``spark.conf.set(...)`` takes effect per run.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

# Where iterative algorithms place their parquet/bucketed checkpoints when
# the builder did not set one (reference: graphframes.checkpoint_dir).
CHECKPOINT_DIR = "spark.graphframes.checkpointDir"

# Use hash-bucketed sorted checkpoint tables so per-superstep joins elide
# their Exchange (the reference's push_pre_sorted contract, §4 of SURVEY.md).
BUCKETED_CHECKPOINTS = "spark.graphframes.bucketedCheckpoints"

# The reference pins sort-merge join for out-of-core friendliness
# (graphframes.prefer_smj, default true). On Spark the analogue is leaving
# broadcast available but letting callers force SMJ behaviour by disabling
# the broadcast threshold; kept as a documented knob.
PREFER_SMJ = "spark.graphframes.preferSortMergeJoin"


def _get(spark: SparkSession, key: str, default: Optional[str]) -> Optional[str]:
    try:
        return spark.conf.get(key, default)
    except Exception:
        return default


def use_bucketed_checkpoints(spark: SparkSession) -> bool:
    return str(_get(spark, BUCKETED_CHECKPOINTS, "true")).lower() == "true"


def default_checkpoint_dir(spark: SparkSession) -> Optional[str]:
    return _get(spark, CHECKPOINT_DIR, None)


def prefer_smj(spark: SparkSession) -> bool:
    return str(_get(spark, PREFER_SMJ, "false")).lower() == "true"


# Parquet-checkpoint cadence for Pregel supersteps (classic GraphFrames
# checkpointInterval): intermediate supersteps persist in memory/disk and
# only every k-th writes parquet. 1 = write every superstep. Default 2,
# from measurement: halved checkpoint IO nets 15-25% on the iterative
# bench queries. Voting stays exact at any interval — every superstep's
# voting metric rides the write job via observe(), and the engine rolls
# back to the cached fixpoint state if an intermediate round converged —
# so interval only changes IO cadence, never results or iterations_.
PREGEL_CHECKPOINT_INTERVAL = "spark.graphframes.pregel.checkpointInterval"


def pregel_checkpoint_interval(spark: SparkSession) -> int:
    try:
        return max(1, int(_get(spark, PREGEL_CHECKPOINT_INTERVAL, "2")))
    except (TypeError, ValueError):
        return 2


def apply_session_prefs(spark: SparkSession) -> None:
    """Apply the join-strategy preference the way the reference's
    ``scoped_ctx`` does (options.rs:16-21): when ``preferSortMergeJoin`` is
    set, disable auto-broadcast so every join streams (out-of-core mode)."""
    if prefer_smj(spark):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")


# Gated fast path for closed-triangle motif patterns in find(): enumerate
# undirected triangles with degree-ordered wedges (bounding wedge fan-out
# by the LOW-degree endpoint, the classic hub mitigation), then expand to
# the pattern's directed bindings from per-pair direction counts. Same
# bindings as the naive join chain — including duplicate-edge
# multiplicities and self-loop degenerate matches — at a fraction of the
# intermediate size on hub-heavy graphs. Disable to force the literal
# term-order join chain.
MOTIF_TRIANGLE_FAST_PATH = "spark.graphframes.motif.triangleFastPath"


def motif_triangle_fast_path(spark: SparkSession) -> bool:
    return str(_get(spark, MOTIF_TRIANGLE_FAST_PATH, "true")).lower() == "true"


# Specialized k-core loop (default on): the H-index fixpoint iterated as a
# direct single-exchange-per-round dataflow instead of a generic Pregel
# client — measured 44-55s vs 60-103s for the Pregel form on the skew18m
# bench tier (18M edges, 364k-degree hub, 7 refinements, local[32]).
# Disable to route through the Pregel builder (the two forms are
# equivalence-tested; incremental/count-compressed modes always use Pregel).
KCORE_SPECIALIZED_LOOP = "spark.graphframes.kcore.specializedLoop"


def kcore_specialized_loop(spark: SparkSession) -> bool:
    return str(_get(spark, KCORE_SPECIALIZED_LOOP, "true")).lower() == "true"
