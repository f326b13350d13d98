"""Event-stream operators: windowed aggregation and sessionization.

Each operator has two faces sharing one set of expressions:

* a **batch** face (DataFrame in, DataFrame out) — used by the oracle
  correctness gate and by backfills;
* a **streaming** face (``readStream`` source in) — Structured Streaming
  with watermarks for late data, suitable for ``writeStream`` sinks.

Sessionization: the batch face uses the classic lag/cumsum window trick
(new session when the gap to the previous event exceeds the timeout); the
streaming face uses ``session_window`` (Spark's native session windows,
watermark-aware). Both define a session identically: maximal run of events
per user with inter-event gap <= timeout.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """[window_start, <key>, n_events, total_value] per tumbling window."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "total_value")
    )


def streaming_tumbling_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Streaming face of :func:`tumbling_counts`, watermarked for late data.
    Append-mode compatible: a window finalizes once the watermark passes."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "total_value")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """[user_id, session_id, session_start, session_end, n_events]
    (batch face). session_id numbers a user's sessions from 1 in time
    order — the lag/cumsum formulation, one shuffle on user_id."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_sec = gap_minutes * 60
    with_flag = events.select(
        user_col,
        ts_col,
        F.when(
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.lag(ts_col).over(w))
            > gap_sec,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_sid = with_flag.withColumn(
        "session_id", F.sum("new_session").over(w) + 1
    )
    return with_sid.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def streaming_sessionize(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming face via native session windows (watermark-aware).
    [user_id, session_start, session_end, n_events]"""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_user_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    timeout_minutes: int = 0,
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    a per-user running profile maintained across micro-batches —
    [user_id, n_events, total_value, max_value, last_ts_epoch].

    This is the escape hatch for stateful logic Spark's built-in windowed
    aggregations can't express (arbitrary per-key state machines). State is
    one tuple per user in the state store; each micro-batch's rows arrive
    as Arrow batches per key group, the state tuple is read, folded, and
    written back. ``timeout_minutes`` > 0 evicts idle users via processing-
    time timeout (the state-store size dial for unbounded key spaces —
    at 100 TB/day of events you either time out idle keys or grow forever).

    Column contract: ``value_col`` must be numeric; ``ts_col`` may be a
    TIMESTAMP (folded to epoch seconds) or an integral epoch-seconds
    column (used as-is — the fold branches on the Arrow dtype).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes > 0
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total, mx, last = (
            state.get if state.exists else (0, 0.0, float("-inf"), 0)
        )
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf[value_col].sum())
            mx = max(mx, float(pdf[value_col].max()))
            ts = pdf[ts_col]
            if str(ts.dtype).startswith("datetime64"):
                last = max(last, int(ts.astype("int64").max() // 10**9))
            else:  # integral column: already epoch seconds
                last = max(last, int(ts.astype("int64").max()))
        state.update((n, total, mx, last))
        if timeout_minutes > 0:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "max_value": [mx],
                "last_ts_epoch": [last],
            }
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, n_events long, total_value double, "
            "max_value double, last_ts_epoch long"
        ),
        stateStructType="n long, total double, mx double, last long",
        outputMode="update",
        timeoutConf=timeout,
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """[from_type, to_type, n, prob] — the user-journey Markov matrix:
    for each user's time-ordered event stream, count consecutive
    (event_type -> next event_type) transitions and normalize per source
    type. The standard funnel/journey primitive.

    Scale design: ONE window shuffle partitioned by user (per-partition
    work is each user's own history, never corpus-sized) feeding a
    combine-enabled groupBy; the per-source normalizer joins back on the
    tiny type-cardinality frame. Equal timestamps are ordered by
    ``tiebreak_col`` so the matrix is deterministic under any
    partitioning."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__t"))
    return (
        counts.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("__t"), 6).alias("prob"),
        )
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    item_col: str = "event_type",
    capacity: int = 8,
    num_shards: int = 4,
) -> DataFrame:
    """Bounded-state streaming heavy hitters: sharded Misra–Gries
    summaries via ``applyInPandasWithState`` — [shard, item, est_count].

    Items are hash-sharded, so each item's FULL stream lives in exactly
    one shard and each shard maintains an MG summary of at most
    ``capacity`` (item, count) pairs — total state is
    ``num_shards * capacity`` tuples NO MATTER how many distinct items
    the stream carries, the property that makes global top-k affordable
    on an unbounded stream (an exact streaming groupBy count grows state
    with the key cardinality). Each micro-batch is pre-counted
    vectorized (``value_counts``) and merged with the classic mergeable-
    summaries step: add counts, then subtract the (capacity+1)-th
    largest and drop non-positives. Standard MG guarantee per shard:
    every item with true count > shard_stream_length / (capacity + 1)
    is retained, and estimates undercount by at most that ratio.

    Update-mode output re-emits a shard's current summary each batch
    that touches it; downstream takes the last emission per (shard,
    item). Scale dials: ``num_shards`` spreads state/CPU across
    executors, ``capacity`` trades memory for estimate accuracy."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = stream.select(
        F.col(item_col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(num_shards))
        .alias("shard"),
    )

    def update(key, pdfs, state: GroupState):
        items, counts = state.get if state.exists else ([], [])
        mg = dict(zip(items, counts))
        for pdf in pdfs:
            for it, c in pdf["item"].value_counts().items():
                mg[it] = mg.get(it, 0) + int(c)
        if len(mg) > capacity:
            cut = sorted(mg.values(), reverse=True)[capacity]
            mg = {k: v - cut for k, v in mg.items() if v - cut > 0}
        state.update((list(mg.keys()), [int(v) for v in mg.values()]))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(mg),
                "item": list(mg.keys()),
                "est_count": [int(v) for v in mg.values()],
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="shard long, item string, est_count long",
        stateStructType="items array<string>, counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_join(
    events: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    horizon_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """[user_id, trigger_id, outcome_id, trigger_ts, outcome_ts, lag_seconds]
    — every (trigger, outcome) pair for the same user where the outcome
    lands in ``(trigger_ts, trigger_ts + horizon]`` (batch face). The
    classic conversion-attribution interval join (click -> purchase within
    30 minutes); downstream policies (first-touch, last-touch) are one
    window over this pair stream.

    One equi-join on ``user_id`` with the range predicate pushed into the
    join condition — at 100 TB both sides shuffle once on the user key and
    the per-user range check never leaves the join operator."""
    trig = events.filter(F.col("event_type") == trigger_type).select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("trigger_id"),
        F.col(ts_col).alias("trigger_ts"),
    )
    outc = events.filter(F.col("event_type") == outcome_type).select(
        F.col(user_col).alias("user_id"),
        F.col("event_id").alias("outcome_id"),
        F.col(ts_col).alias("outcome_ts"),
    )
    horizon = F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES")
    return (
        trig.join(outc, "user_id")
        .filter(
            (F.col("outcome_ts") > F.col("trigger_ts"))
            & (F.col("outcome_ts") <= F.col("trigger_ts") + horizon)
        )
        .select(
            "user_id",
            "trigger_id",
            "outcome_id",
            "trigger_ts",
            "outcome_ts",
            (
                F.unix_timestamp("outcome_ts") - F.unix_timestamp("trigger_ts")
            ).alias("lag_seconds"),
        )
    )


def streaming_attribution_join(
    stream: DataFrame,
    trigger_type: str = "click",
    outcome_type: str = "purchase",
    horizon_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming face: a watermarked stream-stream interval join — Spark
    buffers each side's state only within the watermark + horizon bound,
    so state is O(events in the horizon window), not O(stream). Both
    sides MUST carry a watermark and the join condition MUST bound
    outcome_ts relative to trigger_ts for state eviction to kick in
    (Structured Streaming's inner-join requirement)."""
    trig = (
        stream.filter(F.col("event_type") == trigger_type)
        .select(
            F.col(user_col).alias("user_id"),
            F.col("event_id").alias("trigger_id"),
            F.col(ts_col).alias("trigger_ts"),
        )
        .withWatermark("trigger_ts", watermark)
    )
    outc = (
        stream.filter(F.col("event_type") == outcome_type)
        .select(
            F.col(user_col).alias("o_user_id"),
            F.col("event_id").alias("outcome_id"),
            F.col(ts_col).alias("outcome_ts"),
        )
        .withWatermark("outcome_ts", watermark)
    )
    return trig.join(
        outc,
        F.expr(
            f"""
            user_id = o_user_id AND
            outcome_ts > trigger_ts AND
            outcome_ts <= trigger_ts + INTERVAL {int(horizon_minutes)} MINUTES
            """
        ),
    ).select(
        "user_id",
        "trigger_id",
        "outcome_id",
        "trigger_ts",
        "outcome_ts",
        (
            F.unix_timestamp("outcome_ts") - F.unix_timestamp("trigger_ts")
        ).alias("lag_seconds"),
    )


def sliding_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """[window_start, <key>, n_events, total_value] per SLIDING window
    (batch face): each event lands in duration/slide overlapping windows
    — the standard trailing-window rate/monitoring aggregate. Spark's
    ``window(ts, duration, slide)`` expands the row to its windows
    map-side; the shuffle is one combine-enabled aggregation on
    (window, key), so the overlap factor inflates pre-combine rows, not
    shuffled groups."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def streaming_sliding_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Streaming face of :func:`sliding_counts`, watermarked: a window
    finalizes (append mode) once the watermark passes its end; state is
    bounded by windows-in-flight x keys."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration, slide).alias("w"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


ROLLUP_RESOLUTIONS = (900, 3600, 86400)  # 15 min -> 1 h -> 1 day


def hypertable_rollup(
    events: DataFrame,
    resolutions: tuple = ROLLUP_RESOLUTIONS,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """[resolution_s, window_start_epoch, <key>, n_events, total_value,
    min_value, max_value] — a TimescaleDB-style continuous-aggregate
    hierarchy: the finest level aggregates the raw events ONCE; every
    coarser level re-aggregates the PREVIOUS level (counts/sums add,
    mins/maxes combine), never the raw data. At 100 TB that's the whole
    point: the day rollup reads |15-min buckets| rows, not |events| —
    the raw scan happens exactly once regardless of how many levels the
    hierarchy has.

    ``resolutions`` must be increasing and each a multiple of the last
    (buckets nest), seconds-granularity."""
    if len(resolutions) < 1:
        raise ValueError("need at least one resolution")
    for a, b in zip(resolutions, resolutions[1:]):
        if b % a != 0 or b <= a:
            raise ValueError(
                "resolutions must be increasing and nested (each a "
                f"multiple of the previous): {resolutions}"
            )

    def bucket(col, res):
        return (F.floor(F.col(col) / res) * res).cast("long")

    finest = resolutions[0]
    level = (
        events.select(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / finest) * finest)
            .cast("long")
            .alias("window_start_epoch"),
            F.col(key_col),
            F.col("value"),
        )
        .groupBy("window_start_epoch", key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("__sum"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    out = level.select(
        F.lit(finest).alias("resolution_s"),
        "window_start_epoch",
        key_col,
        "n_events",
        F.round("__sum", 6).alias("total_value"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )
    for res in resolutions[1:]:
        level = (
            level.select(
                bucket("window_start_epoch", res).alias("window_start_epoch"),
                key_col,
                "n_events",
                "__sum",
                "min_value",
                "max_value",
            )
            .groupBy("window_start_epoch", key_col)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("__sum").alias("__sum"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        out = out.unionByName(
            level.select(
                F.lit(res).alias("resolution_s"),
                "window_start_epoch",
                key_col,
                "n_events",
                F.round("__sum", 6).alias("total_value"),
                F.round("min_value", 6).alias("min_value"),
                F.round("max_value", 6).alias("max_value"),
            )
        )
    return out


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    granularity: str = "day",
) -> DataFrame:
    """[cohort, offset, n_active, cohort_size, retention_rate] — classic
    cohort retention: users are bucketed by the time bucket of their FIRST
    event (their cohort), then each (cohort, later bucket) cell counts how
    many of them were active, as an offset from the cohort bucket.
    ``granularity``: 'day' or 'hour'.

    Scale shape: two combine-enabled aggregations keyed on user_id (first
    bucket per user; distinct user per cell via the pre-distinct) and one
    broadcast-sized join on the cohort dimension — no windows, no skew
    beyond the user key AQE already handles. Offsets count buckets, so
    the output is dense-small (cohorts × offsets) no matter the event
    volume."""
    if granularity not in ("day", "hour"):
        raise ValueError("granularity must be 'day' or 'hour'")
    secs = 86400 if granularity == "day" else 3600
    bucket = (F.unix_timestamp(F.col(ts_col)) / secs).cast("long")
    per_event = events.select(
        F.col(user_col).alias("u"), bucket.alias("b")
    ).distinct()
    cohorts = per_event.groupBy("u").agg(F.min("b").alias("cohort_b"))
    sizes = cohorts.groupBy("cohort_b").agg(
        F.countDistinct("u").alias("cohort_size")
    )
    cells = (
        per_event.join(cohorts, "u")
        .groupBy("cohort_b", "b")
        .agg(F.countDistinct("u").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_b")
        .select(
            F.col("cohort_b").alias("cohort"),
            (F.col("b") - F.col("cohort_b")).alias("offset"),
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size"), 6
            ).alias("retention_rate"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    window_seconds: int | None = None,
) -> DataFrame:
    """[step, step_name, n_users, conversion] — ordered funnel analysis
    (ClickHouse windowFunnel semantics): a user converts step i when an
    event of type ``steps[i]`` occurs STRICTLY AFTER their earliest
    qualifying step-(i-1) event; with ``window_seconds`` the whole
    sequence must also complete within that window of the step-1 event.
    Earliest-qualifying times make the result deterministic and
    monotone (n_users never increases with step).

    Scale shape: one conditional min-aggregation per step, each keyed on
    user_id with map-side combine, chained by broadcast-free equi-joins
    on the same key — k small (funnels are 3-7 steps), so this is k
    shuffles of one row per user, not an event-order window over the
    raw stream."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    )
    reached = (
        ev.filter(F.col("t") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t1"))
    )
    times = [("t1", reached.select("u", "t1"))]
    prev = reached.select("u", F.col("t1").alias("prev"), "t1")
    for i, s in enumerate(steps[1:], start=2):
        cand = ev.filter(F.col("t") == s).join(prev, "u")
        cond = F.col("ts") > F.col("prev")
        if window_seconds is not None:
            cond = cond & (
                F.col("ts") <= F.col("t1") + F.expr(f"INTERVAL {window_seconds} SECONDS")
            )
        step_t = (
            cand.filter(cond)
            .groupBy("u")
            .agg(F.min("ts").alias(f"t{i}"), F.first("t1").alias("__t1"))
        )
        times.append((f"t{i}", step_t.select("u", f"t{i}")))
        prev = step_t.select(
            "u", F.col(f"t{i}").alias("prev"), F.col("__t1").alias("t1")
        )
    counts = None
    for i, (_, df) in enumerate(times, start=1):
        # agg without groupBy: always ONE row, so zero-user steps still
        # appear in the funnel
        c = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"),
            F.lit(steps[i - 1]).alias("step_name"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    base = F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(
        Window.partitionBy()
    )
    return counts.select(
        "step",
        "step_name",
        "n_users",
        F.round(
            F.col("n_users") / F.greatest(base, F.lit(1)), 6
        ).alias("conversion"),
    )


def hourly_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: Optional[str] = None,
    trailing: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """[event_type, window_start_epoch, n_events, z, is_anomaly] — per-type
    hourly metric scored against its own trailing ``trailing``-hour
    mean/stddev (frame ends at the PREVIOUS hour, so the scored point
    never contaminates its own baseline). The metric is the hourly event
    COUNT by default; pass ``value_col`` to score ``sum(value_col)`` per
    hour instead (volume anomalies rather than rate anomalies — the
    column is still named ``n_events`` so downstream schemas are stable).

    .. versionchanged:: round 6
       ``value_col`` used to be accepted but IGNORED (the body always
       counted, default ``"value"``). It now actually switches the metric
       to ``sum(value_col)`` and defaults to ``None`` (count mode) — a
       caller that explicitly passed ``value_col="value"`` under the old
       signature was silently getting counts and now gets sums; drop the
       argument to keep the old behavior.
    z is NULL for the warm-up hours (frame shorter than 2 points or zero
    variance); the monitoring-table query every event pipeline ends up
    needing.

    Scale shape: one combine-enabled (type, hour) aggregate, then a window
    partitioned BY EVENT TYPE ordered by hour — each partition holds one
    type's hourly series (bounded: hours elapsed, not events), and the
    trailing frame is O(1) incremental per row."""
    from pyspark.sql.window import Window

    metric = (
        F.count(F.lit(1))
        if value_col is None
        else F.sum(F.col(value_col).cast("double"))
    )
    hourly = (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("h"),
        )
        .agg(metric.alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-trailing, -1)
    )
    mean = F.avg(F.col("n_events").cast("double")).over(w)
    sd = F.stddev_samp(F.col("n_events").cast("double")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    z = F.when(
        (cnt >= 2) & (sd > 0), F.round((F.col("n_events") - mean) / sd, 6)
    )
    return hourly.select(
        "event_type",
        F.col("h").cast("long").alias("window_start_epoch"),
        "n_events",
        z.alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def time_bucket_gapfill(
    events: DataFrame,
    bucket_s: int = 3600,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    method: str = "locf",
) -> DataFrame:
    """[<key>, bucket_epoch, value, is_gap] — a TimescaleDB-style
    ``time_bucket_gapfill``: per key, the regular ``bucket_s``-second grid
    from the key's first observed bucket to its last, with the observed
    buckets carrying ``avg(value_col)`` and the missing ones synthesized
    and filled by ``method``:

    * ``"locf"`` — carry the last observed bucket's value forward;
    * ``"linear"`` — interpolate between the surrounding observed buckets
      (trailing gaps, which have no next observation, fall back to locf).

    The grid is bounded by observation (first..last bucket per key), so a
    key's leading bucket is always observed — no leading-NULL case exists
    and the output is NULL-free by construction.

    Scale shape: one combine-enabled (key, bucket) aggregate over the raw
    events, then per-key work bounded by TIMELINE length (buckets elapsed,
    not event count): the grid is a ``sequence()`` explode off the per-key
    min/max span, and the fills are IGNORE-NULLS window lookups over the
    key's own grid partition. At 100 TB of events the only full-size pass
    is the first aggregate; everything after is |keys| x |buckets|."""
    if method not in ("locf", "linear"):
        raise ValueError(f"unknown gapfill method {method!r}")
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_s) * bucket_s
    ).cast("long")
    observed = (
        events.select(F.col(key_col), bucket.alias("bucket_epoch"),
                      F.col(value_col).alias("__v"))
        .groupBy(key_col, "bucket_epoch")
        .agg(F.avg("__v").alias("__v"))
    )
    grid = (
        observed.groupBy(key_col)
        .agg(F.min("bucket_epoch").alias("__lo"), F.max("bucket_epoch").alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(bucket_s))
            ).alias("bucket_epoch"),
        )
    )
    joined = grid.join(observed, [key_col, "bucket_epoch"], "left")
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy("bucket_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_v = F.last("__v", ignorenulls=True).over(w_prev)
    if method == "locf":
        filled = prev_v
    else:
        w_next = (
            Window.partitionBy(key_col)
            .orderBy("bucket_epoch")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        obs_t = F.when(F.col("__v").isNotNull(), F.col("bucket_epoch"))
        prev_t = F.last(obs_t, ignorenulls=True).over(w_prev)
        next_v = F.first("__v", ignorenulls=True).over(w_next)
        next_t = F.first(obs_t, ignorenulls=True).over(w_next)
        filled = F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
            F.when(next_t.isNull(), prev_v).otherwise(
                prev_v
                + (next_v - prev_v)
                * (F.col("bucket_epoch") - prev_t)
                / (next_t - prev_t)
            )
        )
    return joined.select(
        key_col,
        "bucket_epoch",
        F.round(filled, 6).alias("value"),
        F.col("__v").isNull().alias("is_gap"),
    )


def ewma_counts(
    events: DataFrame,
    alpha: float = 0.3,
    bucket_s: int = 3600,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """[<key>, bucket_epoch, n_events, ewma] — exponentially weighted
    moving average of the per-bucket event count over each key's observed
    buckets in time order, the standard smoothed-rate series behind
    alerting baselines:

        y_0 = x_0;   y_t = alpha * x_t + (1 - alpha) * y_{t-1}

    The recursion runs JVM-side as a higher-order ``aggregate`` fold over
    the key's time-sorted (bucket, count) array — no Python worker, no
    per-row UDF. The fold evaluates ``alpha * x + (1 - alpha) * prev``
    with exactly that operand order, so an oracle replaying the identical
    IEEE-754 expression (e.g. a DuckDB recursive CTE) reproduces the
    doubles bit-for-bit; inputs are integer counts, so there is no
    upstream float-summation ambiguity either.

    Scale shape: one combine-enabled (key, bucket) count over the raw
    events is the only full-size pass; the fold's state is bounded by
    TIMELINE length per key (buckets elapsed, not event count), the same
    contract as :func:`time_bucket_gapfill`. The growing-accumulator
    concat is O(T^2) element copies per key — fine for the
    years-of-hourly-buckets regime (T ~ 1e4); for longer series lower the
    resolution or split the timeline."""
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_s) * bucket_s
    ).cast("long")
    observed = (
        events.select(F.col(key_col), bucket.alias("bucket_epoch"))
        .groupBy(key_col, "bucket_epoch")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    packed = observed.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(F.struct("bucket_epoch", "n_events"))
        ).alias("__s")
    )
    a = F.lit(float(alpha))
    b = F.lit(float(1.0 - alpha))
    folded = packed.withColumn(
        "__e",
        F.aggregate(
            "__s",
            F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.when(
                        F.size(acc) == 0, x["n_events"].cast("double")
                    ).otherwise(
                        a * x["n_events"].cast("double")
                        + b * F.element_at(acc, -1)
                    )
                ),
            ),
        ),
    )
    pair = F.posexplode(F.arrays_zip("__s", "__e"))
    return folded.select(F.col(key_col), pair.alias("__i", "__z")).select(
        key_col,
        F.col("__z.__s.bucket_epoch").alias("bucket_epoch"),
        F.col("__z.__s.n_events").alias("n_events"),
        F.round(F.col("__z.__e"), 6).alias("ewma"),
    )


def ab_test_welch(
    events: DataFrame,
    metric_col: str = "value",
    unit_col: str = "user_id",
    segment_col: str = "event_type",
) -> DataFrame:
    """[segment, n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat, dof] —
    per-segment Welch's unequal-variance t-test between two experiment
    arms, the experimentation-platform readout. Arm assignment is the
    standard deterministic unit hash (here: ``unit_col % 2`` — swap in
    ``hash60`` bucketing for salted production assignment); segments with
    fewer than 2 observations per arm are dropped (variance undefined).

    t = (mean_a − mean_b) / sqrt(var_a/n_a + var_b/n_b); dof via
    Welch–Satterthwaite. Variances are SAMPLE variances computed from
    (Σx, Σx², n) so both engines evaluate the same closed form; all
    floats are rounded to 6 places in the output.

    Scale shape: ONE combine-enabled groupBy(segment, arm) over the raw
    events (sums, never a per-unit materialization), then the per-segment
    pivot is a |segments|-row self-join — nothing downstream of the first
    aggregate scales with |events|. This is the textbook map-side-partial
    pattern: at 100 TB the only full-data pass is the partial-aggregated
    scan."""
    arm = (F.col(unit_col) % 2 == 0).alias("__arm_a")
    agg = (
        events.select(
            F.col(segment_col).alias("segment"),
            arm,
            F.col(metric_col).cast("double").alias("__x"),
        )
        .groupBy("segment", "__arm_a")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("s1"),
            F.sum(F.col("__x") * F.col("__x")).alias("s2"),
        )
    )
    a = agg.filter(F.col("__arm_a")).select(
        "segment",
        F.col("n").alias("n_a"),
        F.col("s1").alias("s1_a"),
        F.col("s2").alias("s2_a"),
    )
    b = agg.filter(~F.col("__arm_a")).select(
        "segment",
        F.col("n").alias("n_b"),
        F.col("s1").alias("s1_b"),
        F.col("s2").alias("s2_b"),
    )
    j = a.join(b, "segment").filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
    mean_a = F.col("s1_a") / F.col("n_a")
    mean_b = F.col("s1_b") / F.col("n_b")
    var_a = (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    se2_a = var_a / F.col("n_a")
    se2_b = var_b / F.col("n_b")
    # degenerate segment: both arms all-constant -> se2 sum is 0 and the
    # Welch statistic is undefined (double semantics would emit Inf/NaN,
    # which engines disagree on); null the statistic, keep the row
    defined = (se2_a + se2_b) > 0
    t_stat = F.when(defined, (mean_a - mean_b) / F.sqrt(se2_a + se2_b))
    dof = F.when(
        defined,
        (se2_a + se2_b) * (se2_a + se2_b) / (
            se2_a * se2_a / (F.col("n_a") - 1)
            + se2_b * se2_b / (F.col("n_b") - 1)
        ),
    )
    return j.select(
        "segment",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(var_a, 6).alias("var_a"),
        F.round(var_b, 6).alias("var_b"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
    )


def rfm_features(
    events: DataFrame,
    ts_col: str = "ts",
    unit_col: str = "user_id",
    value_col: str = "value",
    n_bins: int = 5,
) -> DataFrame:
    """[user_id, recency_days, frequency, monetary, r_score, f_score,
    m_score] — the classic RFM feature block (recency / frequency /
    monetary) every churn / LTV / segmentation model starts from.
    Recency is whole days from the user's last event to the corpus max
    timestamp (deterministic — no wall clock); scores are ``ntile``
    quantile bins (1..n_bins; r_score bins recency ASCENDING so 1 = most
    recent, f/m bin descending so 1 = most active / highest spend —
    ntile ties resolve by the deterministic (metric, user_id) order).

    Scale shape: one combine-enabled groupBy(user) over raw events, a
    broadcast 1-row corpus-max join, then three ntile windows over the
    |users| frame. Unpartitioned ntile is a single-task sort of |users|
    rows — the per-user frame is orders of magnitude smaller than the
    event log (the thing that actually scales); shard the window by a
    coarse segment column if |users| alone outgrows one task."""
    per_user = events.groupBy(F.col(unit_col).alias("user_id")).agg(
        F.max(F.col(ts_col)).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(F.col(value_col)), 6).alias("monetary"),
    )
    corpus_max = events.agg(F.max(F.col(ts_col)).alias("__cmax"))
    feats = per_user.crossJoin(F.broadcast(corpus_max)).select(
        "user_id",
        F.datediff(F.col("__cmax"), F.col("__last"))
        .cast("long")
        .alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("user_id"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    w_m = Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    return feats.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_bins).over(w_r).cast("long").alias("r_score"),
        F.ntile(n_bins).over(w_f).cast("long").alias("f_score"),
        F.ntile(n_bins).over(w_m).cast("long").alias("m_score"),
    )
