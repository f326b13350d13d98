"""Cohort retention, ordered funnel, and document chunking semantics."""

from datetime import datetime

from graphframes_rs_spark.pipeline.text import chunk_documents
from graphframes_rs_spark.streaming.events import cohort_retention, funnel


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def T(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


def test_cohort_retention_day(spark):
    df = _events(spark, [
        (1, "view", T(1)), (2, "view", T(1)),       # cohort day 1: {1,2}
        (1, "click", T(2)),                         # day-2: only user 1
        (3, "view", T(2)), (3, "view", T(3)),       # cohort day 2: {3}
    ])
    out = {
        (r.cohort, r.offset): r
        for r in cohort_retention(df, granularity="day").collect()
    }
    d1 = min(c for c, _ in out)
    assert out[(d1, 0)].n_active == 2 and out[(d1, 0)].retention_rate == 1.0
    assert out[(d1, 1)].n_active == 1 and out[(d1, 1)].retention_rate == 0.5
    assert out[(d1 + 1, 0)].cohort_size == 1
    assert out[(d1 + 1, 1)].n_active == 1


def test_funnel_strict_order_and_window(spark):
    df = _events(spark, [
        # u1 completes in order
        (1, "view", T(1, 9)), (1, "click", T(1, 10)), (1, "purchase", T(1, 11)),
        # u2 clicks BEFORE viewing: click must not count
        (2, "click", T(1, 8)), (2, "view", T(1, 9)),
        # u3 views only
        (3, "view", T(1, 9)),
    ])
    out = {r.step: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert out[1].n_users == 3
    assert out[2].n_users == 1 and out[2].step_name == "click"
    assert out[3].n_users == 1
    assert out[2].conversion == round(1 / 3, 6)

    # 30-minute window: u1's click at +1h falls outside it
    out_30 = {
        r.step: r
        for r in funnel(
            df, ["view", "click", "purchase"], window_seconds=1800
        ).collect()
    }
    assert out_30[2].n_users == 0 and out_30[3].n_users == 0
    # 2-hour window: the whole u1 sequence (view 9:00 .. purchase 11:00) fits
    out_2h = {
        r.step: r
        for r in funnel(
            df, ["view", "click", "purchase"], window_seconds=7200
        ).collect()
    }
    assert out_2h[2].n_users == 1 and out_2h[3].n_users == 1


def test_funnel_zero_step_row_present(spark):
    df = _events(spark, [(1, "view", T(1))])
    out = {r.step: r for r in funnel(df, ["view", "click"]).collect()}
    assert out[1].n_users == 1
    assert out[2].n_users == 0 and out[2].conversion == 0.0


def test_chunk_documents_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks, 2 chunks
            (2, " ".join(f"t{i}" for i in range(8))),   # exactly chunk size
            (3, "a b"),                                  # short: one chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=8, overlap=4)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert (1, 0) in rows and (1, 1) in rows and (1, 2) not in rows
    assert rows[(1, 0)].n_tokens == 8
    assert rows[(1, 0)].chunk_text.split()[:2] == ["t0", "t1"]
    # chunk 1 starts at stride=4
    assert rows[(1, 1)].chunk_text.split()[0] == "t4"
    assert rows[(1, 1)].n_tokens == 6  # tokens 4..9
    assert rows[(2, 0)].n_tokens == 8 and (2, 1) not in rows
    assert rows[(3, 0)].chunk_text == "a b"


def test_interval_join_grid_dedup_and_overlap(spark):
    from graphframes_rs_spark.pipeline.joins import interval_join

    left = spark.createDataFrame(
        [
            (1, 100, 0, 50),     # long interval spanning many cells
            (1, 101, 200, 210),
            (2, 102, 0, 10),     # other key: must not match key 1
        ],
        "key long, id long, start long, end long",
    )
    right = spark.createDataFrame(
        [
            (1, 900, 40, 60),    # overlaps 100 in several shared cells
            (1, 901, 205, 205),  # point inside 101
            (1, 902, 51, 60),    # touches nothing (100 ends at 50)
            (2, 903, 5, 6),      # inside 102
        ],
        "key long, id long, start long, end long",
    )
    out = interval_join(left, right, cell=10).collect()
    pairs = {(r.key, r.l_id, r.r_id): (r.overlap_start, r.overlap_end) for r in out}
    # each overlapping pair exactly once, despite multi-cell overlap
    assert len(out) == len(pairs) == 3
    assert pairs[(1, 100, 900)] == (40, 50)
    assert pairs[(1, 101, 901)] == (205, 205)
    assert pairs[(2, 102, 903)] == (5, 6)


def test_interval_join_closed_ends_and_degenerate(spark):
    from graphframes_rs_spark.pipeline.joins import interval_join

    left = spark.createDataFrame(
        [(1, 1, 0, 10), (1, 2, 30, 20)], "key long, id long, start long, end long"
    )  # id=2 is degenerate (end < start): dropped, never errors
    right = spark.createDataFrame(
        [(1, 9, 10, 15)], "key long, id long, start long, end long"
    )
    out = interval_join(left, right, cell=4).collect()
    assert len(out) == 1  # closed ends: [0,10] meets [10,15] at exactly 10
    assert (out[0].overlap_start, out[0].overlap_end) == (10, 10)


def test_scd2_intervals_chain(spark):
    from graphframes_rs_spark.pipeline.joins import scd2_intervals

    ch = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 20, "c"), (2, 5, "x")],
        "key long, ts long, val string",
    )
    out = scd2_intervals(ch, tiebreak_cols=("val",)).collect()
    rows = {(r.key, r.val): r for r in out}
    assert rows[(1, "a")].valid_from == 10 and rows[(1, "a")].valid_to == 20
    # same-ts versions chain deterministically by the tiebreaker
    assert rows[(1, "b")].valid_to == 20 and not rows[(1, "b")].is_current
    assert rows[(1, "c")].is_current
    assert rows[(2, "x")].is_current and rows[(2, "x")].valid_from == 5


def test_edit_distance_pairs_blocking_and_score(spark):
    from graphframes_rs_spark.pipeline.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),
            (2, "the quick brown fox leaps over"),   # same 4-token prefix
            (3, "the quick brown fox jumps over"),   # exact dup of 1
            (4, "a completely different document"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_a, r.doc_b): r for r in edit_distance_pairs(docs, prefix_tokens=4).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 3)].edit_distance == 0 and out[(1, 3)].similarity == 1.0
    assert out[(1, 2)].edit_distance == 3  # jumps -> leaps (3 subs)
    # max_distance filter
    capped = edit_distance_pairs(docs, prefix_tokens=4, max_distance=0).collect()
    assert {(r.doc_a, r.doc_b) for r in capped} == {(1, 3)}


def test_gapfill_locf_and_linear(spark):
    """Hand-checked grid: key 'a' observed at buckets 0 (v=2.0) and 3600*3
    (v=8.0); the two gap buckets carry locf=2.0 / linear=4.0, 6.0."""
    from graphframes_rs_spark.streaming.events import time_bucket_gapfill

    rows = [
        ("a", "2024-01-01 00:10:00", 2.0),
        ("a", "2024-01-01 03:20:00", 8.0),
        ("b", "2024-01-01 01:00:00", 5.0),
    ]
    events = spark.createDataFrame(
        rows, "event_type string, ts_s string, value double"
    ).selectExpr("event_type", "CAST(ts_s AS TIMESTAMP) AS ts", "value")

    locf = {
        (r["event_type"], r["bucket_epoch"]): (r["value"], r["is_gap"])
        for r in time_bucket_gapfill(events, 3600, method="locf").collect()
    }
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert locf[("a", base)] == (2.0, False)
    assert locf[("a", base + 3600)] == (2.0, True)
    assert locf[("a", base + 7200)] == (2.0, True)
    assert locf[("a", base + 10800)] == (8.0, False)
    assert locf[("b", base + 3600)] == (5.0, False)
    assert len(locf) == 5

    lin = {
        (r["event_type"], r["bucket_epoch"]): (r["value"], r["is_gap"])
        for r in time_bucket_gapfill(events, 3600, method="linear").collect()
    }
    assert lin[("a", base + 3600)] == (4.0, True)
    assert lin[("a", base + 7200)] == (6.0, True)
    assert lin[("a", base + 10800)] == (8.0, False)


def test_gapfill_trailing_gap_falls_back_to_locf(spark):
    """A gap with no following observation (possible only when the grid is
    later widened / unioned) — here simulated via avg of duplicate rows —
    plus the NULL-free guarantee over the bounded grid."""
    from graphframes_rs_spark.streaming.events import time_bucket_gapfill

    rows = [("a", "2024-01-01 00:00:00", 1.0), ("a", "2024-01-01 00:30:00", 3.0)]
    events = spark.createDataFrame(
        rows, "event_type string, ts_s string, value double"
    ).selectExpr("event_type", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
    out = time_bucket_gapfill(events, 3600, method="linear").collect()
    # both rows land in one bucket: avg = 2.0, single-row grid, no gaps
    assert [(r["value"], r["is_gap"]) for r in out] == [(2.0, False)]


def test_ab_test_welch_hand_computed(spark):
    """Arm A = even user_id {2: values 1,2,3}, arm B = odd {1: 5,7}.
    mean_a=2, var_a=1, mean_b=6, var_b=2; t = -4/sqrt(1/3 + 1) ≈ -3.464102;
    dof = (4/3)^2 / ((1/9)/2 + 1) = 32/19 ≈ 1.684211."""
    import datetime

    from graphframes_rs_spark.streaming import events as ev

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, ts, 2, "click", 1.0, "{}"),
        (2, ts, 2, "click", 2.0, "{}"),
        (3, ts, 2, "click", 3.0, "{}"),
        (4, ts, 1, "click", 5.0, "{}"),
        (5, ts, 1, "click", 7.0, "{}"),
        (6, ts, 4, "view", 1.0, "{}"),  # view: only one arm -> dropped
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = ev.ab_test_welch(events).collect()
    assert len(out) == 1
    r = out[0]
    assert r["segment"] == "click"
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert (r["mean_a"], r["mean_b"]) == (2.0, 6.0)
    assert (r["var_a"], r["var_b"]) == (1.0, 2.0)
    assert abs(r["t_stat"] - (-3.464102)) < 1e-6
    assert abs(r["dof"] - 32.0 / 19.0) < 1e-6


def test_ab_test_welch_zero_variance_segment_nulled(spark):
    """Both arms all-constant: the Welch statistic is undefined (0/0).
    The row survives with t_stat/dof NULL instead of Inf/NaN — keeping
    engine-agnostic (and DuckDB-oracle-stable) semantics."""
    import datetime

    from graphframes_rs_spark.streaming import events as ev

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, ts, 2, "flat", 3.0, "{}"),
        (2, ts, 4, "flat", 3.0, "{}"),
        (3, ts, 1, "flat", 3.0, "{}"),
        (4, ts, 3, "flat", 3.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = ev.ab_test_welch(events).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert (r["mean_a"], r["mean_b"]) == (3.0, 3.0)
    assert (r["var_a"], r["var_b"]) == (0.0, 0.0)
    assert r["t_stat"] is None and r["dof"] is None


def test_rfm_features_hand_computed(spark):
    """u1: events on day 1 and day 3 (values 10, 20); u2: one event day 4.
    Corpus max = day 4 -> recency u1 = 1 day, u2 = 0; freq 2 vs 1;
    monetary 30 vs 5. With n_bins=2: r_score u2=1 (most recent),
    f/m score u1=1 (most active / highest spend)."""
    import datetime

    from graphframes_rs_spark.streaming import events as ev

    d = lambda day: datetime.datetime(2024, 1, day)
    rows = [
        (1, d(1), 1, "buy", 10.0, "{}"),
        (2, d(3), 1, "buy", 20.0, "{}"),
        (3, d(4), 2, "buy", 5.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["user_id"]: r for r in ev.rfm_features(events, n_bins=2).collect()}
    assert out[1]["recency_days"] == 1 and out[2]["recency_days"] == 0
    assert out[1]["frequency"] == 2 and out[2]["frequency"] == 1
    assert out[1]["monetary"] == 30.0 and out[2]["monetary"] == 5.0
    assert out[2]["r_score"] == 1 and out[1]["r_score"] == 2
    assert out[1]["f_score"] == 1 and out[2]["f_score"] == 2
    assert out[1]["m_score"] == 1 and out[2]["m_score"] == 2
