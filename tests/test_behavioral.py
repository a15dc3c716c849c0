"""Behavioral analytics (operators/behavioral.py): funnel ordering
semantics, cohort retention, Markov transition matrix."""

from __future__ import annotations

import pytest

from sync_cosmos_db_spark.operators.behavioral import (cohort_retention,
                                                       funnel_counts,
                                                       funnel_times,
                                                       transition_matrix)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")


import datetime as dt  # noqa: E402

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes A→B→C in order
        (1, _t(0), 1, "A"), (2, _t(1), 1, "B"), (3, _t(2), 1, "C"),
        # u2 does B before A and never after → stops at A
        (4, _t(0), 2, "B"), (5, _t(1), 2, "A"),
        # u3 does A and C but no B → stops at A (C without B ignored)
        (6, _t(0), 3, "A"), (7, _t(1), 3, "C"),
        # u4 never does A → not in funnel at all
        (8, _t(0), 4, "B"), (9, _t(1), 4, "C"),
    ]
    got = {r.step_name: r.n_users
           for r in funnel_counts(_ev(spark, rows),
                                  ["A", "B", "C"]).collect()}
    assert got == {"A": 3, "B": 1, "C": 1}


def test_funnel_simultaneous_events_do_not_advance(spark):
    rows = [(1, _t(0), 1, "A"), (2, _t(0), 1, "B")]  # same timestamp
    got = {r.step_name: r.n_users
           for r in funnel_counts(_ev(spark, rows), ["A", "B"]).collect()}
    assert got == {"A": 1, "B": 0}


def test_funnel_times_reports_earliest_qualifying(spark):
    rows = [
        (1, _t(0), 1, "A"),
        (2, _t(1), 1, "B"), (3, _t(5), 1, "B"),  # first B after A wins
    ]
    row = funnel_times(_ev(spark, rows), ["A", "B"]).collect()[0]
    assert row.t0 == _t(0) and row.t1 == _t(1)


def test_funnel_empty_steps_raises(spark):
    with pytest.raises(ValueError):
        funnel_times(_ev(spark, []), [])


def test_cohort_retention_offsets(spark):
    rows = [
        # u1 first active week of Jan 1 (Mon), returns 2 weeks later
        (1, dt.datetime(2024, 1, 2), 1, "A"),
        (2, dt.datetime(2024, 1, 16), 1, "A"),
        # u2 first active week of Jan 8, active twice that week
        (3, dt.datetime(2024, 1, 8), 2, "A"),
        (4, dt.datetime(2024, 1, 10), 2, "A"),
    ]
    got = {(r.cohort_week_s, r.week_offset): r.n_users
           for r in cohort_retention(_ev(spark, rows)).collect()}
    w1 = int(dt.datetime(2024, 1, 1).timestamp())
    w2 = int(dt.datetime(2024, 1, 8).timestamp())
    assert got == {(w1, 0): 1, (w1, 2): 1, (w2, 0): 1}


def test_transition_matrix_counts_and_rownorm(spark):
    rows = [
        (1, _t(0), 1, "A"), (2, _t(1), 1, "B"), (3, _t(2), 1, "A"),
        (4, _t(3), 1, "B"),
        (5, _t(0), 2, "A"), (6, _t(1), 2, "A"),
    ]
    got = {(r.from_type, r.to_type): (r.n, r.p)
           for r in transition_matrix(_ev(spark, rows)).collect()}
    # u1: A→B, B→A, A→B; u2: A→A. From A: {B: 2, A: 1}; from B: {A: 1}.
    assert got[("A", "B")] == (2, 0.666667)
    assert got[("A", "A")] == (1, 0.333333)
    assert got[("B", "A")] == (1, 1.0)
    # no cross-user transitions
    assert len(got) == 3


def test_transition_matrix_tiebreak_on_event_id(spark):
    # same ts: order falls back to event_id, so A(1)→B(2) deterministic
    rows = [(1, _t(0), 1, "A"), (2, _t(0), 1, "B")]
    got = [(r.from_type, r.to_type)
           for r in transition_matrix(_ev(spark, rows)).collect()]
    assert got == [("A", "B")]


def test_sessionize_gap_boundary_is_strict(spark):
    from sync_cosmos_db_spark.operators.behavioral import sessionize

    rows = [
        (1, _t(0), 1, "A"),
        (2, _t(30), 1, "A"),      # exactly 30 min gap → SAME session
        (3, _t(61), 1, "A"),      # 31 min gap → new session
        (4, _t(0), 2, "A"),       # second user independent
    ]
    s = {r.event_id: r.session_idx
         for r in sessionize(_ev(spark, rows), gap_seconds=1800).collect()}
    assert s == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_preserves_rows_and_columns(spark):
    from sync_cosmos_db_spark.operators.behavioral import sessionize

    rows = [(1, _t(0), 1, "A"), (2, _t(100), 1, "B")]
    out = sessionize(_ev(spark, rows), gap_seconds=60)
    assert out.count() == 2
    assert set(out.columns) == {"event_id", "ts", "user_id",
                                "event_type", "session_idx"}
