"""Ground-truth unit tests for round-7 batch-7 families X195-X198."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# X195 — nearest-direction as-of join
# ---------------------------------------------------------------------------

def test_nearest_asof_picks_closer_direction(spark):
    """Left at t=100 with rights at 90 and 103 → forward (103, gap
    3); left at t=200 with rights at 199 and 250 → backward."""
    from sync_cosmos_db_spark.operators.temporal import (
        nearest_asof_join,
    )

    left = spark.createDataFrame(
        [("e1", "u", 100), ("e2", "u", 200)],
        "id string, k string, lt long")
    right = spark.createDataFrame(
        [("u", 90, 9.0), ("u", 103, 1.0), ("u", 199, 5.0),
         ("u", 250, 7.0)], "k string, rt long, v double")
    out = {r["id"]: r for r in nearest_asof_join(
        left, right, "k", "lt", "rt", "v", 1000).collect()}
    assert (out["e1"]["matched_time"], out["e1"]["matched_value"],
            out["e1"]["gap"]) == (103, 1.0, 3)
    assert (out["e2"]["matched_time"], out["e2"]["gap"]) == (199, 1)


def test_nearest_asof_tolerance_and_tie(spark):
    """Outside tolerance → NULL match; equidistant → backward wins."""
    from sync_cosmos_db_spark.operators.temporal import (
        nearest_asof_join,
    )

    left = spark.createDataFrame(
        [("far", "u", 1000), ("tie", "u", 100)],
        "id string, k string, lt long")
    right = spark.createDataFrame(
        [("u", 95, 1.0), ("u", 105, 2.0)],
        "k string, rt long, v double")
    out = {r["id"]: r for r in nearest_asof_join(
        left, right, "k", "lt", "rt", "v", 50).collect()}
    assert out["far"]["matched_time"] is None
    assert out["far"]["gap"] is None
    assert (out["tie"]["matched_time"], out["tie"]["matched_value"],
            out["tie"]["gap"]) == (95, 1.0, 5)


def test_nearest_asof_key_isolation(spark):
    """A right row on another key is never matched."""
    from sync_cosmos_db_spark.operators.temporal import (
        nearest_asof_join,
    )

    left = spark.createDataFrame([("e", "a", 100)],
                                 "id string, k string, lt long")
    right = spark.createDataFrame([("b", 100, 1.0)],
                                  "k string, rt long, v double")
    out = nearest_asof_join(left, right, "k", "lt", "rt", "v",
                            10**9).collect()
    assert out[0]["matched_time"] is None


# ---------------------------------------------------------------------------
# X196 — trailing-window OLS slope
# ---------------------------------------------------------------------------

def test_rolling_ols_exact_line(spark):
    """y = 10·x on consecutive days → slope exactly 10 once two
    points are in frame; first day has n=1 → NULL."""
    import datetime as dt

    from sync_cosmos_db_spark.operators.temporal import (
        rolling_ols_slope,
    )

    base = dt.date(2024, 1, 1)
    rows = [("g", base + dt.timedelta(days=i), 1000 + 10 * i)
            for i in range(5)]
    df = spark.createDataFrame(rows, "g string, d date, y long")
    out = sorted(rolling_ols_slope(df, "g", "d", "y", 28).collect(),
                 key=lambda r: r["d"])
    assert out[0]["slope"] is None and out[0]["n_days"] == 1
    assert all(r["slope"] == 10.0 for r in out[1:])


def test_rolling_ols_window_excludes_old_days(spark):
    """With a 3-day window, a day 10 days back is out of frame: the
    frame at the last day holds only the recent cluster."""
    import datetime as dt

    from sync_cosmos_db_spark.operators.temporal import (
        rolling_ols_slope,
    )

    base = dt.date(2024, 1, 1)
    rows = [("g", base, 999999),
            ("g", base + dt.timedelta(days=10), 100),
            ("g", base + dt.timedelta(days=11), 105),
            ("g", base + dt.timedelta(days=12), 110)]
    df = spark.createDataFrame(rows, "g string, d date, y long")
    out = {r["d"].isoformat(): r for r in
           rolling_ols_slope(df, "g", "d", "y", 3).collect()}
    last = out["2024-01-13"]
    assert last["n_days"] == 3 and last["slope"] == 5.0


# ---------------------------------------------------------------------------
# X197 — missingness patterns
# ---------------------------------------------------------------------------

def test_missingness_patterns_hand_counts(spark):
    """4 rows: complete, a-missing, both-missing ×2 → three
    patterns with exact shares."""
    from sync_cosmos_db_spark.operators.expectations import (
        missingness_patterns,
    )

    rows = [(1.0, "x"), (None, "y"), (None, None), (None, None)]
    df = spark.createDataFrame(rows, "a double, b string")
    out = {r["pattern"]: (r["n_rows"], r["share"]) for r in
           missingness_patterns(df, ["a", "b"]).collect()}
    assert out == {"00": (1, 0.25), "10": (1, 0.25),
                   "11": (2, 0.5)}


def test_missingness_patterns_all_complete(spark):
    """Dense input yields the single all-zeros pattern with share 1."""
    from sync_cosmos_db_spark.operators.expectations import (
        missingness_patterns,
    )

    df = spark.createDataFrame([(1.0, "x")] * 3, "a double, b string")
    out = missingness_patterns(df, ["a", "b"]).collect()
    assert len(out) == 1
    assert out[0]["pattern"] == "00" and out[0]["share"] == 1.0


# ---------------------------------------------------------------------------
# X198 — rendezvous routing
# ---------------------------------------------------------------------------

def test_rendezvous_movers_only_to_new_shard(spark):
    """The HRW invariant: recomputing assignments directly, every row
    whose N+1 assignment differs from its N assignment moved to the
    NEW shard — and the audit's per-shard n_moving agrees."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.skew import rendezvous_route

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = rendezvous_route(df, "doc_id", 4).collect()
    assert {r["shard"] for r in out} <= {0, 1, 2, 3}
    assert sum(r["n_rows"] for r in out) == 2000
    movers = sum(r["n_moving"] for r in out)
    # ~1/5 of rows move when shard 4 joins; generous band
    assert 200 <= movers <= 600


def test_rendezvous_assignment_deterministic_and_balanced(spark):
    """Same input twice → identical routing; and no shard is starved
    on a uniform corpus."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.skew import rendezvous_route

    df = spark.range(3000).select(F.col("id").alias("doc_id"))
    a = sorted(map(tuple, rendezvous_route(df, "doc_id", 6).collect()))
    b = sorted(map(tuple, rendezvous_route(df, "doc_id", 6).collect()))
    assert a == b
    counts = [r[1] for r in a]
    assert len(counts) == 6
    assert min(counts) > 3000 / 6 / 3
