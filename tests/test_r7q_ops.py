"""Ground-truth unit tests for round-7 batch-16 families X231-X234."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X231 — numeric WOE (query-level composition; pinned via sweep)
# ---------------------------------------------------------------------------

def test_woe_price_deciles_structure(spark, sf_dir):
    """Ten decile categories of near-equal depth; IV contributions
    are non-negative by construction."""
    from sync_cosmos_db_spark.queries_r7 import woe_price_deciles

    rows = woe_price_deciles(spark, sf_dir).collect()
    assert {r["category"] for r in rows} == set(range(10))
    depths = [r["n"] for r in rows]
    assert max(depths) - min(depths) <= 1
    assert all(r["iv_contrib"] >= 0 for r in rows)
    assert all(r["n_good"] + r["n_bad"] == r["n"] for r in rows)


# ---------------------------------------------------------------------------
# X232 — HHI concentration
# ---------------------------------------------------------------------------

def test_hhi_extremes(spark, sf_dir):
    """Sanity on the registered query: a monopoly segment would be
    10000 points and perfect equality 10000/n — every observed
    segment sits strictly between."""
    from sync_cosmos_db_spark.queries_r7 import hhi_segment_customers

    rows = hhi_segment_customers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        lo = 10000.0 / r["n_cust"]
        assert lo - 1e-6 <= r["hhi_points"] <= 10000.0


# ---------------------------------------------------------------------------
# X233 — peak concurrency
# ---------------------------------------------------------------------------

def test_peak_concurrency_hand_case(spark):
    """Three users: a=[9,11], b=[10,12] overlap (peak 2); c=[13,14]
    alone afterwards — peak stays 2, sessions 3."""
    from sync_cosmos_db_spark.operators.behavioral import (
        peak_concurrency,
    )

    def t(h):
        return dt.datetime(2024, 1, 1, h)

    rows = [("a", t(9)), ("a", t(11)),
            ("b", t(10)), ("b", t(12)),
            ("c", t(13)), ("c", t(14))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    r = peak_concurrency(df).collect()[0]
    assert (r["n_sessions"], r["peak_concurrency"]) == (3, 2)


def test_peak_concurrency_touching_spans_overlap_at_instant(spark):
    """b starts at the exact microsecond a ends: with end-exclusive
    = last+1µs they DO overlap at that instant → peak 2; a third
    user on another day is isolated."""
    from sync_cosmos_db_spark.operators.behavioral import (
        peak_concurrency,
    )

    def t(h, m=0):
        return dt.datetime(2024, 2, 1, h, m)

    rows = [("a", t(9)), ("a", t(10)),
            ("b", t(10)), ("b", t(11)),
            ("z", dt.datetime(2024, 2, 2, 5))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {r["day"].isoformat(): r for r in
           peak_concurrency(df).collect()}
    assert out["2024-02-01"]["peak_concurrency"] == 2
    assert out["2024-02-02"]["peak_concurrency"] == 1


# ---------------------------------------------------------------------------
# X234 — rolling robust z
# ---------------------------------------------------------------------------

def test_rolling_robust_z_flags_spike_not_trend(spark):
    """A flat-ish series with one 10× spike: the spike day is the
    only anomaly, and the day AFTER the spike is not flagged (the
    median/IQR barely move — the robustness claim)."""
    from sync_cosmos_db_spark.operators.temporal import (
        rolling_robust_z,
    )

    base = dt.date(2024, 1, 1)
    rows = []
    for i in range(30):
        v = 1000 + (i % 5)          # mild texture so IQR > 0
        if i == 20:
            v = 10000
        rows.append(("g", base + dt.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "g string, d date, y long")
    out = {r["d"].isoformat(): r for r in
           rolling_robust_z(df, "g", "d", "y", 28, 10).collect()}
    assert out["2024-01-21"]["is_anomaly"] is True
    assert out["2024-01-22"]["is_anomaly"] is False
    assert out["2024-01-25"]["is_anomaly"] is False


def test_rolling_robust_z_nulls_below_min_obs(spark):
    """The first days (frame < min_obs) report NULL z."""
    from sync_cosmos_db_spark.operators.temporal import (
        rolling_robust_z,
    )

    base = dt.date(2024, 3, 1)
    rows = [("g", base + dt.timedelta(days=i), 100 + i)
            for i in range(15)]
    df = spark.createDataFrame(rows, "g string, d date, y long")
    out = sorted(rolling_robust_z(df, "g", "d", "y", 28, 10)
                 .collect(), key=lambda r: r["d"])
    assert all(r["robust_z"] is None for r in out[:9])
    assert all(r["robust_z"] is not None for r in out[9:])
