"""Ground-truth unit tests for round-7 batch-12 families X215-X218."""

from __future__ import annotations

import datetime as dt
import math

import pytest


def _t(day, h=12, m=0):
    return dt.datetime(2024, 1, day, h, m)


# ---------------------------------------------------------------------------
# X215 — conversion latency
# ---------------------------------------------------------------------------

def test_conversion_latency_hand_case(spark):
    """u1 converts 3600 s after first click, u2 never, u3's purchase
    PRECEDES the first click (doesn't count) → 1/3 convert, p50 =
    3600 s."""
    from sync_cosmos_db_spark.operators.behavioral import (
        conversion_latency,
    )

    rows = [("u1", _t(1, 10), "click"), ("u1", _t(1, 11), "purchase"),
            ("u2", _t(1, 10), "click"),
            ("u3", _t(2, 10), "click"), ("u3", _t(1, 9), "purchase")]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, "
                                     "event_type string")
    r = conversion_latency(df).collect()[0]
    assert (r["n_users"], r["n_converters"]) == (3, 1)
    assert r["conv_rate"] == pytest.approx(1 / 3, abs=1e-4)
    assert r["p50_s"] == 3600.0


def test_conversion_latency_first_click_anchors(spark):
    """The delay anchors on the FIRST click even when later clicks
    are closer to the purchase."""
    from sync_cosmos_db_spark.operators.behavioral import (
        conversion_latency,
    )

    rows = [("u", _t(1, 8), "click"), ("u", _t(1, 11), "click"),
            ("u", _t(1, 12), "purchase")]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, "
                                     "event_type string")
    r = conversion_latency(df).collect()[0]
    assert r["p50_s"] == 4 * 3600.0


# ---------------------------------------------------------------------------
# X216 — monthly seasonal index
# ---------------------------------------------------------------------------

def test_seasonal_index_recovers_planted_month(spark):
    """Three flat years with every January doubled: January's index
    is the maximum and the indices average to 1."""
    from sync_cosmos_db_spark.operators.temporal import (
        seasonal_index_monthly,
    )

    rows = []
    for y in (2020, 2021, 2022):
        for m in range(1, 13):
            v = 200.0 if m == 1 else 100.0
            rows.append((dt.date(y, m, 15), v))
    df = spark.createDataFrame(rows, "d date, v double")
    out = {r["month_of_year"]: r["seasonal_index"] for r in
           seasonal_index_monthly(df, "d", "v").collect()}
    assert max(out, key=out.get) == 1
    assert out[1] > 1.5
    mean = sum(out.values()) / len(out)
    assert mean == pytest.approx(1.0, abs=1e-3)


def test_seasonal_index_needs_full_windows(spark):
    """With under 12 months of data no full centered window exists —
    empty output, not a partial-window artifact."""
    from sync_cosmos_db_spark.operators.temporal import (
        seasonal_index_monthly,
    )

    rows = [(dt.date(2024, m, 1), 100.0) for m in range(1, 9)]
    df = spark.createDataFrame(rows, "d date, v double")
    assert seasonal_index_monthly(df, "d", "v").count() == 0


# ---------------------------------------------------------------------------
# X217 — exponential-fit KS
# ---------------------------------------------------------------------------

def test_exp_ks_constant_gaps_far_from_exponential(spark):
    """Perfectly regular arrivals (all gaps equal) are maximally
    non-exponential: every gap sits at F = 1 − e⁻¹, and the
    empirical CDF is 0 just below it, so D = 1 − e⁻¹ exactly."""
    from sync_cosmos_db_spark.operators.profiling import exp_fit_ks

    rows = [("g", _t(1, 0, m)) for m in range(0, 60, 5)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    r = exp_fit_ks(df, "g", "ts").collect()[0]
    n = r["n_gaps"]
    assert n == 11
    assert r["mean_gap_s"] == 300.0
    # all gaps = mean → cdf = 1 - e^-1 at every point; the i−1 = 0
    # candidate reaches the full height
    assert r["ks_d"] == pytest.approx(1 - math.exp(-1), abs=1e-6)


def test_exp_ks_groups_isolated(spark):
    """Two groups with different rates each get their own fit."""
    from sync_cosmos_db_spark.operators.profiling import exp_fit_ks

    rows = [("a", _t(1, 0, m)) for m in (0, 1, 2, 3, 4, 5)]
    rows += [("b", _t(1, h)) for h in (0, 2, 4, 6)]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {r["g"]: r for r in exp_fit_ks(df, "g", "ts").collect()}
    assert out["a"]["mean_gap_s"] == 60.0
    assert out["b"]["mean_gap_s"] == 7200.0
    assert out["a"]["n_gaps"] == 5 and out["b"]["n_gaps"] == 3


# ---------------------------------------------------------------------------
# X218 — top-N + OTHER rollup
# ---------------------------------------------------------------------------

def test_topn_other_rollup_query(spark, sf_dir):
    """Per nation: at most 3 named supplier rows; the OTHER row
    carries the remaining count; total revenue is conserved vs a
    plain per-nation aggregate."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.queries_r7 import (
        topn_other_suppliers_by_nation,
    )
    from sync_cosmos_db_spark.session import load_table

    out = topn_other_suppliers_by_nation(spark, sf_dir)
    rows = out.collect()
    per_nation = {}
    for r in rows:
        per_nation.setdefault(r["nation"], []).append(r)
    for nation, rs in per_nation.items():
        named = [r for r in rs if r["supplier"] != "OTHER"]
        assert len(named) <= 3
        assert all(r["n_suppliers"] == 1 for r in named)
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    totals = {r["nation"]: r["t"] for r in
              li.join(sup, li.l_suppkey == sup.s_suppkey)
              .groupBy(F.col("s_nationkey").alias("nation"))
              .agg(F.count("*").alias("t")).collect()}
    got = {}
    for r in rows:
        got[r["nation"]] = got.get(r["nation"], 0)
    # supplier-count conservation: Σ n_suppliers per nation equals
    # the nation's distinct supplier count
    sup_counts = {r["nation"]: r["t"] for r in
                  li.join(sup, li.l_suppkey == sup.s_suppkey)
                  .groupBy(F.col("s_nationkey").alias("nation"))
                  .agg(F.countDistinct("l_suppkey").alias("t"))
                  .collect()}
    for nation, rs in per_nation.items():
        assert sum(r["n_suppliers"] for r in rs) == sup_counts[nation]
