"""Ground-truth unit tests for round-7 batch-5 families X187-X190."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X187 — cohort retention triangle
# ---------------------------------------------------------------------------

def _ts(y, m, d):
    return dt.datetime(y, m, d, 12, 0, 0)


def test_cohort_retention_triangle(spark):
    """3-user Jan cohort with 2 active in Feb and 1 in Mar; a 1-user
    Feb cohort — hand-built triangle."""
    from sync_cosmos_db_spark.operators.behavioral import (
        cohort_retention_monthly,
    )

    rows = [
        ("u1", _ts(2024, 1, 5)), ("u1", _ts(2024, 2, 2)),
        ("u1", _ts(2024, 3, 9)),
        ("u2", _ts(2024, 1, 20)), ("u2", _ts(2024, 2, 28)),
        ("u3", _ts(2024, 1, 31)),
        ("u4", _ts(2024, 2, 14)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {(r["cohort_month"].isoformat(), r["month_offset"]):
           (r["n_active"], r["cohort_size"], r["retention"])
           for r in cohort_retention_monthly(df).collect()}
    assert out[("2024-01-01", 0)] == (3, 3, 1.0)
    assert out[("2024-01-01", 1)] == (2, 3, 0.6667)
    assert out[("2024-01-01", 2)] == (1, 3, 0.3333)
    assert out[("2024-02-01", 0)] == (1, 1, 1.0)
    assert len(out) == 4


def test_cohort_retention_distinct_within_month(spark):
    """Five events by one user in one month count once."""
    from sync_cosmos_db_spark.operators.behavioral import (
        cohort_retention_monthly,
    )

    rows = [("u1", _ts(2024, 1, d)) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = cohort_retention_monthly(df).collect()
    assert len(out) == 1
    assert out[0]["n_active"] == 1 and out[0]["cohort_size"] == 1


def test_cohort_retention_year_boundary(spark):
    """Dec→Jan is offset 1, not -11 (months_between on truncated
    stamps crosses the year correctly)."""
    from sync_cosmos_db_spark.operators.behavioral import (
        cohort_retention_monthly,
    )

    rows = [("u1", _ts(2023, 12, 30)), ("u1", _ts(2024, 1, 2))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {r["month_offset"] for r in cohort_retention_monthly(df).collect()}
    assert out == {0, 1}


# ---------------------------------------------------------------------------
# X188 — Spearman rank correlation
# ---------------------------------------------------------------------------

def test_spearman_monotone_nonlinear_is_one(spark):
    """y = x³ is a perfect monotone (but non-linear) relation:
    Spearman 1.0, and the reversed sign gives -1.0."""
    from sync_cosmos_db_spark.operators.profiling import spearman_corr

    rows = [("a", float(x), float(x) ** 3) for x in range(1, 9)]
    rows += [("b", float(x), -float(x) ** 3) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r["rho"] for r in
           spearman_corr(df, "g", "x", "y").collect()}
    assert out["a"] == 1.0
    assert out["b"] == -1.0


def test_spearman_midrank_ties_hand_case(spark):
    """x = (1,2,3,4), y = (1,1,2,3): y's tied pair takes midrank 1.5.
    rx = (1,2,3,4), ry = (1.5,1.5,3,4) → rho = 0.9487 (hand
    computation via the Pearson closed form on midranks)."""
    from sync_cosmos_db_spark.operators.profiling import spearman_corr

    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0),
            ("g", 3.0, 2.0), ("g", 4.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = spearman_corr(df, "g", "x", "y").collect()[0]
    # n=4 sx=10 sy=10 sxx=30 syy=29.5 sxy=29.5
    # rho = (4*29.5-100)/sqrt((120-100)*(118-100)) = 18/sqrt(360)
    assert out["rho"] == pytest.approx(0.9487, abs=1e-4)
    assert out["n"] == 4


def test_spearman_constant_column_is_null(spark):
    """A constant column has zero rank variance — rho must be NULL,
    not a division error."""
    from sync_cosmos_db_spark.operators.profiling import spearman_corr

    rows = [("g", float(x), 7.0) for x in range(5)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    assert spearman_corr(df, "g", "x", "y").collect()[0]["rho"] is None


# ---------------------------------------------------------------------------
# X189 — precision/recall threshold sweep
# ---------------------------------------------------------------------------

def test_pr_sweep_hand_counts(spark):
    """4 positives at scores .9/.8/.6/.3, 4 negatives at .7/.4/.2/.1:
    at t=50% tp=3 fp=1 fn=1 → P=.75 R=.75 F1=.75; at t=75%
    tp=2 fp=0 → P=1."""
    from sync_cosmos_db_spark.operators.profiling import (
        pr_threshold_sweep,
    )

    rows = [(0.9, 1), (0.8, 1), (0.6, 1), (0.3, 1),
            (0.7, 0), (0.4, 0), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["threshold_pct"]: r for r in
           pr_threshold_sweep(df, "s", "y").collect()}
    assert len(out) == 19 and set(out) == set(range(5, 100, 5))
    t50 = out[50]
    assert (t50["tp"], t50["fp"], t50["fn"]) == (3, 1, 1)
    assert t50["precision"] == 0.75
    assert t50["recall"] == 0.75
    assert t50["f1"] == 0.75
    t75 = out[75]
    assert (t75["tp"], t75["fp"]) == (2, 0)
    assert t75["precision"] == 1.0


def test_pr_sweep_zero_denominators_null(spark):
    """With every score below the top thresholds there are no
    predicted positives — precision is NULL, recall 0."""
    from sync_cosmos_db_spark.operators.profiling import (
        pr_threshold_sweep,
    )

    df = spark.createDataFrame([(0.1, 1), (0.05, 0)], "s double, y int")
    out = {r["threshold_pct"]: r for r in
           pr_threshold_sweep(df, "s", "y").collect()}
    assert out[95]["precision"] is None
    assert out[95]["recall"] == 0.0
    # all-negative input: recall is NULL everywhere
    df2 = spark.createDataFrame([(0.6, 0), (0.2, 0)], "s double, y int")
    out2 = pr_threshold_sweep(df2, "s", "y").collect()
    assert all(r["recall"] is None for r in out2)


def test_pr_sweep_grid_boundary_inclusive(spark):
    """score == threshold predicts positive (≥, not >): a positive
    at exactly 0.50 is a tp at t=50%."""
    from sync_cosmos_db_spark.operators.profiling import (
        pr_threshold_sweep,
    )

    df = spark.createDataFrame([(0.50, 1)], "s double, y int")
    out = {r["threshold_pct"]: r for r in
           pr_threshold_sweep(df, "s", "y").collect()}
    assert out[50]["tp"] == 1 and out[55]["tp"] == 0


# ---------------------------------------------------------------------------
# X190 — linear-interpolation gap-fill
# ---------------------------------------------------------------------------

def test_interpolation_interior_gap(spark):
    """Observations 10.0 on day 1 and 40.0 on day 4: days 2 and 3
    interpolate to exactly 20.0 and 30.0."""
    from sync_cosmos_db_spark.operators.temporal import (
        gap_fill_interpolate,
    )

    rows = [("k", dt.date(2024, 1, 1), 10.0),
            ("k", dt.date(2024, 1, 4), 40.0)]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    out = {r["d"].isoformat(): r["v_interp"] for r in
           gap_fill_interpolate(df, ["k"], "d", "v").collect()}
    assert out == {"2024-01-01": 10.0, "2024-01-02": 20.0,
                   "2024-01-03": 30.0, "2024-01-04": 40.0}


def test_interpolation_observed_rows_kept_exact(spark):
    """Observed rows pass through their own value, and descending
    segments interpolate too."""
    from sync_cosmos_db_spark.operators.temporal import (
        gap_fill_interpolate,
    )

    rows = [("k", dt.date(2024, 1, 1), 9.0),
            ("k", dt.date(2024, 1, 3), 3.0),
            ("k", dt.date(2024, 1, 4), 5.0)]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    got = {r["d"].isoformat(): (r["v"], r["v_interp"]) for r in
           gap_fill_interpolate(df, ["k"], "d", "v").collect()}
    assert got["2024-01-02"] == (None, 6.0)
    assert got["2024-01-03"] == (3.0, 3.0)
    assert got["2024-01-04"] == (5.0, 5.0)


def test_interpolation_per_key_spines_isolated(spark):
    """Each key interpolates within its own [min, max] — no spine
    bleed between keys with different spans."""
    from sync_cosmos_db_spark.operators.temporal import (
        gap_fill_interpolate,
    )

    rows = [("a", dt.date(2024, 1, 1), 0.0),
            ("a", dt.date(2024, 1, 3), 4.0),
            ("b", dt.date(2024, 2, 10), 100.0)]
    df = spark.createDataFrame(rows, "k string, d date, v double")
    out = gap_fill_interpolate(df, ["k"], "d", "v").collect()
    a = sorted((r["d"].isoformat(), r["v_interp"])
               for r in out if r["k"] == "a")
    b = [(r["d"].isoformat(), r["v_interp"])
         for r in out if r["k"] == "b"]
    assert a == [("2024-01-01", 0.0), ("2024-01-02", 2.0),
                 ("2024-01-03", 4.0)]
    assert b == [("2024-02-10", 100.0)]
