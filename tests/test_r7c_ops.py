"""Ground-truth unit tests for round-7 batch-2 families X178-X181."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# X178 — Cohen's kappa
# ---------------------------------------------------------------------------

def test_kappa_perfect_agreement(spark):
    from sync_cosmos_db_spark.operators.profiling import cohens_kappa

    df = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 3, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row["p_o"] == 1.0 and row["kappa"] == 1.0


def test_kappa_textbook_2x2(spark):
    """Classic worked example: 20 A-yes/B-yes, 5 A-yes/B-no,
    10 A-no/B-yes, 15 A-no/B-no → p_o=0.7, p_e=0.5, kappa=0.4."""
    from sync_cosmos_db_spark.operators.profiling import cohens_kappa

    rows = ([("yes", "yes")] * 20 + [("yes", "no")] * 5
            + [("no", "yes")] * 10 + [("no", "no")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row["n"] == 50
    assert row["p_o"] == 0.7
    assert row["p_e"] == 0.5
    assert row["kappa"] == pytest.approx(0.4, abs=1e-6)


def test_kappa_chance_only_agreement_is_zero(spark):
    """Independent marginals: every (a,b) cell equally likely →
    p_o == p_e → kappa 0."""
    from sync_cosmos_db_spark.operators.profiling import cohens_kappa

    rows = [(a, b) for a in "xy" for b in "xy" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row["kappa"] == 0.0


# ---------------------------------------------------------------------------
# X179 — ROC-AUC
# ---------------------------------------------------------------------------

def test_auc_perfect_and_reversed(spark):
    from sync_cosmos_db_spark.operators.profiling import roc_auc

    rows = [(float(i), 1 if i >= 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, y long")
    assert roc_auc(df, "s", "y").collect()[0]["auc"] == 1.0
    flipped = df.select("s", (1 - F.col("y")).alias("y"))
    assert roc_auc(flipped, "s", "y").collect()[0]["auc"] == 0.0


def test_auc_hand_computed_with_ties(spark):
    """scores: pos {3, 2, 2}, neg {2, 1}. Midranks: 1→1, 2→3 (ranks
    2,3,4), 3→5. Σranks(pos)=5+3+3=11; AUC=(11-6)/(3*2)=0.833333."""
    from sync_cosmos_db_spark.operators.profiling import roc_auc

    rows = [(3.0, 1), (2.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)]
    df = spark.createDataFrame(rows, "s double, y long")
    row = roc_auc(df, "s", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (3, 2)
    assert row["auc"] == pytest.approx(5 / 6, abs=1e-6)


def test_auc_random_scores_near_half(spark):
    from sync_cosmos_db_spark.operators.profiling import roc_auc

    df = (spark.range(2000)
          .select((F.hash("id") % 1000).cast("double").alias("s"),
                  (F.hash("id", F.lit(1)) % 2 == 0).cast("long")
                  .alias("y")))
    assert abs(roc_auc(df, "s", "y").collect()[0]["auc"] - 0.5) < 0.05


# ---------------------------------------------------------------------------
# X180 — Hill tail index
# ---------------------------------------------------------------------------

def test_hill_exact_on_pareto_grid(spark):
    """For x_(i) = C * (k+1-i+? )... use the closed form directly:
    with values v_i = (101/i)^(1/2) for i=1..101, ln(v_i/v_101)
    = (1/2) ln(101/i) - (1/2) ln(1) ... mean over i=1..100 of
    (1/2)(ln 101 - ln i) → alpha-hat ≈ 2 (exact Pareto quantile
    grid, alpha=2)."""
    from sync_cosmos_db_spark.operators.profiling import hill_tail_index

    rows = [("g", (101.0 / i) ** 0.5) for i in range(1, 102)]
    df = spark.createDataFrame(rows, "g string, v double")
    row = hill_tail_index(df, "g", "v", k=100).collect()[0]
    assert row["k_used"] == 100
    assert row["x_k1"] == pytest.approx(1.0)
    expected_inv = sum(0.5 * math.log(101.0 / i)
                       for i in range(1, 101)) / 100
    assert row["alpha"] == pytest.approx(1 / expected_inv, abs=1e-3)


def test_hill_insufficient_tail_drops_group(spark):
    from sync_cosmos_db_spark.operators.profiling import hill_tail_index

    rows = [("small", float(i)) for i in range(1, 50)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert hill_tail_index(df, "g", "v", k=100).count() == 0


def test_hill_nonpositive_values_filtered(spark):
    from sync_cosmos_db_spark.operators.profiling import hill_tail_index

    rows = ([("g", float(i)) for i in range(1, 12)]
            + [("g", 0.0), ("g", -5.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    row = hill_tail_index(df, "g", "v", k=10).collect()[0]
    assert row["k_used"] == 10 and row["x_k1"] == 1.0


# ---------------------------------------------------------------------------
# X181 — MASE profile
# ---------------------------------------------------------------------------

def test_mase_hand_computed(spark):
    """14 days alternating 100/200 with period 2: lag-1 errors all
    100; lag-7 (odd season vs period 2) errors all 100 → ratio 1.
    Then a true weekly series: identical weeks → seasonal MAE 0."""
    from sync_cosmos_db_spark.operators.temporal import mase_profile

    base = dt.datetime(2024, 1, 1)
    week = [100.0, 200.0, 150.0, 120.0, 180.0, 90.0, 110.0]
    rows = [(base + dt.timedelta(days=i), week[i % 7])
            for i in range(21)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    row = mase_profile(df, "ts", "v", season=7).collect()[0]
    assert row["n_days"] == 21
    assert row["mae_seasonal"] == 0.0
    assert row["mase_ratio"] == 0.0
    naive_errors = [abs(week[(i) % 7] - week[(i - 1) % 7])
                    for i in range(1, 21)]
    assert row["mae_naive"] == pytest.approx(
        sum(naive_errors) / len(naive_errors), abs=1e-4)


def test_mase_collapses_multiple_rows_per_day(spark):
    from sync_cosmos_db_spark.operators.temporal import mase_profile

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(days=i, hours=h), 50.0)
            for i in range(10) for h in (1, 13)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    row = mase_profile(df, "ts", "v", season=7).collect()[0]
    assert row["n_days"] == 10
    assert row["mae_naive"] == 0.0   # constant 100/day after collapse
    assert row["mase_ratio"] is None  # undefined on a flat series
