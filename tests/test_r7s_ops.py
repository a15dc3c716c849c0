"""Ground-truth unit tests for round-7 batch-18 families X239-X242."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X239 — diversified top-k (query-level)
# ---------------------------------------------------------------------------

def test_diversified_topk_caps_per_source(spark, sf_dir):
    """No source contributes more than 3 of the 12 rows, ranks are
    1..12, and scores are non-increasing."""
    from sync_cosmos_db_spark.queries_r7 import diversified_topk_docs

    rows = sorted(diversified_topk_docs(spark, sf_dir).collect(),
                  key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, 13))
    per_source = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert max(per_source.values()) <= 3
    chars = [r["n_chars"] for r in rows]
    assert all(a >= b for a, b in zip(chars, chars[1:]))


# ---------------------------------------------------------------------------
# X240 — Wilson lower bound (query-level; formula pinned here)
# ---------------------------------------------------------------------------

def test_wilson_small_n_fluke_below_large_n(spark, sf_dir):
    """The Wilson LB of 3/4 (0.75 rate) is below the LB of 40/60
    (0.67 rate) — hand-check of the exact constants the query
    uses."""
    import math

    def wilson_lb(r, n, z=1.96):
        p = r / n
        return ((p + z * z / (2 * n)
                 - z * math.sqrt(p * (1 - p) / n
                                 + z * z / (4 * n * n)))
                / (1 + z * z / n))

    assert wilson_lb(3, 4) < wilson_lb(40, 60)
    # and the query's literals (1.9208, 0.9604, 3.8416) are z²/2,
    # z²/4, z² for z = 1.96
    assert 1.96 ** 2 / 2 == pytest.approx(1.9208)
    assert 1.96 ** 2 / 4 == pytest.approx(0.9604)
    assert 1.96 ** 2 == pytest.approx(3.8416)


def test_wilson_query_ranks_by_lower_bound(spark, sf_dir):
    """Every returned row has n ≥ 5 and the ranking is by the LB,
    not the raw rate."""
    from sync_cosmos_db_spark.queries_r7 import (
        wilson_return_rate_parts,
    )

    rows = sorted(wilson_return_rate_parts(spark, sf_dir).collect(),
                  key=lambda r: r["rank"])
    assert len(rows) == 20
    assert all(r["n"] >= 5 for r in rows)
    lbs = [r["wilson_lb"] for r in rows]
    assert all(a >= b for a, b in zip(lbs, lbs[1:]))


# ---------------------------------------------------------------------------
# X241 — activity streaks
# ---------------------------------------------------------------------------

def test_streaks_hand_case(spark):
    """Days 1,2,3, 5,6, 9 → streaks (3,2,1): longest 3, final 1,
    6 active days; multiple events per day count once."""
    from sync_cosmos_db_spark.operators.behavioral import (
        activity_streaks,
    )

    def t(day, h=9):
        return dt.datetime(2024, 1, day, h)

    rows = [("u", t(1)), ("u", t(2)), ("u", t(2, 15)), ("u", t(3)),
            ("u", t(5)), ("u", t(6)), ("u", t(9))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    r = activity_streaks(df).collect()[0]
    assert (r["n_active_days"], r["n_streaks"]) == (6, 3)
    assert r["longest_streak"] == 3
    assert r["final_streak"] == 1


def test_streaks_single_unbroken_run(spark):
    """An unbroken 5-day run is one streak of 5, final == longest."""
    from sync_cosmos_db_spark.operators.behavioral import (
        activity_streaks,
    )

    rows = [("u", dt.datetime(2024, 2, d, 8)) for d in range(10, 15)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    r = activity_streaks(df).collect()[0]
    assert (r["n_streaks"], r["longest_streak"],
            r["final_streak"]) == (1, 5, 5)


# ---------------------------------------------------------------------------
# X242 — CUPED readout
# ---------------------------------------------------------------------------

def test_cuped_recovers_true_effect_and_cuts_variance(spark):
    """y = x + 5·(arm B) + small wobble, with the covariate slightly
    IMBALANCED across arms (B's x runs one higher): the raw gap is
    biased to ≈ 6, the CUPED-adjusted gap recovers the true 5.0,
    and the covariate absorbs >90% of the outcome variance."""
    from sync_cosmos_db_spark.operators.profiling import cuped_readout

    rows = []
    for i in range(400):
        x = float(i % 100)
        arm = "A" if i % 2 == 0 else "B"
        eff = 5.0 if arm == "B" else 0.0
        y = x + eff + (i % 7) * 0.1
        rows.append((arm, y, x))
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    out = {r["arm"]: r for r in
           cuped_readout(df, "arm", "y", "x").collect()}
    gap_raw = out["B"]["mean_y"] - out["A"]["mean_y"]
    gap_adj = out["B"]["mean_y_adj"] - out["A"]["mean_y_adj"]
    assert gap_raw == pytest.approx(6.0, abs=0.2)   # imbalance bias
    assert gap_adj == pytest.approx(5.0, abs=0.2)   # true effect
    assert out["A"]["var_reduction"] > 0.9
    assert out["B"]["var_reduction"] > 0.9


def test_cuped_useless_covariate_changes_nothing_much(spark):
    """A constant covariate has var(x)=0 — guard: theta is NaN/inf
    territory, so we use a near-constant covariate instead and
    expect ~zero variance reduction."""
    from sync_cosmos_db_spark.operators.profiling import cuped_readout

    rows = [("A" if i % 2 == 0 else "B",
             float(i % 13), 100.0 + (i % 2) * 1e-6)
            for i in range(200)]
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    out = {r["arm"]: r for r in
           cuped_readout(df, "arm", "y", "x").collect()}
    for r in out.values():
        assert abs(r["var_reduction"]) < 0.2
