"""Ground-truth unit tests for round-7 batch-20 families X247-X250."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# X247 — rollout ramp audit (query-level)
# ---------------------------------------------------------------------------

def test_ramp_shares_track_plan_and_are_sticky(spark, sf_dir):
    """Observed shares sit near each phase's plan; the treated share
    never decreases across phase boundaries (sticky monotone
    ramp)."""
    from sync_cosmos_db_spark.queries_r7 import ramp_audit_events

    rows = sorted(ramp_audit_events(spark, sf_dir).collect(),
                  key=lambda r: r["day"])
    assert rows
    for r in rows:
        assert r["n_treated"] <= r["n_active"]
    phases = sorted({r["planned_pct"] for r in rows})
    assert phases == [5, 25, 50]
    # POOLED share per phase (single days are noisy at tiny SF)
    # tracks the plan and is ordered like it
    pooled = []
    for p in phases:
        t = sum(r["n_treated"] for r in rows
                if r["planned_pct"] == p)
        a = sum(r["n_active"] for r in rows
                if r["planned_pct"] == p)
        pooled.append(t / a)
        assert abs(t / a - p / 100) < 0.1
    assert pooled[0] < pooled[1] < pooled[2]


# ---------------------------------------------------------------------------
# X248 — nearest-centroid eval
# ---------------------------------------------------------------------------

def test_nearest_centroid_separable_clusters(spark):
    """Two well-separated clusters classify perfectly: the
    confusion matrix is diagonal."""
    from sync_cosmos_db_spark.operators.similarity import (
        nearest_centroid_eval,
    )

    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 3), 0.0], 0))
        rows.append((100 + i, [0.0, 10.0 + (i % 3)], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {(r["true_label"], r["pred_label"]): r["n"]
           for r in nearest_centroid_eval(df).collect()}
    assert out == {(0, 0): 20, (1, 1): 20}


def test_nearest_centroid_confusable_point_crosses(spark):
    """A label-0 vector sitting on label 1's centroid is predicted
    1 — off-diagonal mass appears exactly once."""
    from sync_cosmos_db_spark.operators.similarity import (
        nearest_centroid_eval,
    )

    rows = [(1, [10.0, 0.0], 0), (2, [10.0, 0.0], 0),
            (3, [0.0, 10.0], 1), (4, [0.0, 10.0], 1),
            (5, [0.0, 10.0], 0)]          # mislabeled straggler
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = {(r["true_label"], r["pred_label"]): r["n"]
           for r in nearest_centroid_eval(df).collect()}
    assert out[(0, 1)] == 1
    assert out[(0, 0)] == 2 and out[(1, 1)] == 2


# ---------------------------------------------------------------------------
# X249 — lag features (query-level)
# ---------------------------------------------------------------------------

def test_lag_features_calendar_correct(spark, sf_dir):
    """Wherever y_lag1 is present it equals the previous calendar
    day's y; missing calendar days yield NULL, never the previous
    PRESENT day's value."""
    import datetime as dt

    from sync_cosmos_db_spark.queries_r7 import (
        lag_features_daily_revenue,
    )

    rows = lag_features_daily_revenue(spark, sf_dir).collect()
    by_key = {(r["prio"], r["d"]): r["y"] for r in rows}
    checked = 0
    for r in rows:
        prev = (r["prio"], r["d"] - dt.timedelta(days=1))
        if r["y_lag1"] is not None:
            assert by_key[prev] == r["y_lag1"]
            checked += 1
        else:
            assert prev not in by_key
    assert checked > 0


# ---------------------------------------------------------------------------
# X250 — fold-temporal audit (query-level)
# ---------------------------------------------------------------------------

def test_fold_audit_hash_splitter_passes(spark, sf_dir):
    """The sha2 fold assignment is independent of order month —
    chi²/dof stays under the bar and the audit PASSes (that IS the
    audit's self-test)."""
    from sync_cosmos_db_spark.queries_r7 import (
        fold_temporal_audit_orders,
    )

    r = fold_temporal_audit_orders(spark, sf_dir).collect()[0]
    assert r["n_folds"] == 5
    assert r["dof"] == (r["n_folds"] - 1) * (r["n_months"] - 1)
    assert r["verdict"] == "PASS"
    assert r["chi2"] / r["dof"] <= 1.5
