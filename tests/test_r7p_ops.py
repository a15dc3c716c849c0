"""Ground-truth unit tests for round-7 batch-15 families X227-X230."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X227 — LTV buildup curve
# ---------------------------------------------------------------------------

def test_ltv_curve_hand_case(spark):
    """2 users; purchases 10 @ day0 and 6 @ day2 → cum per-user
    5.0 then 8.0; non-purchase events contribute nothing."""
    from sync_cosmos_db_spark.operators.behavioral import ltv_curve

    base = dt.datetime(2024, 1, 1, 9)
    rows = [("a", base, "purchase", 10.0),
            ("a", base + dt.timedelta(days=2), "purchase", 6.0),
            ("a", base + dt.timedelta(days=1), "view", 999.0),
            ("b", base, "view", 0.0)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, "
                                     "event_type string, value double")
    out = {r["t_days"]: r for r in ltv_curve(df).collect()}
    assert out[0]["rev_day"] == 10.0
    assert out[0]["cum_rev_per_user"] == 5.0
    assert out[2]["cum_rev_per_user"] == 8.0
    assert 1 not in out          # view day contributes no row


def test_ltv_curve_monotone(spark, sf_dir):
    """The cumulative column never decreases."""
    from sync_cosmos_db_spark.operators.behavioral import ltv_curve
    from sync_cosmos_db_spark.session import load_table

    out = sorted(ltv_curve(load_table(spark, sf_dir, "events"))
                 .collect(), key=lambda r: r["t_days"])
    cums = [r["cum_rev_per_user"] for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))


# ---------------------------------------------------------------------------
# X228 — feature screen
# ---------------------------------------------------------------------------

def test_feature_screen_ranks_signal_over_noise(spark):
    """A feature equal to the label scores AUC 1.0; pure noise sits
    near 0.5; an anti-correlated feature scores near 0."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        feature_screen_auc,
    )

    df = spark.range(2000).select(
        (F.col("id") % 2).alias("y"),
        (F.col("id") % 2).cast("double").alias("perfect"),
        (1 - F.col("id") % 2).cast("double").alias("anti"),
        (F.pmod(F.col("id") * 2654435761, F.lit(997)))
        .cast("double").alias("noise"))
    out = {r["feature"]: r["auc"] for r in feature_screen_auc(
        df, F.col("y").cast("long"),
        {"perfect": F.col("perfect"), "anti": F.col("anti"),
         "noise": F.col("noise")}).collect()}
    assert out["perfect"] == 1.0
    assert out["anti"] == 0.0
    assert abs(out["noise"] - 0.5) < 0.05


# ---------------------------------------------------------------------------
# X229 — zone-map audit
# ---------------------------------------------------------------------------

def test_zone_map_sorted_layout_skips_more(spark):
    """On a value-sorted layout a narrow probe skips most groups;
    on a decorrelated arrival layout it skips none."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.sinks import zone_map_skip_audit

    # value cycles 0..99 so EVERY arrival group spans the domain
    df = spark.range(10_000).select(
        (F.col("id") % 100).cast("double").alias("v"),
        F.col("id").alias("arr"))
    out = {(r["layout"]): r for r in zone_map_skip_audit(
        df, "v", "v", "arr", [(10.0, 19.0)],
        rows_per_group=500).collect()}
    assert out["sorted"]["skip_rate"] >= 0.8
    assert out["arrival"]["n_skipped"] == 0
    assert out["sorted"]["n_groups"] == 20


# ---------------------------------------------------------------------------
# X230 — SLO burn rate (query-level)
# ---------------------------------------------------------------------------

def test_slo_burn_rate_query(spark, sf_dir):
    """Burn columns are consistent with recomputed trailing ratios
    on a sample of buckets, and alert implies both thresholds."""
    from sync_cosmos_db_spark.queries_r7 import slo_burn_rate_events

    rows = sorted(slo_burn_rate_events(spark, sf_dir).collect(),
                  key=lambda r: r["bkt"])
    assert rows
    by_bkt = {r["bkt"]: r for r in rows}
    # recompute a middle bucket's 1h burn by hand
    mid = rows[len(rows) // 2]
    e1 = sum(by_bkt[b]["nerr"] for b in range(mid["bkt"] - 5,
                                             mid["bkt"] + 1)
             if b in by_bkt)
    t1 = sum(by_bkt[b]["n"] for b in range(mid["bkt"] - 5,
                                           mid["bkt"] + 1)
             if b in by_bkt)
    expect = (e1 / t1) / 0.25
    assert mid["burn_1h"] == pytest.approx(expect, abs=1e-4)
    for r in rows:
        if r["alert"]:
            assert r["burn_1h"] > 1.2 - 1e-4
            assert r["burn_6h"] > 1.0 - 1e-4
