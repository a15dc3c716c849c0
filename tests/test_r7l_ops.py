"""Ground-truth unit tests for round-7 batch-11 families X211-X214."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X211 — deny-list filter
# ---------------------------------------------------------------------------

def test_denylist_priority_exact_beats_prefix(spark):
    """A value matching BOTH an exact rule and a prefix rule is
    attributed to the exact rule only."""
    from sync_cosmos_db_spark.operators.curation import denylist_filter

    df = spark.createDataFrame(
        [("bad.com",), ("bad.com.evil",), ("good.org",)], "s string")
    out = {(r["rule_kind"], r["rule"]): r["n_rows"] for r in
           denylist_filter(df, "s", ["bad.com"], ["bad.com"]).collect()}
    assert out[("exact", "bad.com")] == 1
    assert out[("prefix", "bad.com")] == 1       # the .evil row
    assert out[("kept", "-")] == 1


def test_denylist_longer_prefix_wins(spark):
    """'abc' matches prefixes 'a' and 'ab' — the longer one is
    attributed; totals cover every row exactly once."""
    from sync_cosmos_db_spark.operators.curation import denylist_filter

    df = spark.createDataFrame([("abc",), ("axe",), ("zzz",)],
                               "s string")
    out = {(r["rule_kind"], r["rule"]): r["n_rows"] for r in
           denylist_filter(df, "s", [], ["a", "ab"]).collect()}
    assert out[("prefix", "ab")] == 1
    assert out[("prefix", "a")] == 1
    assert out[("kept", "-")] == 1
    assert sum(out.values()) == 3


# ---------------------------------------------------------------------------
# X212 — price/volume decomposition
# ---------------------------------------------------------------------------

def test_pv_decomposition_identity_and_hand_case(spark):
    """Base: 10 units @ 2.00 = 20; current: 15 units @ 3.00 = 45.
    volume = (15−10)·2 = 10, price = (3−2)·15 = 15, delta 25 —
    and the two effects sum to the delta exactly."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        price_volume_decomposition,
    )

    rows = [("g", 0, 10.0, 20.0), ("g", 1, 15.0, 45.0)]
    df = spark.createDataFrame(rows, "g string, per int, q double, r double")
    out = price_volume_decomposition(
        df, "g", F.col("per"), "q", "r").collect()[0]
    assert out["delta"] == 25.0
    assert out["volume_effect"] == 10.0
    assert out["price_effect"] == 15.0
    assert out["volume_effect"] + out["price_effect"] == out["delta"]


def test_pv_decomposition_pure_volume(spark):
    """Price unchanged → the whole delta is volume effect."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        price_volume_decomposition,
    )

    rows = [("g", 0, 4.0, 8.0), ("g", 1, 6.0, 12.0)]
    df = spark.createDataFrame(rows, "g string, per int, q double, r double")
    out = price_volume_decomposition(
        df, "g", F.col("per"), "q", "r").collect()[0]
    assert out["price_effect"] == 0.0
    assert out["volume_effect"] == out["delta"] == 4.0


# ---------------------------------------------------------------------------
# X213 — leakage-safe labels
# ---------------------------------------------------------------------------

def test_labels_windows_and_leakage_safety(spark):
    """Features count ONLY observation-window events; outcome-window
    activity sets the label but never the features; users first seen
    after the cutoff are excluded."""
    from sync_cosmos_db_spark.operators.curation import build_labels

    def e(u, day, typ):
        return (u, dt.datetime(2024, 1, day, 10), typ)

    rows = [
        e("obs_and_out", 10, "view"), e("obs_and_out", 12, "purchase"),
        e("obs_and_out", 22, "view"),           # outcome → label 1
        e("churned", 15, "view"),               # no outcome → label 0
        e("post_only", 23, "view"),             # first seen post-cutoff
        e("early_only", 1, "view"),             # before obs window
    ]
    df = spark.createDataFrame(rows,
                               "user_id string, ts timestamp, "
                               "event_type string")
    out = {r["user_id"]: r for r in
           build_labels(df, "user_id", "ts", "event_type",
                        "2024-01-21", obs_days=14,
                        out_days=7).collect()}
    assert set(out) == {"obs_and_out", "churned"}
    a = out["obs_and_out"]
    assert (a["n_events_obs"], a["n_positive_obs"], a["label"]) == (2, 1, 1)
    assert a["days_active_obs"] == 2
    assert a["recency_days"] == 9            # Jan 12 → Jan 21
    assert out["churned"]["label"] == 0


def test_labels_recency_is_min_gap(spark):
    """Recency is the gap to the LATEST observation event."""
    from sync_cosmos_db_spark.operators.curation import build_labels

    rows = [("u", dt.datetime(2024, 1, 8, 9), "view"),
            ("u", dt.datetime(2024, 1, 19, 9), "view")]
    df = spark.createDataFrame(rows,
                               "user_id string, ts timestamp, "
                               "event_type string")
    r = build_labels(df, "user_id", "ts", "event_type",
                     "2024-01-21").collect()[0]
    assert r["recency_days"] == 2


# ---------------------------------------------------------------------------
# X214 — decayed engagement
# ---------------------------------------------------------------------------

def test_decayed_engagement_halving(spark):
    """An event exactly one half-life old weighs 0.5; today's weighs
    1.0 — mass 1.5 for the two-event group."""
    from sync_cosmos_db_spark.operators.behavioral import (
        decayed_engagement,
    )

    rows = [("g", dt.datetime(2024, 1, 8, 12)),
            ("g", dt.datetime(2024, 1, 1, 12))]
    df = spark.createDataFrame(rows, "t string, ts timestamp")
    r = decayed_engagement(df, "t", "ts",
                           half_life_days=7.0).collect()[0]
    assert r["decayed_mass"] == 1.5
    assert r["mass_share_of_count"] == 0.75
    assert r["n_events"] == 2


def test_decayed_engagement_fresh_beats_stale(spark):
    """A group with 3 fresh events outweighs one with 5 stale
    events — the recency weighting RFM's count column misses."""
    from sync_cosmos_db_spark.operators.behavioral import (
        decayed_engagement,
    )

    rows = [("fresh", dt.datetime(2024, 3, 1, 8))] * 3
    rows += [("stale", dt.datetime(2024, 1, 1, 8))] * 5
    df = spark.createDataFrame(rows, "t string, ts timestamp")
    out = {r["t"]: r for r in
           decayed_engagement(df, "t", "ts", 7.0).collect()}
    assert out["fresh"]["decayed_mass"] > out["stale"]["decayed_mass"]
    assert out["stale"]["n_events"] == 5
