"""Ground-truth unit tests for round-7 batch-10 families X207-X210."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X207 — incremental view maintenance
# ---------------------------------------------------------------------------

def test_ivm_insert_delete_update_hand_case(spark):
    """Snapshot {a: (2, 30), b: (1, 5)}; insert a+100, delete the
    a=10 row, update b 5→8 → {a: (2, 120), b: (1, 8)}."""
    from sync_cosmos_db_spark.operators.cdc import ivm_apply_agg

    snap = spark.createDataFrame(
        [("a", 2, 30.0), ("b", 1, 5.0)], "key string, n long, s double")
    log = spark.createDataFrame(
        [("a", "I", 100.0, None), ("a", "D", None, 10.0),
         ("b", "U", 8.0, 5.0)],
        "key string, op string, v_new double, v_old double")
    out = {r["key"]: (r["n"], r["s"]) for r in
           ivm_apply_agg(snap, log).collect()}
    assert out == {"a": (2, 120.0), "b": (1, 8.0)}


def test_ivm_key_vanishes_and_appears(spark):
    """Deleting a key's last row drops it from the view; inserting a
    brand-new key creates it."""
    from sync_cosmos_db_spark.operators.cdc import ivm_apply_agg

    snap = spark.createDataFrame([("gone", 1, 7.0)],
                                 "key string, n long, s double")
    log = spark.createDataFrame(
        [("gone", "D", None, 7.0), ("fresh", "I", 3.0, None)],
        "key string, op string, v_new double, v_old double")
    out = {r["key"]: (r["n"], r["s"]) for r in
           ivm_apply_agg(snap, log).collect()}
    assert out == {"fresh": (1, 3.0)}


def test_ivm_matches_direct_recompute(spark):
    """Property: maintained state == direct recompute over the final
    row set, on a randomized-ish deterministic workload."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.cdc import ivm_apply_agg

    rows = [(f"k{i % 5}", float(i), i) for i in range(200)]
    base = spark.createDataFrame(rows, "key string, v double, i long")
    snap = base.groupBy("key").agg(
        F.count("*").cast("long").alias("n"), F.sum("v").alias("s"))
    dels = base.filter(F.col("i") % 7 == 0).select(
        "key", F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("v_new"),
        F.col("v").alias("v_old"))
    ups = base.filter((F.col("i") % 7 != 0) & (F.col("i") % 3 == 0)) \
        .select("key", F.lit("U").alias("op"),
                (F.col("v") * 2).alias("v_new"),
                F.col("v").alias("v_old"))
    out = {r["key"]: (r["n"], r["s"]) for r in
           ivm_apply_agg(snap, dels.unionByName(ups)).collect()}
    final = base.filter(F.col("i") % 7 != 0).select(
        "key", F.when(F.col("i") % 3 == 0, F.col("v") * 2)
        .otherwise(F.col("v")).alias("v"))
    truth = {r["key"]: (r["n"], r["s"]) for r in
             final.groupBy("key").agg(
                 F.count("*").cast("long").alias("n"),
                 (F.floor(F.sum("v") * 100 + F.lit(0.5)) / 100)
                 .alias("s")).collect()}
    assert out == truth


# ---------------------------------------------------------------------------
# X208 — semi-additive balance
# ---------------------------------------------------------------------------

def test_semi_additive_last_value_wins(spark):
    """Two users in one month: only each user's LAST value counts;
    naive sum would give 10+20+30+40=100, semi-additive gives
    20+40=60."""
    from sync_cosmos_db_spark.operators.temporal import (
        semi_additive_balance,
    )

    rows = [("u1", dt.datetime(2024, 1, 5), 10.0, 1),
            ("u1", dt.datetime(2024, 1, 20), 20.0, 2),
            ("u2", dt.datetime(2024, 1, 3), 30.0, 3),
            ("u2", dt.datetime(2024, 1, 25), 40.0, 4)]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, v double, id long")
    out = semi_additive_balance(df, "k", "ts", "v", "id").collect()
    assert len(out) == 1
    assert out[0]["n_keys"] == 2
    assert out[0]["total_balance"] == 60.0


def test_semi_additive_ts_tie_breaks_by_id(spark):
    """Identical timestamps: the higher id is 'last'."""
    from sync_cosmos_db_spark.operators.temporal import (
        semi_additive_balance,
    )

    t = dt.datetime(2024, 2, 10, 12)
    df = spark.createDataFrame(
        [("u", t, 5.0, 1), ("u", t, 99.0, 2)],
        "k string, ts timestamp, v double, id long")
    out = semi_additive_balance(df, "k", "ts", "v", "id").collect()
    assert out[0]["total_balance"] == 99.0


# ---------------------------------------------------------------------------
# X209 — candidate-key audit
# ---------------------------------------------------------------------------

def test_candidate_key_verdicts(spark):
    """(a) is not a key, (a, b) is."""
    from sync_cosmos_db_spark.operators.expectations import (
        candidate_key_audit,
    )

    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x")], "a long, b string")
    out = {r["candidate"]: r for r in
           candidate_key_audit(df, [["a"], ["a", "b"]]).collect()}
    assert out["a"]["is_key"] is False
    assert out["a"]["n_distinct"] == 2
    assert out["a"]["uniqueness"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["a+b"]["is_key"] is True
    assert out["a+b"]["uniqueness"] == 1.0


def test_candidate_key_nulls_are_values(spark):
    """NULLs follow SQL-distinct semantics: two NULLs in a candidate
    column collapse to one distinct value → not a key."""
    from sync_cosmos_db_spark.operators.expectations import (
        candidate_key_audit,
    )

    df = spark.createDataFrame(
        [(None,), (None,), (1,)], "a long")
    r = candidate_key_audit(df, [["a"]]).collect()[0]
    assert r["n_distinct"] == 2 and r["is_key"] is False


# ---------------------------------------------------------------------------
# X210 — negative-balance episodes
# ---------------------------------------------------------------------------

def test_negative_episodes_hand_case(spark):
    """+5, −8 (dip to −3), +10, −20 (dip to −13) → 2 episodes,
    min −13; an always-positive user is absent from the output."""
    from sync_cosmos_db_spark.operators.temporal import (
        negative_balance_episodes,
    )

    def t(i):
        return dt.datetime(2024, 1, 1, i)

    rows = [("u", t(1), 5.0), ("u", t(2), -8.0), ("u", t(3), 10.0),
            ("u", t(4), -20.0),
            ("rich", t(1), 100.0), ("rich", t(2), -1.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, a double")
    out = {r["k"]: r for r in
           negative_balance_episodes(df, "k", "ts", "a").collect()}
    assert set(out) == {"u"}
    assert out["u"]["n_episodes"] == 2
    assert out["u"]["min_balance"] == -13.0


def test_negative_episodes_contiguous_run_is_one(spark):
    """Staying below zero across several events is ONE episode."""
    from sync_cosmos_db_spark.operators.temporal import (
        negative_balance_episodes,
    )

    def t(i):
        return dt.datetime(2024, 1, 1, i)

    rows = [("u", t(1), -5.0), ("u", t(2), -5.0), ("u", t(3), 2.0),
            ("u", t(4), 20.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, a double")
    r = negative_balance_episodes(df, "k", "ts", "a").collect()[0]
    assert r["n_episodes"] == 1
    assert r["min_balance"] == -10.0
