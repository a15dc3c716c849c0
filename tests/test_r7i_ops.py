"""Ground-truth unit tests for round-7 batch-8 families X199-X202."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X199 — equi-depth histogram
# ---------------------------------------------------------------------------

def test_equi_depth_exact_quartiles(spark):
    """20 distinct values into 4 buckets → 5 rows each with exact
    order-statistic boundaries."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        equi_depth_histogram,
    )

    df = spark.range(1, 21).select(
        (F.col("id") * 10.0).alias("v"), F.col("id").alias("tb"))
    out = {r["bucket"]: r for r in
           equi_depth_histogram(df, "v", "tb", k=4).collect()}
    assert [out[b]["n_rows"] for b in range(4)] == [5, 5, 5, 5]
    assert (out[0]["lo"], out[0]["hi"]) == (10.0, 50.0)
    assert (out[3]["lo"], out[3]["hi"]) == (160.0, 200.0)


def test_equi_depth_ties_split_by_tiebreak(spark):
    """All-equal values still split into equal-depth buckets (the
    tiebreak decides) — depth is exact, boundaries may repeat."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        equi_depth_histogram,
    )

    df = spark.range(12).select(F.lit(7.0).alias("v"),
                                F.col("id").alias("tb"))
    out = equi_depth_histogram(df, "v", "tb", k=3).collect()
    assert sorted(r["n_rows"] for r in out) == [4, 4, 4]
    assert all(r["lo"] == 7.0 and r["hi"] == 7.0 for r in out)


def test_equi_depth_uneven_split_deterministic(spark):
    """n=10, k=3 → depths 4/3/3 by the integer-division rule."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        equi_depth_histogram,
    )

    df = spark.range(10).select(F.col("id").cast("double").alias("v"),
                                F.col("id").alias("tb"))
    out = {r["bucket"]: r["n_rows"] for r in
           equi_depth_histogram(df, "v", "tb", k=3).collect()}
    assert out == {0: 4, 1: 3, 2: 3}


# ---------------------------------------------------------------------------
# X200 — dimension build
# ---------------------------------------------------------------------------

def test_dimension_keys_dense_and_stable(spark):
    """Surrogate keys are a dense 1..|dim| permutation, and two
    independent builds over the same corpus agree exactly."""
    from sync_cosmos_db_spark.operators.curation import (
        build_dimension,
    )

    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
            ("c", "z")] * 3
    df = spark.createDataFrame(rows, "p string, s string")
    d1 = {(r["p"], r["s"]): r["sk"] for r in
          build_dimension(df, ["p", "s"]).collect()}
    d2 = {(r["p"], r["s"]): r["sk"] for r in
          build_dimension(df, ["p", "s"]).collect()}
    assert d1 == d2
    assert sorted(d1.values()) == [1, 2, 3, 4, 5]


def test_dimension_new_member_extends(spark):
    """Adding rows that introduce no new tuples changes nothing;
    a genuinely new tuple grows the dimension by one."""
    from sync_cosmos_db_spark.operators.curation import (
        build_dimension,
    )

    base = spark.createDataFrame([("a", "x"), ("b", "y")],
                                 "p string, s string")
    more = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z")], "p string, s string")
    n1 = build_dimension(base, ["p", "s"]).count()
    n2 = build_dimension(more, ["p", "s"]).count()
    assert (n1, n2) == (2, 3)


# ---------------------------------------------------------------------------
# X201 — group medoid
# ---------------------------------------------------------------------------

def test_medoid_picks_nearest_to_mean(spark):
    """Values 1, 2, 9 → mean 4.0; 2 is nearest → rep."""
    from sync_cosmos_db_spark.operators.profiling import group_medoid

    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 2), ("g", 9.0, 3)],
        "g string, v double, id long")
    r = group_medoid(df, "g", "v", "id").collect()[0]
    assert r["mean_value"] == 4.0
    assert (r["rep_id"], r["rep_value"]) == (2, 2.0)
    assert r["n"] == 3


def test_medoid_symmetric_tie_breaks_to_lower_id(spark):
    """3 and 5 are equidistant from mean 4 → the lower id wins."""
    from sync_cosmos_db_spark.operators.profiling import group_medoid

    df = spark.createDataFrame(
        [("g", 3.0, 7), ("g", 5.0, 2)], "g string, v double, id long")
    r = group_medoid(df, "g", "v", "id").collect()[0]
    assert (r["rep_id"], r["rep_value"]) == (2, 5.0)


# ---------------------------------------------------------------------------
# X202 — new vs returning
# ---------------------------------------------------------------------------

def test_new_vs_returning_hand_days(spark):
    """Day 1: two new users.  Day 2: one returns, one new → DAU 2,
    new 1, returning 1."""
    from sync_cosmos_db_spark.operators.behavioral import (
        new_vs_returning,
    )

    def ts(day, h):
        return dt.datetime(2024, 3, day, h)

    rows = [("a", ts(1, 9)), ("b", ts(1, 10)),
            ("a", ts(2, 9)), ("c", ts(2, 11)),
            ("a", ts(2, 15))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {r["day"].isoformat(): r for r in
           new_vs_returning(df).collect()}
    d1, d2 = out["2024-03-01"], out["2024-03-02"]
    assert (d1["dau"], d1["new_users"], d1["returning_users"],
            d1["pct_new"]) == (2, 2, 0, 1.0)
    assert (d2["dau"], d2["new_users"], d2["returning_users"],
            d2["pct_new"]) == (2, 1, 1, 0.5)


def test_new_vs_returning_identity(spark):
    """Σ new_users over all days == number of distinct users."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.behavioral import (
        new_vs_returning,
    )

    rows = [(f"u{i % 7}", dt.datetime(2024, 1, 1 + i % 20, 8))
            for i in range(60)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = new_vs_returning(df).collect()
    assert sum(r["new_users"] for r in out) == 7
