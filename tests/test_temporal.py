"""As-of / range join: correctness vs naive theta-join forms, plus the
plan property that makes them scale (equi-join, not nested-loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def test_asof_join_matches_naive(spark):
    left = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 5), ("b", 15), ("c", 9)],
        "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("t"),
        F.col("t").alias("orig_t"))
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 10, 2.0), ("a", 18, 3.0), ("b", 99, 4.0)],
        "k string, t long, v double").select(
        "k", F.timestamp_seconds("t").alias("t"), "v")
    out = asof_join(left, right, key="k", left_time="t", right_time="t",
                    value_cols=["v"])
    got = {(r.k, r.orig_t): r.v for r in out.collect()}
    # a@5 -> none; a@10 -> v=2.0 (<= matches equal ts); a@20 -> 3.0;
    # b@15 -> none (snapshot later); c -> no right rows at all
    assert got == {("a", 5): None, ("a", 10): 2.0, ("a", 20): 3.0,
                   ("b", 15): None, ("c", 9): None}


def test_range_join_matches_naive_and_is_equi(spark, sf_dir):
    from sync_cosmos_db_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_id") % 50 == 0)
          .select(F.col("event_id").alias("iv_id"),
                  F.col("ts").alias("start_ts"),
                  (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts")))
    bucketed = range_join_bucketed(ev, iv, "ts", "start_ts", "end_ts", 3600)
    naive = ev.join(iv, (F.col("ts") >= F.col("start_ts"))
                    & (F.col("ts") < F.col("end_ts")))
    a = sorted((r.event_id, r.iv_id) for r in bucketed.collect())
    b = sorted((r.event_id, r.iv_id) for r in naive.collect())
    assert a == b and a  # non-empty and identical
    plan = spark._jvm.PythonSQLUtils.explainString(
        bucketed._jdf.queryExecution(), "formatted")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
