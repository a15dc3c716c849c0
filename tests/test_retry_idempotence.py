"""Micro-batch RETRY idempotence for both foreachBatch scale forms
(round-9 verdict item 7): Structured Streaming re-invokes the
foreachBatch function with the SAME batch_id after a failure, so
calling the merge body twice with one batch_id must leave the version
list and the final state identical to a single call.

Both bodies key their version dict by batch_id (not a list append or
a latest-pointer); these tests pin that contract by driving the
extracted factories directly — once normally, once with a simulated
retry — and hash-comparing the outcomes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_cosmos_db_spark.streaming.stateful import (
    make_compaction_merge_batch,
    make_rate_limit_merge_batch,
)


def _collect_sorted(df):
    return sorted(map(tuple, df.collect()))


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, "
              "o_orderstatus string, seq long, op string")


def test_compaction_retry_double_apply(spark, tmp_path):
    b0 = _changelog(spark, [(1, 10.0, "O", 1, "U"), (2, 20.0, "O", 1, "U")])
    b1 = _changelog(spark, [(1, 11.0, "F", 2, "U"), (3, 30.0, "O", 2, "U"),
                            (2, 0.0, "F", 2, "D")])

    # reference run: each batch applied exactly once
    ref_versions: dict[int, str] = {}
    ref = make_compaction_merge_batch(
        str(tmp_path / "ref"), ["o_orderkey"], "seq", "op", ref_versions)
    ref(b0, 0)
    ref(b1, 1)
    expected = _collect_sorted(
        spark.read.parquet(ref_versions[max(ref_versions)]))

    # retried run: batch 1 fails after writing, then is re-applied
    rt_versions: dict[int, str] = {}
    rt = make_compaction_merge_batch(
        str(tmp_path / "rt"), ["o_orderkey"], "seq", "op", rt_versions)
    rt(b0, 0)
    rt(b1, 1)
    rt(b1, 1)  # the retry
    got = _collect_sorted(
        spark.read.parquet(rt_versions[max(rt_versions)]))

    assert sorted(rt_versions) == [0, 1], (
        "retry must not append a new version entry")
    assert got == expected


def test_rate_limit_retry_double_apply(spark, tmp_path):
    def events(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp").withColumn(
                "ts", F.col("ts"))

    import datetime as dt

    h = dt.datetime(2024, 1, 1, 10, 0, 0)
    b0 = events([(1, h)] * 4 + [(2, h)])
    b1 = events([(1, h)] * 3 + [(2, h)] * 2)

    def final_totals(versions):
        spark_df = (spark.read.parquet(
            *(versions[b] for b in sorted(versions)))
            .groupBy("user_id", "window_start")
            .agg(F.sum("n_batch").alias("n_events"),
                 F.sum("n_admitted_batch").alias("n_admitted")))
        return _collect_sorted(spark_df)

    ref_versions: dict[int, str] = {}
    ref = make_rate_limit_merge_batch(str(tmp_path / "ref"), 5,
                                      ref_versions)
    ref(b0, 0)
    ref(b1, 1)
    expected = final_totals(ref_versions)

    rt_versions: dict[int, str] = {}
    rt = make_rate_limit_merge_batch(str(tmp_path / "rt"), 5, rt_versions)
    rt(b0, 0)
    rt(b1, 1)
    rt(b1, 1)  # the retry: must overwrite v1's partials, not stack them
    got = final_totals(rt_versions)

    assert sorted(rt_versions) == [0, 1], (
        "retry must not append a new version entry")
    assert got == expected
    # limit=5: user 1 saw 4+3=7 events, only 5 admitted
    admitted = {(u, w): a for (u, w, n, a) in got}
    assert sum(a for (u, _), a in admitted.items() if u == 1) == 5
