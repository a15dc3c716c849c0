"""Unit tests for the round-6 fifth-batch families (X153-X155)."""

from __future__ import annotations

import datetime as dt


def test_t_closeness_identical_groups_have_zero_emd(spark, sf_dir):
    """Sanity on the registered query: t distances are in [0, 1) and
    at least one group differs from the global distribution."""
    from sync_cosmos_db_spark.queries_r6 import t_closeness_customers

    r = t_closeness_customers(spark, sf_dir).collect()[0]
    assert r.n_groups > 0
    assert 0.0 <= r.mean_t <= r.max_t < 1.0


def test_funnel_within_window_counts(spark):
    """User 1 completes view->click->purchase in 30 min (within);
    user 2 clicks fast but purchases 2 h later (step1 within only);
    user 3 never clicks."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.behavioral import funnel_times

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, typ, mins, i):
        return (uid, t0 + dt.timedelta(minutes=mins), typ, i)

    rows = [ev(1, "view", 0, 1), ev(1, "click", 10, 2),
            ev(1, "purchase", 30, 3),
            ev(2, "view", 0, 4), ev(2, "click", 5, 5),
            ev(2, "purchase", 120, 6),
            ev(3, "view", 0, 7)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")
    t = funnel_times(df, ["view", "click", "purchase"])
    el2 = F.col("t2").cast("double") - F.col("t0").cast("double")
    agg = t.agg(
        F.count("t0").alias("s0"), F.count("t1").alias("s1"),
        F.count("t2").alias("s2"),
        F.sum(F.when(el2 <= 3600, 1).otherwise(0)).alias("s2w")
    ).collect()[0]
    assert (agg.s0, agg.s1, agg.s2, agg.s2w) == (3, 2, 2, 1)


def test_l_diversity_flags_homogeneous_group(spark):
    """A group of 10 rows sharing one sensitive bucket is k-anonymous
    for k<=10 yet 1-diverse — the audit must flag it."""
    from pyspark.sql import functions as F

    rows = [("g1", "s", 100.0)] * 10 + \
           [("g2", "s", v) for v in (-10.0, 100.0, 9000.0)]
    df = spark.createDataFrame(rows, "qa string, qb string, bal double")
    sens = (F.when(F.col("bal") < 0, "neg")
            .when(F.col("bal") < 5000, "mid").otherwise("high"))
    g = (df.groupBy("qa", "qb")
         .agg(F.count(F.lit(1)).alias("grp"),
              F.countDistinct(sens).alias("n_sensitive")))
    got = {r.qa: r.n_sensitive for r in g.collect()}
    assert got["g1"] == 1 and got["g2"] == 3


def test_changelog_compact_stream_across_batches(spark, tmp_path):
    """Conflicting events for one key arriving in DIFFERENT
    micro-batches: the state-store winner must follow the X53
    collapse order (higher seq wins; tombstone beats upsert at equal
    seq) regardless of arrival batch."""

    from sync_cosmos_db_spark.streaming.stateful import (
        changelog_compact_stream,
    )
    from sync_cosmos_db_spark.streaming.windows import run_stream_to_memory
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    schema = ("o_orderkey long, o_totalprice double, "
              "o_orderstatus string, seq long, op string")
    batch1 = [(1, 10.0, "A", 3, "U"),   # later seq, arrives FIRST
              (2, 20.0, "B", 1, "U")]
    batch2 = [(1, 99.0, "Z", 1, "U"),   # stale update, must lose
              (2, 20.0, "B", 1, "D")]   # equal seq tombstone, must win
    src = tmp_path / "cdc"
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    emitted = run_stream_to_memory(
        spark, changelog_compact_stream(stream), "cdc_unit_mem",
        mode="update")
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(), F.col("op").asc())
    final = {r.o_orderkey: r for r in
             emitted.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).collect()}
    assert final[1].seq == 3 and final[1].o_totalprice == 10.0
    assert final[2].op == "D"
