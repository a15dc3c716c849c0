"""Unit tests for the round-6 fifth-batch families (X153-X155)."""

from __future__ import annotations

import datetime as dt


def test_t_closeness_identical_groups_have_zero_emd(spark, sf_dir):
    """Sanity on the registered query: t distances are in [0, 1) and
    at least one group differs from the global distribution."""
    from sync_cosmos_db_spark.queries_r6e import t_closeness_customers

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
