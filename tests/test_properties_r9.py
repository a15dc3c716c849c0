"""Property-based invariants for the round-9 statistical operators.

Same conventions as tests/test_properties.py: hypothesis drives the
DATA; each property runs a bounded number of Spark jobs per example
(max_examples kept small)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(max_examples=5, deadline=None,
                     suppress_health_check=[
                         HealthCheck.function_scoped_fixture])


@_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(1, 6)),
                min_size=1, max_size=60))
def test_value_midranks_match_reference(spark, pairs):
    """value_midranks (two-phase distributed scan) must equal the
    textbook midrank for every distinct value, and the rank mass must
    total N(N+1)/2."""
    from sync_cosmos_db_spark.operators.profiling import value_midranks
    from sync_cosmos_db_spark.cache_scope import release_persisted

    # collapse duplicates: one row per distinct value with total count
    counts = Counter()
    for v, t in pairs:
        counts[v] += t
    vc = spark.createDataFrame(
        [(float(v), float(t)) for v, t in counts.items()], "v double, t double")
    got = {r.v: r.midrank for r in value_midranks(vc, "v", "t").collect()}
    release_persisted()

    cum = 0.0
    n = sum(counts.values())
    for v in sorted(counts):
        t = counts[v]
        cum += t
        assert got[float(v)] == cum - (t - 1) / 2, v
    mass = sum(got[float(v)] * counts[v] for v in counts)
    assert mass == n * (n + 1) / 2


@_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 30),
                          st.booleans()),
                min_size=4, max_size=80))
def test_logrank_arm_swap_flips_o_minus_e(spark, rows):
    """Swapping the arm labels negates O−E and preserves the variance
    and chi² of the log-rank statistic."""
    def stat(data):
        surv = spark.createDataFrame(
            [(a, t, int(d)) for a, t, d in data], "arm int, t int, died int")
        times = (surv.filter(F.col("died") == 1)
                 .select(F.col("t").alias("dt")).distinct())
        joined = F.broadcast(times).join(surv, surv.t >= times.dt)
        risk = joined.groupBy("dt").agg(
            F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
            F.count(F.lit(1)).alias("n"),
            F.count(F.when((F.col("died") == 1)
                           & (F.col("t") == F.col("dt"))
                           & (F.col("arm") == 1), 1)).alias("d1"),
            F.count(F.when((F.col("died") == 1)
                           & (F.col("t") == F.col("dt")), 1)).alias("d"))
        n1n = F.col("n1").cast("double") / F.col("n")
        out = risk.agg(
            F.sum(F.col("d1") - F.col("d") * n1n).alias("oe"),
            F.sum(F.when(F.col("n") > 1,
                         F.col("d") * n1n * (1 - n1n)
                         * (F.col("n") - F.col("d")) / (F.col("n") - 1))
                  .otherwise(0.0)).alias("v")).collect()[0]
        return out.oe, out.v

    if not any(d for _, _, d in rows):
        return  # no deaths: no death times, statistic undefined
    oe1, v1 = stat(rows)
    oe2, v2 = stat([(1 - a, t, d) for a, t, d in rows])
    assert abs((oe1 or 0.0) + (oe2 or 0.0)) < 1e-9
    assert abs((v1 or 0.0) - (v2 or 0.0)) < 1e-9


@_SETTINGS
@given(st.lists(st.tuples(st.sampled_from("abc"), st.sampled_from("xyzw")),
                min_size=2, max_size=100))
def test_cramers_v_bounds_and_perfect_association(spark, cells):
    """Cramér's V from the windowed-margin chi² identity is in [0, 1];
    a bijective recode of the same column gives exactly 1."""
    from pyspark.sql import Window as W

    def v_of(pairs):
        df = spark.createDataFrame(pairs, "va string, vb string")
        c = df.groupBy("va", "vb").agg(F.count(F.lit(1)).alias("nij"))
        m = (c.withColumn("ni", F.sum("nij").over(W.partitionBy("va")))
             .withColumn("nj", F.sum("nij").over(W.partitionBy("vb")))
             .withColumn("n", F.sum("nij").over(W.partitionBy())))
        term = (F.col("nij").cast("double") * F.col("nij")
                / (F.col("ni").cast("double") * F.col("nj")))
        r = (m.agg((F.max("n") * (F.sum(term) - 1)).alias("chi2"),
                   F.max("n").alias("n"),
                   F.count_distinct("va").alias("r"),
                   F.count_distinct("vb").alias("c"))
             .collect()[0])
        if min(r.r, r.c) < 2:
            return None
        import math
        return math.sqrt(max(r.chi2, 0.0) / (r.n * (min(r.r, r.c) - 1)))

    v = v_of(cells)
    if v is not None:
        assert -1e-9 <= v <= 1 + 1e-9
    recode = {"a": "x", "b": "y", "c": "z"}
    v_perfect = v_of([(a, recode[a]) for a, _ in cells])
    if v_perfect is not None:
        assert abs(v_perfect - 1.0) < 1e-9
