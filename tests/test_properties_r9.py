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


@_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(100, 999)),
                min_size=8, max_size=120))
def test_cvm_is_arm_symmetric(spark, pairs):
    """The two-sample CvM statistic is symmetric in the two samples:
    swapping arm labels leaves T unchanged."""
    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.operators.profiling import value_midranks

    def t_of(data):
        n1 = sum(1 for a, _ in data if a == 1)
        n0 = len(data) - n1
        if n1 == 0 or n0 == 0:
            return None
        vc = spark.createDataFrame(
            [(v, 1.0, 1.0 if a == 1 else 0.0, 0.0 if a == 1 else 1.0)
             for a, v in data], "v long, one double, a1 double, a0 double"
        ).groupBy("v").agg(F.sum("one").alias("t"),
                           F.sum("a1").alias("t1"),
                           F.sum("a0").alias("t0"))
        r = value_midranks(vc, "v", "t", out_col="mr",
                           extra_counts=("t1", "t0"))
        row = r.agg(
            F.sum(F.col("t1") * (F.col("mr") - F.col("mr_t1")) ** 2)
            .alias("u1"),
            F.sum(F.col("t0") * (F.col("mr") - F.col("mr_t0")) ** 2)
            .alias("u0")).collect()[0]
        release_persisted()
        nn = n1 + n0
        return ((n1 * row.u1 + n0 * row.u0) / (n1 * n0 * nn)
                - (4.0 * n1 * n0 - 1) / (6.0 * nn))

    t_a = t_of(pairs)
    t_b = t_of([(1 - a, v) for a, v in pairs])
    if t_a is not None and t_b is not None:
        assert abs(t_a - t_b) < 1e-9


@_SETTINGS
@given(st.lists(st.integers(0, 500), min_size=5, max_size=80),
       st.integers(1, 1000))
def test_brown_forsythe_deviations_shift_invariant(spark, vals, shift):
    """|x − median| is shift-invariant, so the Brown-Forsythe F over
    any grouping must not change when every value shifts by a
    constant (pure-Python check of the statistic the query
    implements)."""
    import math

    def f_of(xs):
        groups = {0: xs[::2], 1: xs[1::2]}
        groups = {g: v for g, v in groups.items() if v}
        if len(groups) < 2 or sum(len(v) for v in groups.values()) <= len(groups):
            return None
        devs = {}
        for g, v in groups.items():
            s = sorted(v)
            n = len(s)
            mid = (n - 1) / 2
            med = (s[int(math.floor(mid))]
                   + (s[int(math.ceil(mid))] - s[int(math.floor(mid))])
                   * (mid - math.floor(mid)))
            devs[g] = [abs(x - med) for x in v]
        k = len(devs)
        n = sum(len(v) for v in devs.values())
        s = sum(sum(v) for v in devs.values())
        q = sum(x * x for v in devs.values() for x in v)
        bt = sum(sum(v) ** 2 / len(v) for v in devs.values())
        within = q - bt
        if within <= 0:
            return None
        return ((bt - s * s / n) / (k - 1)) / (within / (n - k))

    f1 = f_of(vals)
    f2 = f_of([x + shift for x in vals])
    if f1 is not None and f2 is not None:
        assert abs(f1 - f2) < 1e-9 * max(1.0, abs(f1))
