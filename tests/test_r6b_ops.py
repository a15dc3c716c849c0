"""Unit tests for the round-6 second-batch families (X121, X133,
X135-X142): planted ground truths and degenerate inputs the oracle
sweep cannot reach."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_changepoint_scan_finds_planted_shift(spark):
    """A series that jumps from ~10 to ~50 after t=20 must rank the
    boundary (last left-segment period) first, with the means of the
    two regimes recovered."""
    from sync_cosmos_db_spark.operators.profiling import changepoint_scan

    rows = [(t, 10.0 + (t % 3)) for t in range(1, 21)] + \
           [(t, 50.0 + (t % 3)) for t in range(21, 41)]
    df = spark.createDataFrame(rows, "t long, v double")
    top = changepoint_scan(df, "t", "v", top_k=1).collect()[0]
    assert top.split_t == 20
    assert top.n_before == 20 and top.n_after == 20
    assert abs(top.mean_before - 11.0) < 0.2
    assert abs(top.mean_after - 51.0) < 0.2
    assert top.gap > 39


def test_acf_period_two_alternation(spark):
    """A perfect +1/-1 alternation has acf(1) = -1 and acf(2) = +1
    up to the (n-k)/n taper of the unnormalized-pair estimator."""
    from sync_cosmos_db_spark.operators.profiling import acf

    rows = [(t, 1.0 if t % 2 == 0 else -1.0) for t in range(40)]
    df = spark.createDataFrame(rows, "t long, v double")
    got = {r.lag: r for r in acf(df, "t", "v", max_lag=2).collect()}
    assert got[1].n_pairs == 39 and got[2].n_pairs == 38
    assert got[1].acf_value < -0.9
    assert got[2].acf_value > 0.9


def test_rank_sum_separated_groups(spark):
    """When every A value exceeds every B value, U_a = n_a * n_b
    (maximal) and z is strongly positive."""
    from sync_cosmos_db_spark.operators.profiling import rank_sum_test

    rows = [("a", 100.0 + i) for i in range(20)] + \
           [("b", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = rank_sum_test(df, "g", "v", "a", "b").collect()[0]
    assert r.n_a == 20 and r.n_b == 30
    assert r.u_a == 600.0          # 20 * 30
    assert r.z > 5.0


def test_rank_sum_identical_groups_z_zero(spark):
    """Two identical samples: U_a == mean_u, z == 0 (ties midranked)."""
    from sync_cosmos_db_spark.operators.profiling import rank_sum_test

    rows = [("a", float(i % 5)) for i in range(10)] + \
           [("b", float(i % 5)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = rank_sum_test(df, "g", "v", "a", "b").collect()[0]
    assert r.u_a == r.mean_u
    assert r.z == 0.0


def test_weighted_median_pulls_toward_heavy_value(spark):
    """Unweighted median of {1..5} is 3, but with all the weight on 5
    the weighted median must be 5; n counts rows, total_w weights."""
    from sync_cosmos_db_spark.operators.profiling import weighted_median

    rows = [("g", float(v), 1.0) for v in (1, 2, 3, 4)] + \
           [("g", 5.0, 100.0)]
    df = spark.createDataFrame(rows, "grp string, v double, w double")
    r = weighted_median(df, "grp", "v", "w").collect()[0]
    assert r.n == 5 and r.total_w == 104.0
    assert r.wmedian == 5.0


def test_quantile_align_shift_recovers_offset(spark):
    """Group 'b' = group 'a' + 100 ⇒ every decile shift for 'b' is
    +50 against the pooled global (a and b equally sized)."""
    from sync_cosmos_db_spark.operators.profiling import quantile_align

    rows = [("a", float(i)) for i in range(101)] + \
           [("b", float(i + 100)) for i in range(101)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = quantile_align(df, "grp", "v", probs=[0.5]).collect()
    got = {r.grp: r for r in out}
    assert got["a"].group_q == 50.0 and got["b"].group_q == 150.0
    assert got["a"].global_q == got["b"].global_q == 100.0
    assert got["a"].shift == -50.0 and got["b"].shift == 50.0


def test_gini_extremes(spark):
    """Equal values → G = 0; all mass on one of n holders →
    G = (n-1)/n; zero-total group reports null."""
    from sync_cosmos_db_spark.operators.profiling import gini

    rows = [("eq", 5.0)] * 10 + \
           [("one", 0.0)] * 9 + [("one", 100.0)] + \
           [("zero", 0.0)] * 4
    df = spark.createDataFrame(rows, "grp string, v double")
    got = {r.grp: r for r in gini(df, "grp", "v").collect()}
    assert got["eq"].gini == 0.0
    assert abs(got["one"].gini - 0.9) < 1e-9
    assert got["zero"].gini is None


def test_source_kl_identical_and_skewed(spark):
    """A group with the corpus-average token mix has KL ≈ 0; a group
    concentrated on one token has strictly larger KL."""
    from sync_cosmos_db_spark.operators.text import source_kl

    rows = [(1, "g1", "a b c d"), (2, "g1", "a b c d"),
            (3, "g2", "a a a a"), (4, "g2", "a a a b")]
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    got = {r.src: r.kl for r in source_kl(df, "src", "text").collect()}
    assert got["g2"] > got["g1"] >= 0.0


def test_sniff_binary_type_magic_bytes(spark):
    """PNG / JPEG / RIFF+WAVE magic prefixes classify; RIFF without
    WAVE at bytes 8-11 and plain text stay unknown."""
    from sync_cosmos_db_spark.operators.multimodal import sniff_binary_type

    cases = [
        (1, "89504E470D0A1A0A" + "00" * 4, "png"),
        (2, "FFD8FF" + "00" * 8, "jpeg"),
        (3, "52494646" + "00000000" + "57415645" + "00" * 4, "wav"),
        (4, "52494646" + "00000000" + "41564920" + "00" * 4, "unknown"),
        (5, "68656C6C6F", "unknown"),
    ]
    df = spark.createDataFrame([(i, h) for i, h, _ in cases],
                               "id long, hx string")
    got = {r.id: r.kind
           for r in df.select("id", sniff_binary_type(
               F.unhex(F.col("hx"))).alias("kind")).collect()}
    assert got == {i: k for i, _, k in cases}


def test_burstiness_metronome_vs_bursty(spark):
    """Perfectly regular arrivals → σ = 0 → B = −1; a heavy-tailed
    gap mix pushes B positive; a single gap (n_gaps < 2) is dropped."""
    import datetime as dt

    from sync_cosmos_db_spark.operators.behavioral import burstiness

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: metronome, 60 s gaps
    rows += [(1, t0 + dt.timedelta(seconds=60 * i), i) for i in range(10)]
    # user 2: 9 tiny gaps then one huge gap
    offs = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 100000]
    rows += [(2, t0 + dt.timedelta(seconds=s), 100 + i)
             for i, s in enumerate(offs)]
    # user 3: a single gap -> filtered out
    rows += [(3, t0, 200), (3, t0 + dt.timedelta(seconds=5), 201)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {r.user_id: r for r in
           burstiness(df, "user_id", "ts", "event_id").collect()}
    assert got[1].b == -1.0 and got[1].std_gap == 0.0
    assert got[2].b > 0.5
    assert 3 not in got


def test_recursive_reach_matches_bfs(spark, sf_dir):
    """X141's recursive-CTE min-hops must agree with the iterative
    DataFrame BFS (X90) on the same out-degree-2 nation graph."""
    from sync_cosmos_db_spark.operators.graph import bfs_hops
    from sync_cosmos_db_spark.queries_r6 import recursive_reach_nations
    from sync_cosmos_db_spark.session import load_table

    rec = {r.node: r.min_hops
           for r in recursive_reach_nations(spark, sf_dir).collect()}
    nation = load_table(spark, sf_dir, "nation")
    e1 = nation.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((F.col("n_nationkey") * 3 + 1) % 25).cast("long").alias("dst"))
    e2 = nation.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((F.col("n_nationkey") + 7) % 25).cast("long").alias("dst"))
    edges = e1.unionByName(e2)
    seeds = spark.createDataFrame([(0,)], "node long")
    bfs = {r.node: r.hops
           for r in bfs_hops(edges, seeds, max_hops=6).collect()}
    assert rec == bfs
