"""Unit tests for the round-6 third-batch families (X143-X147):
planted ground truths the oracle sweep cannot reach."""

from __future__ import annotations

import datetime as dt


def test_cusum_constant_series_never_alarms(spark):
    """A constant series has sd = 0, K = H = 0, every state 0 and no
    alarms — the degenerate case must be silent, not null/throwing."""
    from sync_cosmos_db_spark.operators.profiling import cusum

    rows = [(t, 100.0) for t in range(20)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = cusum(df, "t", "v").collect()
    assert len(out) == 20
    assert all(r.s_pos == 0.0 and r.s_neg == 0.0 for r in out)
    assert not any(r.alarm_pos or r.alarm_neg for r in out)


def test_cusum_planted_drift_alarms_only_after_shift(spark):
    """30 periods at 10 then 10 at 100: the positive CUSUM must stay
    0 through the flat prefix, accumulate monotonically through the
    shifted suffix, and alarm before the series ends."""
    from sync_cosmos_db_spark.operators.profiling import cusum

    rows = [(t, 10.0) for t in range(30)] + \
           [(t, 100.0) for t in range(30, 40)]
    df = spark.createDataFrame(rows, "t long, v double")
    out = sorted(cusum(df, "t", "v").collect(), key=lambda r: r.t)
    assert all(r.s_pos == 0.0 and not r.alarm_pos for r in out[:30])
    tail = [r.s_pos for r in out[30:]]
    assert all(b > a for a, b in zip(tail, tail[1:]))
    assert out[-1].alarm_pos
    assert not any(r.alarm_neg for r in out)


def test_max_drawdown_hand_series(spark):
    """cum = [10,5,0,20,-10,-5] → peak-to-trough 30 at t=5."""
    from sync_cosmos_db_spark.operators.temporal import max_drawdown

    vals = [10.0, -5.0, -5.0, 20.0, -30.0, 5.0]
    rows = [("g", t + 1, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, t long, v double")
    r = max_drawdown(df, "grp", "t", "v").collect()[0]
    assert r.n_periods == 6
    assert r.final_value == -5.0
    assert r.max_drawdown == 30.0
    assert r.trough_t == 5


def test_max_drawdown_monotone_series_is_zero(spark):
    """A nondecreasing cumulative series has zero drawdown and the
    trough at the first period (dd = 0 everywhere, min t wins)."""
    from sync_cosmos_db_spark.operators.temporal import max_drawdown

    rows = [("g", t, 1.0) for t in range(1, 6)]
    df = spark.createDataFrame(rows, "grp string, t long, v double")
    r = max_drawdown(df, "grp", "t", "v").collect()[0]
    assert r.max_drawdown == 0.0 and r.trough_t == 1


def test_markdown_profile_counts_structures(spark):
    """Headers / lists / tables / fences count per line prefix;
    an odd fence count flags unbalanced."""
    from sync_cosmos_db_spark.operators.text import (
        markdown_structure_profile,
    )

    docs = [
        ("a", "# h1\nplain\n## h2\n- item\n| c1 | c2 |\n```\nx\n```"),
        ("a", "no structure at all"),
        ("b", "```\nunclosed fence"),
    ]
    df = spark.createDataFrame(docs, "src string, txt string")
    got = {r.src: r
           for r in markdown_structure_profile(df, "src", "txt")
           .collect()}
    assert got["a"].n_docs == 2
    assert got["a"].frac_with_header == 0.5
    assert got["a"].avg_header_lines == 1.0   # (2 + 0) / 2
    assert got["a"].frac_with_code == 0.5
    assert got["a"].unbalanced_fence_docs == 0
    assert got["b"].unbalanced_fence_docs == 1


def test_mutual_information_extremes(spark):
    """Independent columns → MI ≈ 0; a deterministic copy → MI equals
    both marginal entropies (and the joint entropy)."""
    from sync_cosmos_db_spark.operators.profiling import (
        mutual_information,
    )

    indep = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(indep, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r.n == 100 and abs(r.mi) < 1e-9

    copy = [(a, a) for a in "xyz" for _ in range(10)]
    df2 = spark.createDataFrame(copy, "a string, b string")
    r2 = mutual_information(df2, "a", "b").collect()[0]
    assert r2.mi == r2.h_a == r2.h_b == r2.h_ab > 1.0


def test_calibration_bins_gap_math(spark):
    """Binning and the |avg_score - pos_rate| gap on a hand case:
    bin 0 scores {0.01, 0.05} with outcomes {1, 0} -> avg 0.03,
    pos rate 0.5, gap 0.47."""
    from pyspark.sql import functions as F

    rows = [(0.01, 1.0), (0.05, 0.0), (0.95, 1.0)]
    df = spark.createDataFrame(rows, "score double, y double")
    out = {r.bin: r for r in
           (df.groupBy(F.least(F.floor(F.col("score") * 10), F.lit(9))
                       .cast("long").alias("bin"))
            .agg(F.avg("score").alias("s"), F.avg("y").alias("p"),
                 F.abs(F.avg("score") - F.avg("y")).alias("gap"))
            .collect())}
    assert abs(out[0].gap - 0.47) < 1e-9
    assert out[9].p == 1.0


def test_pii_cooccurrence_regex_classes(spark):
    """The three marker regexes classify independently; a doc with
    all three lands in the (T,T,T) bucket."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.queries_r6 import (
        _PII_EMAIL,
        _PII_PHONE,
        _PII_REF,
    )

    rows = [("mail u7@ex.com tel 555-1234 ref ID-000042",),
            ("just text",),
            ("call 555-9876 now",)]
    df = spark.createDataFrame(rows, "txt string")
    out = [(r.e, r.p, r.f) for r in
           df.select(F.col("txt").rlike(_PII_EMAIL).alias("e"),
                     F.col("txt").rlike(_PII_PHONE).alias("p"),
                     F.col("txt").rlike(_PII_REF).alias("f"))
           .collect()]
    assert out == [(True, True, True), (False, False, False),
                   (False, True, False)]
