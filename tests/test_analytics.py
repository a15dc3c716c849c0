"""Snapshot diff, per-group caps, statistical profiling, bigram PMI,
and the ORC roundtrip (round-3 analytics extensions)."""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F

from sync_cosmos_db_spark.migration import snapshot_diff
from sync_cosmos_db_spark.operators.curation import cap_per_group
from sync_cosmos_db_spark.operators.profiling import (corr_pairs,
                                                      group_trend,
                                                      iqr_outliers)
from sync_cosmos_db_spark.operators.text import bigram_pmi


# --- snapshot diff ---------------------------------------------------------

def test_snapshot_diff_classifies_all_four(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "id long, v string")
    got = {r.key: r.change
           for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_vs_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "id long, v string")
    new = spark.createDataFrame([(1, "x")], "id long, v string")
    got = snapshot_diff(old, new, "id").collect()[0]
    assert got.change == "changed"


# --- per-group cap ---------------------------------------------------------

def test_cap_per_group_bounds_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(100)], "id long, grp string")
    a = cap_per_group(df, "grp", "id", 5)
    counts = {r.grp: r.n for r in
              a.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(n == 5 for n in counts.values())
    ids_a = sorted(r.id for r in a.collect())
    ids_b = sorted(r.id for r in cap_per_group(df, "grp", "id", 5).collect())
    assert ids_a == ids_b  # same rows every run — hash draw, not rand()


def test_cap_per_group_small_groups_untouched(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], "id long, grp string")
    assert cap_per_group(df, "grp", "id", 10).count() == 2


# --- profiling: correlation / trend / IQR ---------------------------------

def test_corr_pairs_exact_linear(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1.0, float(-i)) for i in range(10)],
        "x double, y double, z double")
    got = {(r.col_x, r.col_y): r.r
           for r in corr_pairs(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0


def test_corr_pairs_pairwise_null_exclusion(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, None), (4.0, 4.0)],
        "x double, y double")
    r = corr_pairs(df, ["x", "y"]).collect()[0]
    assert r.n == 3 and r.r == 1.0


def test_group_trend_recovers_line(spark):
    rows = [(1, float(x), 3.0 * x + 7.0) for x in range(10)]
    rows += [(2, float(x), -0.5 * x + 2.0) for x in range(5)]
    rows += [(3, 1.0, 5.0)]  # n=1 → dropped
    df = spark.createDataFrame(rows, "k long, x double, y double")
    got = {r.key: (r.slope, r.intercept)
           for r in group_trend(df, "k", "x", "y", min_n=2).collect()}
    assert got[1] == (3.0, 7.0)
    assert got[2] == (-0.5, 2.0)
    assert 3 not in got


def test_group_trend_zero_variance_dropped(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 1.0), (1, 2.0, 9.0), (1, 2.0, 5.0)],
        "k long, x double, y double")
    assert group_trend(df, "k", "x", "y", min_n=2).count() == 0


def test_iqr_outliers_flags_extreme(spark):
    vals = [float(v) for v in range(1, 12)] + [1000.0]  # one wild point
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, v double")
    r = iqr_outliers(df, "grp", "v").collect()[0]
    assert r.n == 12 and r.n_outliers == 1
    assert r.q1 < r.q3


# --- bigram PMI ------------------------------------------------------------

def test_bigram_pmi_collocation_beats_chance(spark):
    # "aa bb" always adjacent; "cc"/"dd" appear but never together.
    rows = [("aa bb cc",)] * 6 + [("aa bb dd",)] * 6 + [("cc aa dd",)] * 2
    df = spark.createDataFrame(rows, "text string")
    got = {(r.a, r.b): (r.n_ab, r.pmi)
           for r in bigram_pmi(df, min_count=2).collect()}
    assert got[("aa", "bb")][0] == 12
    # hand-check: B = 28 bigrams total, U = 42 tokens; c_aa = 14, c_bb = 12
    expect = math.log((12 / 28) / ((14 / 42) * (12 / 42)))
    assert abs(got[("aa", "bb")][1] - expect) < 1e-6
    # the never-adjacent pair is absent entirely
    assert ("cc", "dd") not in got


def test_bigram_pmi_min_count_prunes(spark):
    df = spark.createDataFrame([("x y",), ("x y",), ("p q",)], "text string")
    got = {(r.a, r.b) for r in bigram_pmi(df, min_count=2).collect()}
    assert got == {("x", "y")}


# --- ORC roundtrip ---------------------------------------------------------

def test_orc_roundtrip_partitioned(spark):
    from sync_cosmos_db_spark.sources.orc import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "en", "hello"), (2, "fr", "bonjour"), (3, "en", "bye")],
        "id long, lang string, body string")
    d = os.path.join(tempfile.mkdtemp(prefix="orc_t_"), "t")
    write_orc(df, d, partition_by=["lang"])
    back = read_orc(spark, d, schema="id long, body string, lang string")
    assert sorted((r.id, r.lang, r.body) for r in back.collect()) == \
        [(1, "en", "hello"), (2, "fr", "bonjour"), (3, "en", "bye")]


def test_orc_schema_pinning_drops_extra_column(spark):
    from sync_cosmos_db_spark.sources.orc import read_orc, write_orc

    df = spark.createDataFrame([(1, "x", 9)], "id long, body string, extra long")
    d = os.path.join(tempfile.mkdtemp(prefix="orc_t2_"), "t")
    write_orc(df, d)
    back = read_orc(spark, d, schema="id long, body string")
    assert back.columns == ["id", "body"]
    assert back.collect()[0].body == "x"


# --- weighted sampling (A-ES) ----------------------------------------------

def test_weighted_sample_exact_k_and_deterministic(spark):
    from sync_cosmos_db_spark.operators.curation import weighted_sample_k

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(200)], "id long, w double")
    a = sorted(r.id for r in
               weighted_sample_k(df, "id", "w", 30).collect())
    b = sorted(r.id for r in
               weighted_sample_k(df, "id", "w", 30).collect())
    assert len(a) == 30 and a == b


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from sync_cosmos_db_spark.operators.curation import weighted_sample_k

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 1.0), (4, 2.0)], "id long, w double")
    got = sorted(r.id for r in
                 weighted_sample_k(df, "id", "w", 10).collect())
    assert got == [3, 4]


def test_weighted_sample_biases_toward_heavy_rows(spark):
    from sync_cosmos_db_spark.operators.curation import weighted_sample_k

    # 50 heavy rows (w=50) vs 450 light rows (w=1): heavy mass fraction
    # is 2500/2950 ≈ 0.85, so a 100-row sample should be heavy-dominated.
    rows = [(i, 50.0) for i in range(50)]
    rows += [(i, 1.0) for i in range(50, 500)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in weighted_sample_k(df, "id", "w", 100).collect()]
    n_heavy = sum(1 for i in got if i < 50)
    assert n_heavy >= 35  # all-but-certain under A-ES; salt-deterministic
