"""Round-5 operators: EWMA, chi-square, winsorize, phrase search,
FD audit, categorical entropy, Z-order layout — hand-checked cases."""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import functions as F


def test_ewma_calendar_hand_case(spark):
    """3 days with a gap: calendar decay weights by DAY distance, and
    the output only contains days present in the input."""
    from sync_cosmos_db_spark.operators.temporal import ewma_calendar

    df = spark.createDataFrame(
        [("2024-01-01", 100.0), ("2024-01-02", 200.0),
         ("2024-01-05", 50.0)],
        "d string, v double").select(F.col("d").cast("date"), "v")
    out = {str(r.day): r.ewma for r in
           ewma_calendar(df, "d", "v", alpha=0.5, window_days=30)
           .collect()}
    assert out["2024-01-01"] == 100.0
    # day2: (200 + 100*0.5) / (1 + 0.5)
    assert out["2024-01-02"] == round(250 / 1.5, 4) or \
        abs(out["2024-01-02"] - 250 / 1.5) < 1e-4
    # day5: (50 + 200*0.5^3 + 100*0.5^4) / (1 + 0.125 + 0.0625)
    want = (50 + 200 * 0.125 + 100 * 0.0625) / 1.1875
    assert abs(out["2024-01-05"] - want) < 1e-4
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-05"}


def test_chi2_independence_hand_case(spark):
    """2×2 table with known chi2: [[10, 20], [30, 40]]."""
    from sync_cosmos_db_spark.operators.profiling import chi2_independence

    rows = ([("x", "u")] * 10 + [("x", "v")] * 20
            + [("y", "u")] * 30 + [("y", "v")] * 40)
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").first()
    n = 100
    exp = {("x", "u"): 30 * 40 / n, ("x", "v"): 30 * 60 / n,
           ("y", "u"): 70 * 40 / n, ("y", "v"): 70 * 60 / n}
    obs = {("x", "u"): 10, ("x", "v"): 20, ("y", "u"): 30, ("y", "v"): 40}
    want = sum((obs[k] - exp[k]) ** 2 / exp[k] for k in obs)
    assert r.n == 100 and r.n_a == 2 and r.n_b == 2 and r.dof == 1
    assert abs(r.chi2 - want) < 1e-4


def test_chi2_unobserved_cells_counted(spark):
    """A structurally-empty cell contributes its expected mass."""
    from sync_cosmos_db_spark.operators.profiling import chi2_independence

    rows = [("x", "u")] * 5 + [("y", "v")] * 5  # (x,v) and (y,u) absent
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").first()
    # perfect association on a 2x2 with equal margins: chi2 == n
    assert r.chi2 == 10.0 and r.dof == 1


def test_winsorized_stats_clamps_tails(spark):
    from sync_cosmos_db_spark.operators.profiling import winsorized_stats

    vals = [float(i) for i in range(1, 100)] + [10_000.0]  # one wild tail
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, v double")
    r = winsorized_stats(df, "grp", "v", lo=0.05, hi=0.95).first()
    assert r.n == 100
    assert r.mean_winsorized < r.mean_raw  # the tail was clamped
    assert r.p_hi < 10_000.0
    # winsorized mean is bounded by the clamp interval
    assert r.p_lo <= r.mean_winsorized <= r.p_hi


def test_phrase_search_three_terms_and_overlap(spark):
    from sync_cosmos_db_spark.operators.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a a a"), (3, "b c a"), (4, "a b")],
        "doc_id bigint, text string")
    out = {r.doc_id: (r.n_matches, r.first_pos) for r in
           phrase_search(df, "a b c").collect()}
    assert out == {1: (2, 1)}
    # repeated-term phrase with overlapping matches: 'a a' in 'a a a'
    out2 = {r.doc_id: (r.n_matches, r.first_pos) for r in
            phrase_search(df, "a a").collect()}
    assert out2 == {2: (2, 1)}


def test_fd_violations_hand_case(spark):
    from sync_cosmos_db_spark.operators.expectations import fd_violations

    df = spark.createDataFrame(
        [("s1", "en"), ("s1", "en"), ("s2", "en"), ("s2", "de"),
         ("s3", "fr")],
        "src string, lang string")
    out = {r.fd: (r.n_lhs, r.n_violating_lhs, r.max_rhs_per_lhs)
           for r in fd_violations(df, [("src", "lang"),
                                       ("lang", "src")]).collect()}
    assert out["src->lang"] == (3, 1, 2)   # s2 maps to {en, de}
    assert out["lang->src"] == (3, 1, 2)   # en maps to {s1, s2}


def test_categorical_entropy_hand_case(spark):
    from sync_cosmos_db_spark.operators.profiling import (
        categorical_entropy,
    )

    df = spark.createDataFrame(
        [("a", "k"), ("a", "k"), ("b", "k"), ("c", "k")],
        "u string, v string")
    out = {r.column_name: r for r in
           categorical_entropy(df, ["u", "v"]).collect()}
    want_u = -(0.5 * math.log2(0.5) + 0.25 * math.log2(0.25) * 2)
    assert out["u"].n_distinct == 3
    assert abs(out["u"].entropy_bits - want_u) < 1e-4
    assert abs(out["u"].gini - (1 - (0.25 + 0.0625 * 2))) < 1e-4
    assert out["v"].n_distinct == 1
    assert out["v"].entropy_bits == 0.0 and out["v"].gini == 0.0


def test_categorical_entropy_null_is_a_category(spark):
    from sync_cosmos_db_spark.operators.profiling import (
        categorical_entropy,
    )

    df = spark.createDataFrame([("a",), (None,)], "u string")
    r = categorical_entropy(df, ["u"]).first()
    assert r.n_distinct == 2 and abs(r.entropy_bits - 1.0) < 1e-4


def test_write_zordered_clusters_both_dims(spark, tmp_path):
    """Z-order layout: with 64 files over a 64×64 grid, every file's
    min-max range on EACH dimension is a small fraction of the global
    range — the property that lets parquet stats prune files for a
    predicate on either column."""
    from sync_cosmos_db_spark.sinks import write_zordered

    n = 1 << 12
    df = (spark.range(0, n)
          .select((F.col("id") % 64).alias("x"),
                  (F.col("id") / 64).cast("long").alias("y"),
                  F.col("id").alias("payload")))
    path = str(tmp_path / "z.parquet")
    write_zordered(df, path, ["x", "y"], num_files=64)

    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.agg(F.sum("payload")).first()[0] == n * (n - 1) // 2

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= 16
    spans = []
    for f in files:
        st = (spark.read.parquet(f)
              .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
              .first())
        spans.append((st[1] - st[0], st[3] - st[2]))
    # average per-file span must be far below the global span (63) on
    # BOTH dims — a 1-D sort would leave one dim at ~full span.
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert avg_x < 32 and avg_y < 32, (avg_x, avg_y)


def test_write_zordered_constant_column_ok(spark, tmp_path):
    from sync_cosmos_db_spark.sinks import write_zordered

    df = spark.range(0, 100).select(F.lit(7).alias("x"),
                                    F.col("id").alias("y"))
    path = str(tmp_path / "zc.parquet")
    write_zordered(df, path, ["x", "y"], num_files=4)
    assert spark.read.parquet(path).count() == 100
