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


def test_psi_ks_identical_samples_zero(spark):
    """Identical distributions → psi ≈ 0, ks ≈ 0."""
    from sync_cosmos_db_spark.operators.profiling import psi_ks_drift

    df = spark.createDataFrame([(float(i % 10),) for i in range(100)],
                               "x double")
    row = psi_ks_drift(df, df, "x", lo=0.0, hi=10.0,
                       n_buckets=10).collect()[0]
    assert row.n_a == 100 and row.n_b == 100
    assert row.psi == 0.0 and row.ks == 0.0


def test_psi_ks_detects_shift(spark):
    """A hard location shift between disjoint supports maximizes the
    binned KS (CDF gap → 1) and produces a large PSI."""
    from sync_cosmos_db_spark.operators.profiling import psi_ks_drift

    a = spark.createDataFrame([(1.0,)] * 50, "x double")
    b = spark.createDataFrame([(9.0,)] * 50, "x double")
    row = psi_ks_drift(a, b, "x", lo=0.0, hi=10.0,
                       n_buckets=10).collect()[0]
    assert row.ks == 1.0
    assert row.psi > 10  # two one-sided bins clamped at 1e-6

def test_benford_hand_case(spark):
    """Leading digit spans magnitudes: 1, 12, 190, 0.02 → digits
    1,1,1,2 (0.02's leading significant digit is 2); zero and
    negative values are excluded."""
    from sync_cosmos_db_spark.operators.profiling import benford_audit

    df = spark.createDataFrame(
        [(1.0,), (12.0,), (190.0,), (0.02,), (0.0,), (-5.0,)],
        "x double")
    rows = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n == 3 and rows[2].n == 1
    assert rows[1].obs_p == 0.75
    assert abs(rows[1].exp_p - round(math.log10(2), 4)) < 1e-9


def test_mad_outliers_flags_gross_point(spark):
    """29 values near 10 plus one at 1000: the IQR-robust MAD flags
    exactly the gross point."""
    from sync_cosmos_db_spark.operators.profiling import mad_outliers

    vals = [float(v) for v in range(1, 30)] + [1000.0]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, x double")
    row = mad_outliers(df, "g", "x").collect()[0]
    assert row.n == 30
    assert row.n_outliers == 1
    assert row.med == 15.5


def test_key_skew_histogram_buckets(spark):
    """Keys with counts 1, 2, 3, 8 land in log2 buckets 0, 1, 1, 3."""
    from sync_cosmos_db_spark.operators.profiling import (
        key_skew_histogram,
    )

    rows = ([("a",)] * 1 + [("b",)] * 2 + [("c",)] * 3 + [("d",)] * 8)
    df = spark.createDataFrame(rows, "k string")
    out = {r.count_bucket: r for r in
           key_skew_histogram(df, "k").collect()}
    assert out[0].n_keys == 1 and out[0].max_count == 1
    assert out[1].n_keys == 2 and out[1].total_rows == 5
    assert out[3].n_keys == 1 and out[3].max_count == 8


def test_last_touch_attribution_direct_and_tiebreak(spark):
    """u1: click then purchase → click.  u2: purchase first → direct.
    u3: two touches at the SAME timestamp → higher event_id wins."""
    from sync_cosmos_db_spark.operators.behavioral import (
        last_touch_attribution,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "click"),
         (2, "2024-01-01 11:00:00", 1, "purchase"),
         (3, "2024-01-02 09:00:00", 2, "purchase"),
         (4, "2024-01-02 10:00:00", 2, "view"),
         (5, "2024-01-03 08:00:00", 3, "view"),
         (6, "2024-01-03 08:00:00", 3, "signup"),
         (7, "2024-01-03 09:00:00", 3, "purchase")],
        "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.channel: r.n_converters for r in
           last_touch_attribution(df, "purchase").collect()}
    assert out == {"click": 1, "direct": 1, "signup": 1}


def test_rolling_active_users_window_edges(spark):
    """u1 active on day 1 counts for days 1..7 that exist in the data;
    day 8 only counts its own user."""
    from sync_cosmos_db_spark.operators.behavioral import (
        rolling_active_users,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1),
         (2, "2024-01-07 00:00:00", 2),
         (3, "2024-01-08 00:00:00", 2)],
        "event_id long, ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {str(r.day): r.active_users for r in
           rolling_active_users(df, window_days=7).collect()}
    # present days only: 01, 07, 08
    assert out == {"2024-01-01": 1, "2024-01-07": 2, "2024-01-08": 1}


def test_vocab_growth_first_occurrence_identity(spark):
    """Bucket 0 introduces {a,b}; bucket 1 re-uses a and adds c:
    cum_vocab = 2 then 3, new_types = 2 then 1."""
    from sync_cosmos_db_spark.operators.text import vocab_growth

    df = spark.createDataFrame(
        [(0, "a b a"), (50, "a c")], "doc_id long, text string")
    out = {r.bucket: r for r in
           vocab_growth(df, bucket_size=50).collect()}
    assert out[0].cum_tokens == 3 and out[0].cum_vocab == 2
    assert out[0].new_types == 2
    assert out[1].cum_tokens == 5 and out[1].cum_vocab == 3
    assert out[1].new_types == 1


def test_theil_sen_ignores_gross_outlier(spark):
    """y = 2x exactly except one corrupted point: OLS would bend, the
    pairwise-slope median stays at 2."""
    from sync_cosmos_db_spark.operators.profiling import theil_sen_slope

    pts = [(float(x), 2.0 * x) for x in range(10)]
    pts[5] = (5.0, 1000.0)
    df = spark.createDataFrame([("g", x, y) for x, y in pts],
                               "g string, x double, y double")
    row = theil_sen_slope(df, "g", "x", "y").collect()[0]
    assert row.n_points == 10 and row.n_pairs == 45
    assert row.slope == 2.0


def test_flesch_hand_case(spark):
    """'The cat sat. The dog ran.' — 6 words, 2 sentences, 6 vowel
    groups → 206.835 − 1.015·3 − 84.6·1 = 119.19."""
    from sync_cosmos_db_spark.operators.text import flesch_reading_ease

    df = spark.createDataFrame([("The cat sat. The dog ran.",)],
                               "text string")
    got = df.select(flesch_reading_ease("text").alias("f")).collect()[0].f
    assert abs(got - (206.835 - 1.015 * 3 - 84.6 * 1)) < 1e-9


def test_embedding_dim_stats_dead_dim_and_outlier(spark):
    """dim 0 is constant (std=0, outlier comparison never fires); dim 1
    has one gross outlier among tight values."""
    from sync_cosmos_db_spark.operators.profiling import (
        embedding_dim_stats,
    )

    vecs = [[1.0, 0.0] for _ in range(29)] + [[1.0, 100.0]]
    df = spark.createDataFrame([(v,) for v in vecs],
                               "embedding array<double>")
    out = {r.dim: r for r in embedding_dim_stats(df).collect()}
    assert out[0].std == 0.0 and out[0].n_outliers == 0
    assert out[1].n_outliers == 1
    assert out[0].n == 30 and out[1].n == 30


def test_poisson_bootstrap_deterministic_and_sane(spark):
    """Same inputs → bit-identical CI across runs; the interval
    brackets the point mean; weights average ≈ 1 (Poisson(1))."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        poisson_bootstrap_ci,
    )

    df = spark.createDataFrame([(i, float(100 + (i * 37) % 50))
                                for i in range(400)],
                               "k long, x double")
    r1 = poisson_bootstrap_ci(df, "k", "x", n_resamples=30).collect()[0]
    r2 = poisson_bootstrap_ci(df, "k", "x", n_resamples=30).collect()[0]
    assert r1 == r2
    assert r1.ci_lo <= r1.mean_point <= r1.ci_hi
    assert r1.n_rows == 400 and r1.n_resamples == 30
    # the interval is non-degenerate but far narrower than the range
    assert 0 < r1.ci_hi - r1.ci_lo < 50


def test_power_iteration_finds_planted_direction(spark):
    """Points spread along (1,1,0)/√2 with small noise on other axes:
    the top PC must align with the planted direction (|cos| > 0.99)
    and the eigenvalue must dominate the noise scale."""
    import math

    from sync_cosmos_db_spark.operators.profiling import (
        power_iteration_pc,
    )

    rows = []
    for i in range(200):
        t = (i - 100) / 10.0        # spread ±10 along the direction
        noise = ((i * 37) % 7 - 3) / 50.0   # deterministic small noise
        rows.append(([t / math.sqrt(2), t / math.sqrt(2), noise],))
    df = spark.createDataFrame(rows, "embedding array<double>")
    out = {r.dim: r for r in
           power_iteration_pc(df, "embedding", n_iter=5).collect()}
    v = [out[i].loading for i in range(3)]
    cos = abs((v[0] + v[1]) / math.sqrt(2))
    assert cos > 0.99
    assert out[0].eigenvalue > 1.0
