"""Numeric profiling (operators/profiling.py) + SCD2 history
(operators/temporal.scd2_history) + free-text redaction
(sanitizer.redact_text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.profiling import (histogram_fixed,
                                                      null_profile)
from sync_cosmos_db_spark.operators.temporal import scd2_history
from sync_cosmos_db_spark.sanitizer import redact_text


def test_histogram_edges_and_clamping(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (99.9,), (150.0,), (None,)],
        "v double")
    h = {r.bucket: (r.n, r.min_v, r.max_v)
         for r in histogram_fixed(df, "v", 0.0, 100.0, 10).collect()}
    assert h[0] == (3, -5.0, 9.9)       # underflow clamps into bucket 0
    assert h[1] == (1, 10.0, 10.0)      # edge value goes to upper bucket
    assert h[9] == (2, 99.9, 150.0)     # overflow clamps into last bucket
    assert sum(n for n, _, _ in h.values()) == 6  # NULL excluded


def test_null_profile_single_scan(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (None, None)],
                               "a long, b string")
    got = {r.col_name: (r.n_rows, r.n_null)
           for r in null_profile(df, ["a", "b"]).collect()}
    assert got == {"a": (3, 1), "b": (3, 2)}


def test_scd2_collapses_runs_and_flags_current(spark):
    ups = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "a"),
         (2, 10, "x")],
        "k long, t long, v string")
    h = [(r.k, r.valid_from, r.valid_to, r.v, r.is_current)
         for r in scd2_history(ups, "k", "t", "v")
         .orderBy("k", "valid_from").collect()]
    assert h == [(1, 10, 30, "a", False), (1, 30, 40, "b", False),
                 (1, 40, None, "a", True), (2, 10, None, "x", True)]


def test_scd2_null_values_form_runs(spark):
    ups = spark.createDataFrame(
        [(1, 10, None), (1, 20, None), (1, 30, "b")],
        "k long, t long, v string")
    h = [(r.valid_from, r.valid_to, r.v)
         for r in scd2_history(ups, "k", "t", "v")
         .orderBy("valid_from").collect()]
    assert h == [(10, 30, None), (30, None, "b")]


def test_redact_text_all_patterns(spark):
    df = spark.createDataFrame(
        [("mail bob.smith@corp.io call +44 123 456 789 pay "
          "1234-5678-9012-3456 done",),
         ("clean text",)], "t string")
    out = [r.r for r in df.select(redact_text("t").alias("r")).collect()]
    assert out[0] == "mail <EMAIL> call <PHONE> pay <CARD> done"
    assert out[1] == "clean text"


def test_redact_text_multiple_occurrences(spark):
    df = spark.createDataFrame([("a@b.io then c@d.io",)], "t string")
    out = df.select(redact_text("t").alias("r")).collect()[0].r
    assert out == "<EMAIL> then <EMAIL>"


def test_mad_outliers_degenerate_group_flags_deviants(spark):
    """A group whose majority is constant has MAD = 0 — the modified
    z-score is undefined, so the operator must fall back to flagging
    every x != median instead of silently reporting 0 outliers."""
    from sync_cosmos_db_spark.operators.profiling import mad_outliers

    rows = [("a", 5.0)] * 9 + [("a", 1000.0)] + \
        [("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in mad_outliers(df, "g", "v").collect()}
    assert out["a"].mad == 0.0
    assert out["a"].n_outliers == 1  # the 1000.0 gross deviant
    assert out["b"].mad > 0


def test_conformal_calibration_rejects_oversized_sample(spark):
    import pytest

    from sync_cosmos_db_spark.operators.profiling import (
        MAX_CALIB_K, conformal_calibration)

    df = spark.createDataFrame([(1, 1, 1.0)], "id long, k long, v double")
    with pytest.raises(ValueError, match="bounded sample"):
        conformal_calibration(df, "id", "k", "v", calib_k=MAX_CALIB_K + 1)
    with pytest.raises(ValueError, match="bounded sample"):
        conformal_calibration(df, "id", "k", "v", calib_k=0)


def test_conformal_calibration_covers_held_out_fold(spark):
    """End-to-end statistical sanity on synthetic data: with enough
    calibration scores, empirical coverage on the disjoint test fold
    should land near the nominal 90%."""
    from sync_cosmos_db_spark.operators.profiling import (
        conformal_calibration,
    )

    rows = [(i, i % 7, float(i % 7) + (i * 37 % 100) / 100.0)
            for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, k long, v double")
    r = conformal_calibration(df, "id", "k", "v", calib_k=512).collect()[0]
    assert r.n_calib == 512
    assert r.n_test > 500
    assert 0.8 <= r.coverage <= 1.0
