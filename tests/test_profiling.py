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
