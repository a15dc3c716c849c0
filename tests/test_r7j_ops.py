"""Ground-truth unit tests for round-7 batch-9 families X203-X206."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X203 — mixture solver
# ---------------------------------------------------------------------------

def test_mixture_solver_binding_source_keeps_rate_one(spark):
    """Natural 60/40 vs target 50/50: the under-represented source
    binds at rate 1.0, the dominant one downsamples to 2/3."""
    from sync_cosmos_db_spark.operators.curation import mixture_solver

    rows = [("a", " ".join(["t"] * 60)), ("b", " ".join(["t"] * 40))]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in
           mixture_solver(df, "source", "text",
                          {"a": 0.5, "b": 0.5}).collect()}
    assert out["b"]["sample_rate"] == 1.0
    assert out["a"]["sample_rate"] == pytest.approx(2 / 3, abs=1e-6)
    # realized mixture: 60·(2/3) = 40 vs 40 → exactly 50/50
    assert out["a"]["tokens_after"] == 40
    assert out["b"]["tokens_after"] == out["b"]["tokens"]


def test_mixture_solver_untargeted_source_dropped(spark):
    """A source absent from the targets gets rate 0 and 0 tokens."""
    from sync_cosmos_db_spark.operators.curation import mixture_solver

    rows = [("a", "x y z"), ("junk", "a b c d e")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in
           mixture_solver(df, "source", "text", {"a": 1.0}).collect()}
    assert out["junk"]["sample_rate"] == 0.0
    assert out["junk"]["tokens_after"] == 0
    assert out["a"]["sample_rate"] == 1.0


# ---------------------------------------------------------------------------
# X204 — drift gate
# ---------------------------------------------------------------------------

def test_drift_gate_identical_snapshots_pass(spark):
    """Baseline == current → every check PASSes with metric ~0."""
    from sync_cosmos_db_spark.operators.expectations import drift_gate

    df = spark.createDataFrame(
        [(float(v), c) for v in range(100) for c in ("x", "y")],
        "v double, c string")
    out = {r["check"]: r for r in
           drift_gate(df, df, "v", "c", [25.0, 50.0, 75.0]).collect()}
    assert all(r["verdict"] == "PASS" for r in out.values())
    assert out["row_count_delta"]["metric"] == 0.0
    assert out["psi_v"]["metric"] == 0.0


def test_drift_gate_flags_shift_and_new_category(spark):
    """A shifted distribution trips the PSI check; a category present
    only in current trips the domain check."""
    from sync_cosmos_db_spark.operators.expectations import drift_gate

    base = spark.createDataFrame(
        [(float(v % 20), "x") for v in range(200)], "v double, c string")
    cur = spark.createDataFrame(
        [(float(80 + v % 20), "x") for v in range(200)]
        + [(5.0, "NEW")], "v double, c string")
    out = {r["check"]: r for r in
           drift_gate(base, cur, "v", "c",
                      [25.0, 50.0, 75.0]).collect()}
    assert out["psi_v"]["verdict"] == "WARN"
    assert out["category_domain_c"]["verdict"] == "WARN"
    assert out["category_domain_c"]["metric"] == 1.0
    assert out["row_count_delta"]["verdict"] == "PASS"


def test_drift_gate_empty_baseline_null_metric(spark):
    """Empty baseline → NULL row-count metric and WARN, never inf."""
    from sync_cosmos_db_spark.operators.expectations import drift_gate

    base = spark.createDataFrame([], "v double, c string")
    cur = spark.createDataFrame([(1.0, "x")], "v double, c string")
    out = {r["check"]: r for r in
           drift_gate(base, cur, "v", "c", [5.0]).collect()}
    assert out["row_count_delta"]["metric"] is None
    assert out["row_count_delta"]["verdict"] == "WARN"


# ---------------------------------------------------------------------------
# X205 — word dropout
# ---------------------------------------------------------------------------

def test_word_dropout_deterministic_and_ordered(spark):
    """Two runs agree byte-for-byte; kept tokens preserve original
    order; position 0 always survives."""
    from sync_cosmos_db_spark.operators.text import word_dropout

    text = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    a = word_dropout(df).collect()[0]
    b = word_dropout(df).collect()[0]
    assert a["aug_text"] == b["aug_text"]
    assert a["n_tokens"] == 200
    assert 0 < a["n_kept"] < 200          # some but not all dropped
    kept = a["aug_text"].split(" ")
    assert kept[0] == "w0"                # position 0 survives
    idx = [int(w[1:]) for w in kept]
    assert idx == sorted(idx)             # original order preserved


def test_word_dropout_salts_are_independent_views(spark):
    """Different salts drop different tokens of the same doc."""
    from sync_cosmos_db_spark.operators.text import word_dropout

    text = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    a = word_dropout(df, salt="aug1").collect()[0]["aug_text"]
    b = word_dropout(df, salt="aug2").collect()[0]["aug_text"]
    assert a != b


# ---------------------------------------------------------------------------
# X206 — dispersion profile
# ---------------------------------------------------------------------------

def test_dispersion_classes(spark):
    """Constant daily counts → VMR 0 (underdispersed); one huge
    burst day among flat days → overdispersed."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        dispersion_profile,
    )

    rows = []
    for d in range(1, 11):
        rows += [("flat", dt.date(2024, 1, d))] * 5
    rows += [("burst", dt.date(2024, 1, 1))] * 50
    for d in range(2, 11):
        rows += [("burst", dt.date(2024, 1, d))] * 2
    df = spark.createDataFrame(rows, "g string, d date")
    out = {r["g"]: r for r in
           dispersion_profile(df, "g", F.col("d")).collect()}
    assert out["flat"]["vmr"] == 0.0
    assert out["flat"]["dispersion_class"] == "underdispersed"
    assert out["burst"]["dispersion_class"] == "overdispersed"
    assert out["flat"]["mean_daily"] == 5.0


def test_dispersion_single_day_null(spark):
    """One observed day → variance undefined → NULL vmr/class."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.profiling import (
        dispersion_profile,
    )

    df = spark.createDataFrame([("g", dt.date(2024, 1, 1))] * 4,
                               "g string, d date")
    r = dispersion_profile(df, "g", F.col("d")).collect()[0]
    assert r["vmr"] is None and r["dispersion_class"] is None
    assert r["n_days"] == 1
