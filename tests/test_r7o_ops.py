"""Ground-truth unit tests for round-7 batch-14 families X223-X226."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X223 — PPS systematic sampling
# ---------------------------------------------------------------------------

def test_pps_total_picks_and_heavy_row(spark):
    """Σ n_picks lands within ±1 of the slot count, a row carrying
    half the mass gets ~half the picks, and reruns are identical."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.curation import (
        pps_systematic_sample,
    )

    rows = [(0, 5000.0)] + [(i, 10.0) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "k long, w double")
    out = pps_systematic_sample(df, "k", "w", 20).collect()
    total_picks = sum(r["n_picks"] for r in out)
    assert 19 <= total_picks <= 21
    heavy = {r["k"]: r["n_picks"] for r in out}[0]
    assert 8 <= heavy <= 12          # ~half the 20 slots
    again = pps_systematic_sample(df, "k", "w", 20).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pps_uniform_weights_evenly_spread(spark):
    """Equal weights → every picked row has exactly one pick and no
    key repeats."""
    from sync_cosmos_db_spark.operators.curation import (
        pps_systematic_sample,
    )

    df = spark.createDataFrame([(i, 1.0) for i in range(1000)],
                               "k long, w double")
    out = pps_systematic_sample(df, "k", "w", 10).collect()
    assert all(r["n_picks"] == 1 for r in out)
    assert 9 <= len(out) <= 11


# ---------------------------------------------------------------------------
# X224 — embedding mean pooling
# ---------------------------------------------------------------------------

def test_mean_pool_hand_vectors(spark):
    """[1,0] and [0,1] pool to [.5,.5]; renorm gives 1/√2 each."""
    from sync_cosmos_db_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    df = spark.createDataFrame(
        [("g", [1.0, 0.0]), ("g", [0.0, 1.0])],
        "label string, embedding array<float>")
    out = {r["dim"]: r for r in
           mean_pool_embeddings(df, "label", "embedding").collect()}
    assert out[0]["pooled"] == 0.5 and out[1]["pooled"] == 0.5
    assert out[0]["pooled_renorm"] == pytest.approx(0.707107, abs=1e-6)


def test_mean_pool_zero_vector_null_renorm(spark):
    """An all-zero group has no direction — renorm is NULL, not a
    division error."""
    from sync_cosmos_db_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    df = spark.createDataFrame(
        [("z", [0.0, 0.0, 0.0])], "label string, embedding array<float>")
    out = mean_pool_embeddings(df, "label", "embedding").collect()
    assert all(r["pooled_renorm"] is None for r in out)
    assert all(r["pooled"] == 0.0 for r in out)


# ---------------------------------------------------------------------------
# X225 — retention power-law fit
# ---------------------------------------------------------------------------

def test_retention_fit_recovers_power_law(spark):
    """A corpus engineered so r(t) = t^(-1) exactly (100 users day 0,
    100/t users active at offset t) → projected r(6) ≈ 1/6 and the
    observed rows match the construction."""
    from sync_cosmos_db_spark.operators.behavioral import (
        retention_curve_fit,
    )

    base = dt.datetime(2024, 1, 1, 9)
    rows = []
    for u in range(100):
        rows.append((f"u{u}", base))
    for t in range(1, 6):
        for u in range(100 // t):
            rows.append((f"u{u}", base + dt.timedelta(days=t)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {(r["kind"], r["t_days"]): r["retention"] for r in
           retention_curve_fit(df, project_days=1).collect()}
    assert out[("observed", 1)] == 1.0
    assert out[("observed", 5)] == 0.2
    assert out[("projected", 6)] == pytest.approx(1 / 6, abs=0.01)


def test_retention_fit_kinds_partition_horizon(spark):
    """Observed rows stop at the data horizon; projected rows are
    exactly the requested count beyond it."""
    from sync_cosmos_db_spark.operators.behavioral import (
        retention_curve_fit,
    )

    base = dt.datetime(2024, 2, 1, 9)
    rows = [(f"u{u}", base) for u in range(10)]
    rows += [(f"u{u}", base + dt.timedelta(days=d))
             for d in (1, 2, 3) for u in range(6 - d)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = retention_curve_fit(df, project_days=2).collect()
    obs = [r for r in out if r["kind"] == "observed"]
    proj = sorted(r["t_days"] for r in out if r["kind"] == "projected")
    assert max(r["t_days"] for r in obs) == 3
    assert proj == [4, 5]


# ---------------------------------------------------------------------------
# X226 — KWIC snippets (query-level)
# ---------------------------------------------------------------------------

def test_kwic_snippets_query(spark, sf_dir):
    """Every row's snippet contains the pattern; first_pos is the
    true first occurrence; n_occ ≥ 1; docs without the pattern are
    absent."""
    from sync_cosmos_db_spark.queries_r7 import kwic_snippets_documents
    from sync_cosmos_db_spark.session import load_table

    out = kwic_snippets_documents(spark, sf_dir).collect()
    assert out, "pattern should occur in the corpus"
    texts = {r["doc_id"]: r["text"] for r in
             load_table(spark, sf_dir, "documents").collect()}
    for r in out:
        assert "merge batch" in r["snippet"]
        assert texts[r["doc_id"]].find("merge batch") + 1 == r["first_pos"]
        assert r["n_occ"] >= 1
    n_expected = sum(1 for t in texts.values() if "merge batch" in t)
    assert len(out) == n_expected
