"""Ground-truth unit tests for round-7 batch-17 families X235-X238."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# X235 — lead-time SLA (query-level; values pinned by oracle sweep)
# ---------------------------------------------------------------------------

def test_lead_time_sla_sane(spark, sf_dir):
    """p50 ≤ p90, late_rate ∈ [0,1], and every priority appears."""
    from sync_cosmos_db_spark.queries_r7 import lead_time_sla_priority

    rows = lead_time_sla_priority(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["p50_days"] <= r["p90_days"]
        assert 0.0 <= r["late_rate"] <= 1.0
        assert r["n_lines"] > 0


# ---------------------------------------------------------------------------
# X236 — header/detail reconciliation
# ---------------------------------------------------------------------------

def test_reconciliation_detects_systematic_ratio(spark):
    """Headers at exactly 2× the detail sums: 0 within 1% tolerance,
    median ratio exactly 2.0; a header with no details is counted
    separately."""
    from sync_cosmos_db_spark.operators.expectations import (
        header_detail_reconciliation,
    )

    header = spark.createDataFrame(
        [("o1", 20.0, "g"), ("o2", 40.0, "g"), ("o3", 8.0, "g")],
        "k string, h double, grp string")
    detail = spark.createDataFrame(
        [("o1", 10.0), ("o2", 15.0), ("o2", 5.0)],
        "k string, amt double")
    r = header_detail_reconciliation(
        header, detail, "k", "h", "amt", "grp").collect()[0]
    assert r["n_matched_rows"] == 2
    assert r["n_no_detail"] == 1
    assert r["n_within_tol"] == 0
    assert r["median_ratio"] == 2.0


def test_reconciliation_perfect_match(spark):
    """Identical amounts → everything within tolerance, ratio 1."""
    from sync_cosmos_db_spark.operators.expectations import (
        header_detail_reconciliation,
    )

    header = spark.createDataFrame([("o", 30.0, "g")],
                                   "k string, h double, grp string")
    detail = spark.createDataFrame([("o", 10.0), ("o", 20.0)],
                                   "k string, amt double")
    r = header_detail_reconciliation(
        header, detail, "k", "h", "amt", "grp").collect()[0]
    assert r["n_within_tol"] == 1
    assert r["median_ratio"] == 1.0
    assert r["p90_abs_pct_err"] == 0.0


# ---------------------------------------------------------------------------
# X237 — distinctive terms
# ---------------------------------------------------------------------------

def test_distinctive_terms_finds_the_marker(spark):
    """A token appearing ONLY in one group tops that group's list;
    a token uniform across groups never ranks first."""
    from sync_cosmos_db_spark.operators.text import distinctive_terms

    rows = [("a", "common zebra zebra zebra common"),
            ("a", "zebra common filler filler"),
            ("b", "common filler filler plain plain"),
            ("b", "common plain filler")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = distinctive_terms(df, top_k=2).collect()
    top = {r["source"]: r["token"] for r in out if r["rank"] == 1}
    assert top["a"] == "zebra"
    assert top["b"] == "plain"
    assert all(r["token"] != "common" or r["rank"] > 1 for r in out)


def test_distinctive_terms_rare_fluke_shrunk(spark):
    """A hapax in a tiny group scores BELOW a repeated distinctive
    token — the variance term doing its job."""
    from sync_cosmos_db_spark.operators.text import distinctive_terms

    rows = [("a", "dominant dominant dominant dominant fluke"),
            ("b", "other other other other other")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["token"]: r["z"] for r in
           distinctive_terms(df, top_k=5).collect()
           if r["source"] == "a"}
    assert out["dominant"] > out["fluke"]


# ---------------------------------------------------------------------------
# X238 — gold-label aggregation
# ---------------------------------------------------------------------------

def test_gold_labels_majority_ties_and_agreement(spark):
    """i1: 3-1 → gold 1 (dissenter a4 disagrees); i2: 2-2 → tie,
    excluded from agreement; a perfect annotator scores 1.0."""
    from sync_cosmos_db_spark.operators.curation import (
        aggregate_annotations,
    )

    rows = [("i1", "a1", 1), ("i1", "a2", 1), ("i1", "a3", 1),
            ("i1", "a4", 0),
            ("i2", "a1", 1), ("i2", "a2", 1), ("i2", "a3", 0),
            ("i2", "a4", 0)]
    df = spark.createDataFrame(rows, "item string, annotator string, "
                                     "lab int")
    out = {r["annotator"]: r for r in
           aggregate_annotations(df, "item", "annotator",
                                 "lab").collect()}
    assert out["__ties__"]["n_decided"] == 1          # i2 undecided
    assert out["a1"]["n_decided"] == 1                # only i1 counts
    assert out["a1"]["agreement_rate"] == 1.0
    assert out["a4"]["agreement_rate"] == 0.0


def test_gold_labels_odd_panel_never_ties(spark):
    """Three annotators on binary labels can never tie."""
    from sync_cosmos_db_spark.operators.curation import (
        aggregate_annotations,
    )

    rows = [(f"i{i}", a, (i + j) % 2)
            for i in range(10)
            for j, a in enumerate(["a1", "a2", "a3"])]
    df = spark.createDataFrame(rows, "item string, annotator string, "
                                     "lab int")
    out = {r["annotator"]: r for r in
           aggregate_annotations(df, "item", "annotator",
                                 "lab").collect()}
    assert out["__ties__"]["n_decided"] == 0
