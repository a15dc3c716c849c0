"""Ground-truth unit tests for round-7 batch-3 families X182-X184."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# X182 — NDCG@k + MRR
# ---------------------------------------------------------------------------

def test_ndcg_perfect_ranking_is_one(spark):
    from sync_cosmos_db_spark.operators.retrieval import ndcg_mrr

    rows = [("q", 5.0, 1.0, 1), ("q", 4.0, 1.0, 2),
            ("q", 3.0, 0.0, 3), ("q", 2.0, 0.0, 4)]
    df = spark.createDataFrame(rows, "g string, s double, r double, i long")
    row = ndcg_mrr(df, "g", "s", "r", "i", k=10).collect()[0]
    assert row["ndcg_k"] == 1.0 and row["rr"] == 1.0


def test_ndcg_hand_computed_swap(spark):
    """Relevant item at rank 2 of 2: DCG = 1/log2(3), IDCG = 1/log2(2)
    → NDCG = log2(2)/log2(3) = 0.630930; MRR = 1/2."""
    from sync_cosmos_db_spark.operators.retrieval import ndcg_mrr

    rows = [("q", 5.0, 0.0, 1), ("q", 4.0, 1.0, 2)]
    df = spark.createDataFrame(rows, "g string, s double, r double, i long")
    row = ndcg_mrr(df, "g", "s", "r", "i", k=10).collect()[0]
    assert row["ndcg_k"] == pytest.approx(1 / math.log2(3), abs=1e-6)
    assert row["rr"] == 0.5


def test_ndcg_graded_relevance_and_k_cap(spark):
    """Graded rel (3,1) in the wrong order with k=1: DCG@1 = 1,
    IDCG@1 = 3 → NDCG = 1/3."""
    from sync_cosmos_db_spark.operators.retrieval import ndcg_mrr

    rows = [("q", 5.0, 1.0, 1), ("q", 4.0, 3.0, 2)]
    df = spark.createDataFrame(rows, "g string, s double, r double, i long")
    row = ndcg_mrr(df, "g", "s", "r", "i", k=1).collect()[0]
    assert row["ndcg_k"] == pytest.approx(1 / 3, abs=1e-6)


def test_ndcg_no_relevant_items_zero(spark):
    from sync_cosmos_db_spark.operators.retrieval import ndcg_mrr

    rows = [("q", 5.0, 0.0, 1), ("q", 4.0, 0.0, 2)]
    df = spark.createDataFrame(rows, "g string, s double, r double, i long")
    row = ndcg_mrr(df, "g", "s", "r", "i", k=10).collect()[0]
    assert row["ndcg_k"] == 0.0 and row["rr"] == 0.0


# ---------------------------------------------------------------------------
# X183 — average precision
# ---------------------------------------------------------------------------

def test_ap_hand_computed(spark):
    """Ranks (by score desc): rel at 1 and 3 of 4.
    AP = (1/1 + 2/3) / 2 = 0.833333."""
    from sync_cosmos_db_spark.operators.retrieval import average_precision

    rows = [("q", 9.0, 1, 1), ("q", 8.0, 0, 2),
            ("q", 7.0, 1, 3), ("q", 6.0, 0, 4)]
    df = spark.createDataFrame(rows, "g string, s double, r long, i long")
    row = average_precision(df, "g", "s", "r", "i").collect()[0]
    assert row["n_rel"] == 2
    assert row["ap"] == pytest.approx(5 / 6, abs=1e-6)


def test_ap_perfect_is_one_empty_is_zero(spark):
    from sync_cosmos_db_spark.operators.retrieval import average_precision

    rows = [("a", 9.0, 1, 1), ("a", 8.0, 1, 2), ("a", 7.0, 0, 3),
            ("b", 9.0, 0, 4)]
    df = spark.createDataFrame(rows, "g string, s double, r long, i long")
    out = {r["g"]: r for r in
           average_precision(df, "g", "s", "r", "i").collect()}
    assert out["a"]["ap"] == 1.0
    assert out["b"]["ap"] == 0.0


# ---------------------------------------------------------------------------
# X184 — Brier decomposition
# ---------------------------------------------------------------------------

def test_brier_perfect_forecasts(spark):
    """Forecasts equal to outcomes: brier 0, reliability 0, and
    resolution equals uncertainty (the decomposition identity at its
    extreme)."""
    from sync_cosmos_db_spark.operators.profiling import (
        brier_decomposition,
    )

    rows = [(0.95, 1.0)] * 3 + [(0.05, 0.0)] * 7
    df = spark.createDataFrame(rows, "s double, y double")
    row = brier_decomposition(df, "s", "y").collect()[0]
    assert row["brier"] == pytest.approx(
        (3 * 0.05 ** 2 + 7 * 0.05 ** 2) / 10, abs=1e-6)
    # both bins are pure: within-bin outcome rate is 0 or 1
    assert row["resolution"] == pytest.approx(row["uncertainty"],
                                              abs=1e-6)
    assert row["uncertainty"] == pytest.approx(0.3 * 0.7, abs=1e-6)


def test_brier_identity_binned(spark):
    """reliability − resolution + uncertainty must equal the BINNED
    Brier score (forecasts replaced by their bin means) — verified
    against a locally recomputed value on mixed bins."""
    from sync_cosmos_db_spark.operators.profiling import (
        brier_decomposition,
    )

    rows = [(0.12, 0.0), (0.18, 1.0), (0.45, 0.0), (0.48, 1.0),
            (0.52, 1.0), (0.88, 1.0), (0.83, 0.0), (0.91, 1.0)]
    df = spark.createDataFrame(rows, "s double, y double")
    row = brier_decomposition(df, "s", "y").collect()[0]
    # recompute binned brier locally
    bins: dict = {}
    for s, y in rows:
        b = min(int(s * 10), 9)
        bins.setdefault(b, []).append((s, y))
    n = len(rows)
    obar = sum(y for _, y in rows) / n
    rel = sum(len(v) * (sum(s for s, _ in v) / len(v)
                        - sum(y for _, y in v) / len(v)) ** 2
              for v in bins.values()) / n
    res = sum(len(v) * (sum(y for _, y in v) / len(v) - obar) ** 2
              for v in bins.values()) / n
    unc = obar * (1 - obar)
    assert row["reliability"] == pytest.approx(rel, abs=1e-6)
    assert row["resolution"] == pytest.approx(res, abs=1e-6)
    assert row["uncertainty"] == pytest.approx(unc, abs=1e-6)
    exact = sum((s - y) ** 2 for s, y in rows) / n
    assert row["brier"] == pytest.approx(exact, abs=1e-6)
