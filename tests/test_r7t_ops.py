"""Ground-truth unit tests for round-7 batch-19 families X243-X246."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# X243 — varint posting estimator (query-level)
# ---------------------------------------------------------------------------

def test_varint_estimate_invariants(spark, sf_dir):
    """Varint bytes never exceed raw bytes; per-posting cost is
    1–4 bytes; band partition covers every token once."""
    from sync_cosmos_db_spark.queries_r7 import (
        varint_posting_estimate_docs,
    )

    rows = varint_posting_estimate_docs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["varint_bytes"] <= r["raw_bytes"]
        assert r["n_postings"] <= r["varint_bytes"] \
            <= 4 * r["n_postings"]
        assert 0 < r["size_ratio"] <= 0.5
    bands = {r["band"] for r in rows}
    assert bands <= {"hapax", "rare", "mid", "common"}


# ---------------------------------------------------------------------------
# X244 — calendar completeness (query-level)
# ---------------------------------------------------------------------------

def test_calendar_completeness_identity(spark, sf_dir):
    """present + missing == span and completeness == present/span."""
    from sync_cosmos_db_spark.queries_r7 import (
        calendar_completeness_priority,
    )

    rows = calendar_completeness_priority(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["present_days"] + r["missing_days"] == r["span_days"]
        assert r["completeness"] == pytest.approx(
            r["present_days"] / r["span_days"], abs=1e-4)


# ---------------------------------------------------------------------------
# X245 — gains table (query-level)
# ---------------------------------------------------------------------------

def test_gains_table_invariants(spark, sf_dir):
    """10 deciles of near-equal depth; cumulative capture is
    monotone and ends at 1.0; lift averages to ~1 weighted by
    rows."""
    from sync_cosmos_db_spark.queries_r7 import gains_table_orders

    rows = sorted(gains_table_orders(spark, sf_dir).collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(10))
    depths = [r["n_rows"] for r in rows]
    assert max(depths) - min(depths) <= 1
    caps = [r["cum_capture"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(caps, caps[1:]))
    assert caps[-1] == pytest.approx(1.0, abs=1e-4)
    total = sum(r["n_rows"] for r in rows)
    wavg_lift = sum(r["lift"] * r["n_rows"] for r in rows) / total
    assert wavg_lift == pytest.approx(1.0, abs=0.01)


# ---------------------------------------------------------------------------
# X246 — effective-dated conversion (query-level)
# ---------------------------------------------------------------------------

def test_effective_rate_periods_partition_orders(spark, sf_dir):
    """Every order lands in exactly one rate period; revenue in the
    rate-1.0 periods equals the raw revenue of those orders."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.queries_r7 import effective_rate_revenue
    from sync_cosmos_db_spark.session import load_table

    rows = effective_rate_revenue(spark, sf_dir).collect()
    n_total = sum(r["n_orders"] for r in rows)
    orders = load_table(spark, sf_dir, "orders")
    assert n_total == orders.count()
    # period boundaries respected: rate 1.1 rows only exist if the
    # corpus has orders in [1996-07-01, 1998-01-01)
    in_11 = orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-07-01"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01"))).count()
    got_11 = sum(r["n_orders"] for r in rows if r["rate"] == 1.1)
    assert got_11 == in_11
