"""Ground-truth unit tests for round-7 final batch X251-X254."""

from __future__ import annotations

import pytest


def test_duplicate_charges_pairs_are_valid(spark, sf_dir):
    """Every reported pair shares customer and amount, keys are
    strictly ordered, and the gap respects the window."""
    from sync_cosmos_db_spark.queries_r7 import (
        duplicate_charges_orders,
    )

    rows = duplicate_charges_orders(spark, sf_dir).collect()
    for r in rows:
        assert r["orderkey_a"] < r["orderkey_b"]
        assert 0 <= r["gap_days"] <= 7
        assert r["amount"] > 0


def test_ar_aging_partitions_open_orders(spark, sf_dir):
    """Σ bucket counts equals the number of open orders; buckets are
    from the declared set."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.queries_r7 import ar_aging_open_orders
    from sync_cosmos_db_spark.session import load_table

    rows = ar_aging_open_orders(spark, sf_dir).collect()
    assert {r["bucket"] for r in rows} <= {"0-30", "31-60",
                                           "61-90", "90+"}
    n_open = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderstatus") == "O").count())
    assert sum(r["n_orders"] for r in rows) == n_open


def test_mde_shrinks_with_sample_size(spark, sf_dir):
    """Within each metric, MDE strictly decreases as the per-arm
    size grows — the whole point of the table."""
    from sync_cosmos_db_spark.queries_r7 import mde_table_events

    rows = mde_table_events(spark, sf_dir).collect()
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r["metric"], []).append(
            (r["n_per_arm"], r["mde_abs"]))
    assert len(by_metric) == 5
    for metric, pairs in by_metric.items():
        pairs.sort()
        mdes = [m for _, m in pairs]
        assert all(a > b for a, b in zip(mdes, mdes[1:]))


def test_backfill_manifest_complements_observed(spark, sf_dir):
    """Manifest rows are exactly the holes: disjoint from observed
    days, inside each key's span, and their count matches X244's
    missing_days."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.queries_r7 import (
        calendar_completeness_priority,
    )
    from sync_cosmos_db_spark.queries_r7 import (
        backfill_manifest_priority,
    )
    from sync_cosmos_db_spark.session import load_table

    manifest = backfill_manifest_priority(spark, sf_dir).collect()
    observed = {(r["prio"], r["day"]) for r in
                load_table(spark, sf_dir, "orders")
                .select(F.col("o_orderpriority").alias("prio"),
                        F.to_date("o_orderdate").alias("day"))
                .distinct().collect()}
    for r in manifest:
        assert (r["prio"], r["day"]) not in observed
    want = {r["prio"]: r["missing_days"] for r in
            calendar_completeness_priority(spark, sf_dir).collect()}
    got = {}
    for r in manifest:
        got[r["prio"]] = got.get(r["prio"], 0) + 1
    for prio, miss in want.items():
        assert got.get(prio, 0) == miss
