"""Association rules: hand-computed metrics, Apriori pruning, pair
orientation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.assoc import pair_associations

ROWS = [
    (1, "x"), (1, "y"), (1, "z"),
    (2, "x"), (2, "y"),
    (3, "x"), (3, "y"),
    (4, "x"),
    (5, "rare"),
]


def test_hand_computed_support_confidence_lift(spark):
    df = spark.createDataFrame(ROWS, "b long, i string")
    out = {(r.item_a, r.item_b): r for r in
           pair_associations(df, "b", "i", min_count=2).collect()}
    # x: 4 baskets, y: 3, z: 1 (pruned), rare: 1 (pruned); N = 5
    assert set(out) == {("x", "y")}
    r = out[("x", "y")]
    assert (r.n_ab, r.n_a, r.n_b) == (3, 4, 3)
    assert r.support == 0.6            # 3/5
    assert r.confidence == 0.75        # 3/4 (P(y|x), a<b orientation)
    assert r.lift == 1.25              # 3*5/(4*3)


def test_apriori_pruning_drops_rare_items_before_pairing(spark):
    # "z" co-occurs with x and y in basket 1 but has support 1 < 2:
    # downward closure says no frequent pair can contain it.
    df = spark.createDataFrame(ROWS, "b long, i string")
    out = pair_associations(df, "b", "i", min_count=2)
    items = {r.item_a for r in out.collect()} | \
        {r.item_b for r in out.collect()}
    assert "z" not in items and "rare" not in items


def test_duplicate_basket_rows_count_once(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")],
        "b long, i string")
    r = pair_associations(df, "b", "i", min_count=2).collect()
    assert len(r) == 1 and r[0].n_ab == 2 and r[0].n_a == 2


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
