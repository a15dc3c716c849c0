"""Pairwise association-rule mining: co-occurrence support, confidence
and lift over (basket, item) data — the market-basket analytics family
(which events co-occur in a user's history, which sources co-cite).

The reference has no analytics surface (SURVEY.md §2.3).  Scope is the
PAIRWISE tier of Apriori: itemsets of size 2, which covers the
dominant production use (affinity matrices, "users who X also Y") with
a fully relational plan.  Deeper itemsets would motivate FP-growth
(MLlib has one); the pairwise tier needs no tree structure.

Plan shape, and the Apriori property doing the scale work:

1. distinct (basket, item) — one basket-keyed dedup shuffle.
2. item supports — one item-keyed count; items below ``min_count``
   are dropped HERE, before any pair forms.  That is the downward-
   closure (Apriori) pruning: an infrequent item cannot participate
   in a frequent pair, so the pair join's fan-out is bounded by the
   per-basket count of FREQUENT items only — the long tail of rare
   items (the bulk of a web-scale vocabulary) never enters the
   self-join.
3. pair counts — self-join of the pruned (basket, item) on the basket
   key with ``item_a < item_b`` (each pair once), then one pair-keyed
   count.  Shuffle keys: basket, then pair.
4. metrics — supports broadcast back onto pairs (item-vocabulary
   sized), total basket count as a literal; support, confidence
   (both directions implied — emitted for a→b with a < b), and lift,
   floor-rounded for cross-engine hash checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_associations(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """(item_a, item_b, n_ab, n_a, n_b, support, confidence, lift) for
    every unordered item pair co-occurring in >= ``min_count`` baskets
    whose BOTH items also clear ``min_count`` individually (downward
    closure makes the individual gate free of false dismissals).

    ``confidence`` is P(b | a) for the emitted orientation a < b;
    ``lift`` is symmetric.  All ratios are floor-rounded to
    ``round_digits``.
    """
    p = 10 ** round_digits
    pairs_src = df.select(F.col(basket_col).alias("b"),
                          F.col(item_col).alias("i")).distinct()

    supports = (pairs_src.groupBy("i")
                .agg(F.count("*").cast("long").alias("n_i"))
                .filter(F.col("n_i") >= min_count))
    pruned = pairs_src.join(F.broadcast(supports.select("i")), "i")

    a = pruned.select("b", F.col("i").alias("item_a"))
    bb = pruned.select("b", F.col("i").alias("item_b"))
    pair_counts = (a.join(bb, "b")
                   .filter(F.col("item_a") < F.col("item_b"))
                   .groupBy("item_a", "item_b")
                   .agg(F.count("*").cast("long").alias("n_ab"))
                   .filter(F.col("n_ab") >= min_count))

    n_baskets = pairs_src.select("b").distinct().count()
    sa = supports.select(F.col("i").alias("item_a"),
                         F.col("n_i").alias("n_a"))
    sb = supports.select(F.col("i").alias("item_b"),
                         F.col("n_i").alias("n_b"))
    out = (pair_counts
           .join(F.broadcast(sa), "item_a")
           .join(F.broadcast(sb), "item_b"))

    def fr(c):
        return F.floor(c * p + F.lit(0.5)) / p

    return out.select(
        "item_a", "item_b", "n_ab", "n_a", "n_b",
        fr(F.col("n_ab") / F.lit(n_baskets)).alias("support"),
        fr(F.col("n_ab") / F.col("n_a")).alias("confidence"),
        fr((F.col("n_ab") * F.lit(n_baskets))
           / (F.col("n_a") * F.col("n_b"))).alias("lift"))
