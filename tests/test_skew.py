"""Salted aggregation / join must be result-identical to their naive
forms (skew changes the plan, never the answer) — plus the LSH dedup
skew gate under an adversarial hot key (round-2 verdict item 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.skew import salted_agg, salted_join
from sync_cosmos_db_spark.session import load_table


def test_lsh_skew_gate_drops_hot_bucket_and_completes(spark, sf_dir):
    """Adversarial boilerplate cluster: ONE text duplicated 20,000× on
    top of the normal corpus. Ungated, every band maps the cluster to a
    single bucket and the in-row pair expansion would materialize
    20k² = 4·10⁸ pairs per band — the OOM shape. The window-count gate
    must (a) drop those buckets BEFORE collect_list, (b) leave the
    normal corpus' near-dup discovery intact, and (c) report the
    dropped buckets through the audit companion."""
    from sync_cosmos_db_spark.operators.dedup import (
        minhash_lsh_oversized_buckets,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hot = spark.range(20_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit("hot boilerplate row repeated verbatim across the corpus "
              * 3).alias("text"))
    corpus = docs.unionByName(hot)

    dropped = minhash_lsh_oversized_buckets(
        corpus, "doc_id", "text", max_bucket=100)
    n_dropped = dropped.count()
    # the hot cluster lands in one bucket per band (16 bands) — every
    # one of them must be flagged as oversized
    assert n_dropped >= 16
    assert dropped.agg(F.max("n_members")).collect()[0][0] >= 20_000

    pairs = minhash_lsh_pairs(corpus, "doc_id", "text",
                              threshold=0.5, max_bucket=100)
    hot_pairs = pairs.filter((F.col("id_a") >= 10_000_000)
                             & (F.col("id_b") >= 10_000_000))
    # completes (no 4·10⁸-row expansion), and the pathological cluster
    # contributed zero pairs — it belongs to exact dedup, not LSH
    assert hot_pairs.count() == 0


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg(li, ["l_returnflag"],
                        {"n": "count", "rev": "sum:l_extendedprice",
                         "lo": "min:l_quantity", "hi": "max:l_quantity"})
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("rev"),
        F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi"))
    a = {r.l_returnflag: (r.n, round(r.rev, 4), r.lo, r.hi)
         for r in salted.collect()}
    b = {r.l_returnflag: (r.n, round(r.rev, 4), r.lo, r.hi)
         for r in plain.collect()}
    assert a == b


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    salted = salted_join(orders, cust, ["o_custkey"], buckets=8)
    plain = orders.join(cust, "o_custkey")
    assert salted.count() == plain.count()
    a = sorted((r.o_orderkey, r.c_mktsegment)
               for r in salted.select("o_orderkey", "c_mktsegment").collect())
    b = sorted((r.o_orderkey, r.c_mktsegment)
               for r in plain.select("o_orderkey", "c_mktsegment").collect())
    assert a == b


def test_salted_join_rejects_outer(spark, sf_dir):
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(orders, cust, ["o_custkey"], how="full")
