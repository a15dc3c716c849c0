"""Salted aggregation / join must be result-identical to their naive
forms (skew changes the plan, never the answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.skew import salted_agg, salted_join
from sync_cosmos_db_spark.session import load_table


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
