"""Bucketed-layout proof: a join of two tables bucketed on the join key
runs WITHOUT any shuffle exchange — the 100 TB co-location story for a
persistent migration target (SCALING.md)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sync_cosmos_db_spark.session import load_table
from sync_cosmos_db_spark.sources import spark_catalog as SC


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_warehouse")
    SC.create_database(spark, "bucketdb", str(loc))
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucket_db):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey")
    SC.save_bucketed(orders, f"{bucket_db}.orders_b", ["o_custkey"], 8)
    SC.save_bucketed(cust, f"{bucket_db}.cust_b", ["o_custkey"], 8)
    assert "orders_b" in SC.list_tables(spark, bucket_db)  # O5/O16

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(f"{bucket_db}.orders_b")
                  .join(spark.table(f"{bucket_db}.cust_b"), "o_custkey"))
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located
        # and the result is right
        expected = orders.join(cust, "o_custkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
