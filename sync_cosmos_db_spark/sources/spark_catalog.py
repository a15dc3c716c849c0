"""Spark-catalog DDL variant: managed tables, partitioning, bucketing.

The filesystem catalog (``sources/catalog.py``) is the harness form of
the account/database/container hierarchy; this module is the
Spark-native catalog form of the same DDL operators — ``CREATE DATABASE
IF NOT EXISTS`` (O15), ``CREATE TABLE IF NOT EXISTS`` with layout
options (O16), catalog listing (O4/O5) — plus the one layout feature
that matters most for a persistent migration target at 100 TB:
**bucketing**.

A target table bucketed on the merge key makes the classify join (O6)
completely shuffle-free: both sides' bucket files are co-located by
key, so the SortMergeJoin reads matching buckets directly — no Exchange
on either side (asserted in tests/test_bucketing.py). Re-running a
container migration every day against a 100 TB target without bucketing
re-shuffles the target every run; with bucketing the shuffle happens
once, at layout time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_database(spark: SparkSession, name: str,
                    location: str | None = None) -> None:
    """O15, catalog form."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}")


def list_databases(spark: SparkSession) -> list[str]:
    """O4, catalog form."""
    return sorted(db.name for db in spark.catalog.listDatabases())


def list_tables(spark: SparkSession, database: str) -> list[str]:
    """O5, catalog form."""
    return sorted(t.name for t in spark.catalog.listTables(database))


def save_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                  n_buckets: int = 32, sort: bool = True,
                  mode: str = "overwrite") -> None:
    """O16 + layout: persist as a managed parquet table bucketed (and
    sorted) on the join/merge key. Readers joining two tables bucketed
    on the same key with the same bucket count get a shuffle-free,
    sort-cheap SortMergeJoin."""
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(n_buckets, *bucket_cols))
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)
