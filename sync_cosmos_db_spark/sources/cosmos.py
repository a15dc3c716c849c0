"""Cosmos DB Spark connector facade (production source/sink for O1/O13/O14).

The reference talks to Cosmos through the Python SDK one page at a time
(``/root/reference/src/migration.py:78-90``). The Spark-native
equivalent is Microsoft's open-source Spark 3 connector
(``com.azure.cosmos.spark:azure-cosmos-spark``), whose read splits map
Cosmos physical partitions onto Spark partitions — the cross-partition
fan-out the SDK does client-side (``enable_cross_partition_query=True``,
``src/migration.py:80``) becomes the cluster's natural parallelism.

This module only BUILDS reader/writer configs; it performs no I/O of its
own, so the rest of the engine stays testable without the connector jar
or a live account. ``require_connector`` gates the one call that needs
the jar.

Write-strategy mapping for the reference's per-document sinks:

* ``create_item``  (O13, ``src/migration.py:141-146``) → ``ItemAppend``
  (insert, ignore conflicts)
* ``replace_item`` (O14, ``src/migration.py:132-138``) → ``ItemOverwrite``
  (upsert)

Throughput control (the RU analog of batch_size tuning at
``src/main.py:21-22``) is ``spark.cosmos.throughputControl.*``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Connector format id (DataSource V2).
COSMOS_FORMAT = "cosmos.oltp"

WRITE_STRATEGY_INSERT = "ItemAppend"
WRITE_STRATEGY_UPSERT = "ItemOverwrite"


def connector_available(spark: SparkSession) -> bool:
    """True when the azure-cosmos-spark jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "com.azure.cosmos.spark.CosmosItemsDataSource")
        return True
    except Exception:
        return False


def require_connector(spark: SparkSession) -> None:
    if not connector_available(spark):
        raise NotImplementedError(
            "azure-cosmos-spark connector jar is not on the classpath; "
            "submit with --packages com.azure.cosmos.spark:"
            "azure-cosmos-spark_3-5_2-12:<version>. The harness uses the "
            "parquet catalog in sources/catalog.py instead.")


def throughput_control(target_ru: int | None = None,
                       target_ru_fraction: float | None = None,
                       group_name: str = "sync-cosmos-db-spark") -> dict[str, str]:
    """Public connector options bounding how many RU/s this job may
    consume — the Spark analog of the reference's ``--batch-size``
    pacing knob (``/root/reference/src/main.py:21-22``): instead of
    shrinking client pages, the connector's client-side rate limiter
    spreads the budget across executors. Pass the result as ``extra``
    to :func:`reader` / :func:`writer`."""
    if (target_ru is None) == (target_ru_fraction is None):
        raise ValueError(
            "specify exactly one of target_ru / target_ru_fraction")
    opts = {
        "spark.cosmos.throughputControl.enabled": "true",
        "spark.cosmos.throughputControl.name": group_name,
    }
    if target_ru is not None:
        opts["spark.cosmos.throughputControl.targetThroughput"] = \
            str(int(target_ru))
    else:
        opts["spark.cosmos.throughputControl.targetThroughputThreshold"] = \
            str(float(target_ru_fraction))
    return opts


def base_config(endpoint: str, key: str, database: str,
                container: str) -> dict[str, str]:
    return {
        "spark.cosmos.accountEndpoint": endpoint,
        "spark.cosmos.accountKey": key,
        "spark.cosmos.database": database,
        "spark.cosmos.container": container,
    }


def read_container(spark: SparkSession, endpoint: str, key: str,
                   database: str, container: str,
                   extra: dict[str, str] | None = None) -> DataFrame:
    """O1 — full-container scan as a DataFrame; predicate pushdown and
    partition mapping are the connector's job (the Spark replacement for
    the reference's paginated ``SELECT * FROM c``)."""
    require_connector(spark)
    opts = base_config(endpoint, key, database, container)
    opts.update(extra or {})
    return spark.read.format(COSMOS_FORMAT).options(**opts).load()


def writer(df: DataFrame, endpoint: str, key: str, database: str,
           container: str, strategy: str = WRITE_STRATEGY_UPSERT,
           extra: dict[str, str] | None = None):
    """O13/O14 — bulk writer with the given strategy; caller invokes
    ``.save()``. Task retries + the connector's 429 backoff replace the
    reference's (dead) per-item retry loop (``src/migration.py:117-148``,
    SURVEY.md O20)."""
    require_connector(df.sparkSession)
    opts = base_config(endpoint, key, database, container)
    opts["spark.cosmos.write.strategy"] = strategy
    opts.update(extra or {})
    return df.write.format(COSMOS_FORMAT).options(**opts).mode("append")
