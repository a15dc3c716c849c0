"""sync_cosmos_db_spark — a PySpark-native analytics/ETL engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo ``shradayshakya/SYNC_COSMOS_DB`` (a
single-threaded Cosmos DB account-migration utility), re-expressed as
set-at-a-time DataFrame plans and extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
the north star mandates.

Design stance (100 TB posture):

* Everything is a declarative DataFrame plan — Catalyst handles predicate
  pushdown, column pruning, join strategy selection; AQE handles skew.
* The reference's per-document point-read loop (one network RTT per doc,
  ``src/migration.py:119-146`` in the reference) becomes ONE left outer
  join keyed on (id, partition-key columns).
* No driver-side ``collect()`` of data — metrics via ``observe()``.
* Python in the hot path only as Arrow-batched Pandas UDFs, and only
  where built-in functions genuinely can't express the semantics.
"""

from sync_cosmos_db_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
