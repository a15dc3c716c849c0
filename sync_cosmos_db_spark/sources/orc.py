"""ORC source/sink — the columnar-interchange sibling of the parquet
path (Spark bundles native ORC support; no extra jars).

Unlike CSV/JSONL (``sources/csv.py`` / ``sources/jsonl.py``), ORC is
self-describing and columnar, so the contracts shift:

* **no corrupt-line quarantine** — a torn ORC stripe is a file-level
  fault, not a row-level one; PERMISSIVE row recovery doesn't apply.
* **predicate pushdown & column pruning work** — ORC carries min/max
  stripe statistics and bloom filters; filters reach the reader the
  same way they do for parquet (asserted in tests via
  ``PushedFilters``).
* **schema is still pinned explicitly on read** — self-describing
  files make *inference* safe, but a pipeline that trusts file schemas
  silently absorbs upstream drift; passing the expected DDL turns
  drift into an explicit cast/error instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
) -> DataFrame:
    """Read ORC; with ``schema`` the expected DDL is enforced (missing
    columns → nulls, extra columns → dropped, type drift → cast or
    analysis error) instead of trusting whatever the files carry."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write ORC, optionally hive-partitioned; zstd by default (the
    modern size/speed point; snappy for wider ecosystem reach)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
