"""JSONL (newline-delimited JSON) source/sink — the training-data
interchange format.

The reference's data model is JSON documents pulled from a document
store (``/root/reference/src/cosmos_reader.py:33`` materializes every
container document as a Python dict); a Spark-native pipeline meets the
same corpora as JSONL files on object storage. Spark's native
``read.json`` / ``write.json`` IS the engine here — this module pins
the contracts that matter at 100 TB:

* **explicit schema beats inference** — schema inference reads the data
  TWICE (once to sample, once to load) and silently widens types;
  :func:`read_jsonl` requires a schema or derives one from a bounded
  sample via the same ``schema_of_json`` path as the document model.
* **corrupt-record tolerance** — a 100 TB crawl always contains broken
  lines; PERMISSIVE mode with a named corrupt column quarantines them
  as rows (the same poison-blob posture as the multimodal decoder)
  instead of failing the job.
* **partitioned layout** — `partition_by` produces the
  hive-partitioned directory layout downstream readers prune on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sample_rows: int = 1000,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL with an explicit schema (DDL string) or one inferred
    from a bounded ``sample_rows`` head sample — never a full
    inference pass over the dataset. Malformed lines surface as rows
    with every data column null and the raw line in
    ``_corrupt_record`` (PERMISSIVE), so downstream can quarantine
    them with the validity operator instead of losing the job."""
    if schema is None:
        sampled = (spark.read.format("text").load(path)
                   .limit(sample_rows))
        inferred = spark.read.json(
            sampled.rdd.map(lambda r: r.value)).schema
        schema_struct = inferred
    else:
        from pyspark.sql.types import _parse_datatype_string
        schema_struct = _parse_datatype_string(schema)
    if keep_corrupt:
        from pyspark.sql.types import StringType, StructField
        names = {f.name for f in schema_struct.fields}
        if CORRUPT_COL not in names:
            schema_struct = schema_struct.add(
                StructField(CORRUPT_COL, StringType(), True))
    return (spark.read
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path, schema=schema_struct))


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write JSONL, optionally hive-partitioned (downstream readers
    prune partition directories) and compressed (gzip splits per file —
    acceptable because Spark writes one file per task, sized by the
    upstream partitioning)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
