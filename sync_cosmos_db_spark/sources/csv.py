"""CSV source/sink — the tabular-interchange twin of the JSONL module.

Same 100 TB contracts as :mod:`sources.jsonl` (explicit schema over
double-pass inference, PERMISSIVE corrupt-line quarantine-as-rows,
hive-partitioned pruned layout), plus the contracts CSV adds on top:

* **header/quote/escape pinning** — CSV has no self-describing types;
  a pipeline that doesn't pin the dialect reparses differently per
  writer.  Options here are explicit, never inferred.
* **multiLine stays OFF** — quoted embedded newlines force whole-file
  parsing, which destroys input splitting (one task per FILE, not per
  128 MB block).  At 100 TB that's the difference between a parallel
  scan and a handful of straggler tasks, so documents with newlines
  belong in JSONL/parquet, not CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sync_cosmos_db_spark.sources.jsonl import CORRUPT_COL


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    sep: str = ",",
    sample_rows: int = 1000,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read CSV with an explicit DDL schema or one inferred from a
    bounded ``sample_rows`` head sample (never a second full pass over
    the dataset).  Lines that don't parse under the schema surface as
    rows with the raw line in ``_corrupt_record`` (PERMISSIVE) for the
    validity-quarantine operator, instead of failing the job."""
    if schema is None:
        sampled = (spark.read.format("text").load(path)
                   .limit(sample_rows + (1 if header else 0)))
        schema_struct = (spark.read
                         .option("header", str(header).lower())
                         .option("sep", sep)
                         .option("inferSchema", "true")
                         .csv(sampled.rdd.map(lambda r: r.value))).schema
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
            .option("header", str(header).lower())
            .option("sep", sep)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .option("multiLine", "false")
            .csv(path, schema=schema_struct))


def write_csv(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    header: bool = True,
    sep: str = ",",
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write CSV, optionally hive-partitioned and compressed; the
    dialect (header/sep) is pinned explicitly so round-trips are
    byte-stable."""
    w = (df.write.mode(mode)
         .option("header", str(header).lower())
         .option("sep", sep))
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
