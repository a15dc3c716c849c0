"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column-name set, and an order-insensitive canonical
value matrix (floats formatted with %.10g after in-query rounding;
timestamps normalized to UTC ISO strings)."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return "%.10g" % v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _matrix(rows, cols) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_scalar_schema(spark_df, name: str = "query") -> None:
    """Driver-canon-safe output convention (round-3 verdict item 7):
    registered oracle queries must surface only scalar-typed columns.
    The driver's canonicalizer sorts result cells with pandas, and
    list/struct/map cells are unhashable there — surface arrays as
    canonical strings (``F.array_join`` / ``array_to_string``)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [f.name for f in spark_df.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} — the driver's pandas "
        "canonicalizer cannot sort list/struct cells; emit a canonical "
        "string instead (array_join / array_to_string)")


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            name: str = "query") -> None:
    assert_scalar_schema(spark_df, name)
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}")

    sm, dm = _matrix(s_rows, s_cols), _matrix(d_rows, d_cols)
    mism = [(a, b) for a, b in zip(sm, dm) if a != b]
    assert not mism, (
        f"{name}: {len(mism)}/{len(sm)} value rows differ; first 3: {mism[:3]}")
