"""Fidelity regression tests for the local DuckDB-oracle replica
(tests/oracle_utils.py) — round-9 verdict item 2.

Round 9 shipped five driver hash failures while the local sweep was
green, because the replica compared via ``fetchall()`` (hiding the
HUGEINT→float64 pandas dtype divergence the driver sees) and formatted
floats with ``%.10g`` (hiding an 11th-significant-digit cent flip).
These tests pin the replica's driver-faithful behavior so neither
blind spot can regress:

* an uncast DuckDB ``sum()`` (HUGEINT → float64) against a no-NULL
  Spark int64 column MUST fail kind-parity;
* floats MUST be compared at full shortest-roundtrip precision;
* a NULL-bearing integer column (both sides promote to float64) MUST
  still pass — the reason null-bearing uncast sums never failed at
  the driver;
* Spark DATE (``datetime.date`` after toPandas) vs DuckDB DATE
  (midnight Timestamp after ``.df()``) MUST compare equal.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_utils import compare


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_uncast_hugeint_sum_fails_kind_parity(spark, con):
    sdf = spark.sql("SELECT CAST(3 AS BIGINT) AS s")
    with pytest.raises(AssertionError, match="numeric-kind"):
        compare(sdf, con, "SELECT sum(x) AS s FROM (VALUES (1),(2)) t(x)",
                name="hugeint_probe")


def test_cast_bigint_sum_passes(spark, con):
    sdf = spark.sql("SELECT CAST(3 AS BIGINT) AS s")
    compare(sdf, con,
            "SELECT sum(x)::BIGINT AS s FROM (VALUES (1),(2)) t(x)",
            name="bigint_probe")


def test_floats_compared_at_full_precision(spark, con):
    # 0.1 + 0.2 = 0.30000000000000004 != 0.3; %.10g printed both as 0.3
    sdf = spark.sql("SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS v")
    with pytest.raises(AssertionError, match="value rows differ"):
        compare(sdf, con, "SELECT 0.3::DOUBLE AS v", name="ulp_probe")
    compare(sdf, con, "SELECT 0.1::DOUBLE + 0.2::DOUBLE AS v",
            name="ulp_probe_eq")


def test_null_bearing_int_column_passes(spark, con):
    # NULL promotes BOTH pandas sides to float64 — dtype parity holds,
    # values (including the <null> marker) match.
    sdf = spark.sql(
        "SELECT * FROM VALUES (1, CAST(10 AS BIGINT)), (2, CAST(NULL AS BIGINT)) "
        "AS t(k, v)")
    compare(sdf, con,
            "SELECT * FROM (VALUES (1, 10), (2, NULL)) t(k, v)",
            name="null_int_probe")


def test_date_vs_midnight_timestamp_normalization(spark, con):
    sdf = spark.sql("SELECT DATE '1995-01-01' AS d")
    compare(sdf, con, "SELECT DATE '1995-01-01' AS d", name="date_probe")
