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


def test_lev1_case_decomposition_matches_levenshtein(con):
    """r13: the fuzzy-linkage and editdist oracles decide lev <= 1 by
    exact case decomposition (hamming at equal length, single-deletion
    -neighborhood equality at ±1, impossible beyond) instead of the
    O(len²) DP.  Pin the theorem against DuckDB's own levenshtein on
    randomized pairs — a DuckDB semantics change in mismatches() or a
    future edit to the decomposition fails here, not in a 396-query
    sweep."""
    import random

    rng = random.Random(1311)
    alpha = "ab#0123456789X"
    cases = []
    for _ in range(3000):
        n = rng.randrange(0, 14)
        s = "".join(rng.choice(alpha) for _ in range(n))
        t = list(s)
        op = rng.randrange(5)
        if op == 0 and s:                       # substitution
            i = rng.randrange(len(t)); t[i] = rng.choice(alpha)
        elif op == 1 and s:                     # deletion
            del t[rng.randrange(len(t))]
        elif op == 2:                           # insertion
            t.insert(rng.randrange(len(t) + 1), rng.choice(alpha))
        elif op == 3:                           # unrelated string
            t = [rng.choice(alpha)
                 for _ in range(rng.randrange(0, 14))]
        cases.append((s, "".join(t)))           # op 4: identical
    con.execute("CREATE OR REPLACE TABLE lev_probe(a TEXT, b TEXT)")
    con.executemany("INSERT INTO lev_probe VALUES (?, ?)", cases)
    bad = con.execute("""
        WITH vars AS (
          SELECT a, b,
                 -- CASE, not AND: DuckDB does not short-circuit, and
                 -- mismatches() errors on unequal or ZERO lengths
                 -- (the real oracles see only the equal-length join
                 -- side and non-empty fixture names)
                 (CASE WHEN a = b THEN true
                       WHEN length(a) = length(b) AND length(a) > 0
                       THEN mismatches(a, b) <= 1 ELSE false END)
                 OR (length(a) = length(b) - 1 AND EXISTS (
                      SELECT 1 FROM (SELECT unnest(generate_series(
                          1, greatest(length(lev_probe.b), 1))) AS i)
                      WHERE substr(lev_probe.b, 1, i - 1)
                            || substr(lev_probe.b, i + 1) = lev_probe.a))
                 OR (length(b) = length(a) - 1 AND EXISTS (
                      SELECT 1 FROM (SELECT unnest(generate_series(
                          1, greatest(length(lev_probe.a), 1))) AS i)
                      WHERE substr(lev_probe.a, 1, i - 1)
                            || substr(lev_probe.a, i + 1) = lev_probe.b))
                 AS decomposed
          FROM lev_probe)
        SELECT a, b, decomposed, levenshtein(a, b) AS lev
        FROM vars
        WHERE decomposed <> (levenshtein(a, b) <= 1)
    """).fetchall()
    assert not bad, f"decomposition disagrees on {len(bad)} pairs: {bad[:5]}"
