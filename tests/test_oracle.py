"""Every registered query with an oracle must hash-match DuckDB —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare, duckdb_connect

import __spark_entry__ as entrymod


def _cases():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    return sorted(o), q, o


NAMES, _Q, _O = _cases()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, sf_dir, con, name):
    df = _Q[name](spark, sf_dir)
    compare(df, con, _O[name], name=name)


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        assert len(df.take(1)) >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
