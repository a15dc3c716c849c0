"""Ground-truth unit tests for round-7 batch-4 families X185-X186."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X185 — accent-fold audit
# ---------------------------------------------------------------------------

def test_accent_fold_precomposed_and_combining(spark):
    from sync_cosmos_db_spark.operators.text import accent_fold_audit

    rows = [("g", "café"),            # precomposed: 4 -> 4 cps
            ("g", "café"),           # combining: 5 -> 4 cps
            ("g", "plain"),                # unchanged
            ("g", "ø")]               # no decomposition: unchanged
    df = spark.createDataFrame(rows, "g string, t string")
    row = accent_fold_audit(df, "g", "t").collect()[0]
    assert row["n_docs"] == 4
    assert row["n_changed"] == 2
    assert row["chars_before"] == 4 + 5 + 5 + 1
    assert row["chars_after"] == 4 + 4 + 5 + 1


def test_accent_fold_matches_duckdb_strip_accents(spark):
    """Differential oracle in miniature: the Python fold must agree
    with DuckDB's strip_accents on a hostile little corpus."""
    import duckdb

    from sync_cosmos_db_spark.operators.text import accent_fold_audit

    cases = ["café", "naïve Ångström",
             "й ё", "é̂", "œuvre",
             "Zürich", "ñ Ñ", "đ"]
    df = spark.createDataFrame([("g", c) for c in cases],
                               "g string, t string")
    row = accent_fold_audit(df, "g", "t").collect()[0]
    con = duckdb.connect()
    changed = before = after = 0
    for c in cases:
        d = con.execute("SELECT strip_accents(?)", [c]).fetchone()[0]
        changed += d != c
        before += len(c)
        after += len(d)
    assert row["n_changed"] == changed
    assert row["chars_before"] == before
    assert row["chars_after"] == after


# ---------------------------------------------------------------------------
# X186 — position attribution
# ---------------------------------------------------------------------------

def _ev(uid, sec, eid, typ):
    return (uid, dt.datetime(2024, 1, 1, 0, 0, sec), eid, typ)


def test_position_attribution_u_shape(spark):
    """User 1: 4 touches a,b,c,d then purchase →
    a 0.4, b 0.1, c 0.1, d 0.4.  User 2: single touch a → 1.0.
    User 3: two touches a,b → 0.5 each.  Totals per channel:
    a = 0.4+1.0+0.5 = 1.9, b = 0.1+0.5 = 0.6, c = 0.1, d = 0.4."""
    from sync_cosmos_db_spark.operators.behavioral import (
        position_attribution,
    )

    rows = [_ev(1, 0, 1, "a"), _ev(1, 1, 2, "b"), _ev(1, 2, 3, "c"),
            _ev(1, 3, 4, "d"), _ev(1, 4, 5, "purchase"),
            _ev(2, 0, 6, "a"), _ev(2, 1, 7, "purchase"),
            _ev(3, 0, 8, "a"), _ev(3, 1, 9, "b"),
            _ev(3, 2, 10, "purchase")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = {r["channel"]: r["credit"] for r in
           position_attribution(df, "purchase").collect()}
    assert out["a"] == pytest.approx(1.9, abs=1e-4)
    assert out["b"] == pytest.approx(0.6, abs=1e-4)
    assert out["c"] == pytest.approx(0.1, abs=1e-4)
    assert out["d"] == pytest.approx(0.4, abs=1e-4)


def test_position_attribution_credit_sums_to_converters(spark):
    """Total credit across channels must equal the number of
    converters WITH at least one prior touch (each sums to 1)."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.behavioral import (
        position_attribution,
    )

    rows = ([_ev(1, i, i, "t%d" % (i % 3)) for i in range(5)]
            + [_ev(1, 9, 99, "purchase"),
               _ev(2, 0, 100, "purchase"),     # converter, no touches
               _ev(3, 0, 101, "x"), _ev(3, 1, 102, "purchase")])
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = position_attribution(df, "purchase")
    total = out.agg(F.sum("credit")).collect()[0][0]
    assert total == pytest.approx(2.0, abs=1e-3)


def test_position_attribution_touches_after_conversion_ignored(spark):
    from sync_cosmos_db_spark.operators.behavioral import (
        position_attribution,
    )

    rows = [_ev(1, 0, 1, "a"), _ev(1, 1, 2, "purchase"),
            _ev(1, 2, 3, "b")]          # after conversion: no credit
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = {r["channel"]: r["credit"] for r in
           position_attribution(df, "purchase").collect()}
    assert out == {"a": 1.0}
