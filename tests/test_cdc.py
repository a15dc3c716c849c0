"""CDC changelog apply (operators/cdc.py): last-writer-wins collapse,
tombstones, inserts, pass-through, and same-seq delete precedence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.cdc import (
    apply_changelog,
    collapse_changelog,
)

SNAP = "k long, v string"
CH = "k long, v string, seq long, op string"


def _apply(spark, snap_rows, ch_rows):
    snap = spark.createDataFrame(snap_rows, SNAP)
    ch = spark.createDataFrame(ch_rows, CH)
    return {r.k: r.v for r in
            apply_changelog(snap, ch, ["k"], "seq").collect()}


def test_replay_semantics_match_sequential(spark):
    out = _apply(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [
            (1, "a1", 1, "U"), (1, "a2", 2, "U"),   # latest update wins
            (2, None, 1, "D"),                       # tombstone
            (4, "new", 1, "U"),                      # insert
        ])
    assert out == {1: "a2", 3: "c", 4: "new"}


def test_delete_then_reinsert_ordered_by_seq(spark):
    out = _apply(spark, [(1, "a")],
                 [(1, None, 1, "D"), (1, "re", 2, "U")])
    assert out == {1: "re"}
    out = _apply(spark, [(1, "a")],
                 [(1, "re", 1, "U"), (1, None, 2, "D")])
    assert out == {}


def test_same_seq_delete_beats_upsert(spark):
    out = _apply(spark, [(1, "a")],
                 [(1, "u", 5, "U"), (1, None, 5, "D")])
    assert out == {}


def test_collapse_keeps_one_row_per_key(spark):
    ch = spark.createDataFrame(
        [(1, "x", 1, "U"), (1, "y", 3, "U"), (1, "z", 2, "U"),
         (2, "q", 1, "U")], CH)
    rows = collapse_changelog(ch, ["k"], "seq").collect()
    got = {r.k: (r.v, r.seq) for r in rows}
    assert len(rows) == 2
    assert got == {1: ("y", 3), 2: ("q", 1)}


def test_empty_log_is_identity(spark):
    snap = spark.createDataFrame([(1, "a"), (2, "b")], SNAP)
    ch = spark.createDataFrame([], CH)
    out = {r.k: r.v for r in
           apply_changelog(snap, ch, ["k"], "seq").collect()}
    assert out == {1: "a", 2: "b"}


def test_apply_no_cartesian_and_single_key_shuffle(spark):
    snap = spark.createDataFrame([(1, "a")], SNAP)
    ch = spark.createDataFrame([(1, "b", 1, "U")], CH)
    plan = (apply_changelog(snap, ch, ["k"], "seq")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
