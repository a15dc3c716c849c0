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


def test_foreachbatch_compaction_cross_batch_winner(spark, tmp_path):
    """X156 scale form (run_changelog_compaction): conflicting events
    for one key arriving in DIFFERENT micro-batches must resolve to
    the same winner the batch collapse picks — including a stale
    update arriving in a LATER batch (must lose) and an equal-seq
    tombstone (must win)."""
    from sync_cosmos_db_spark.streaming.stateful import (
        run_changelog_compaction,
    )

    # batch files written separately so maxFilesPerTrigger=1 delivers
    # them as genuinely separate micro-batches, in name order
    feed = str(tmp_path / "feed")
    b1 = [(1, "v1", 5, "U"), (2, "x1", 1, "U"), (3, "t0", 2, "U")]
    b2 = [(1, "stale", 2, "U"),          # older seq arrives later: loses
          (2, "x2", 7, "U"),             # newer seq arrives later: wins
          (3, None, 2, "D")]             # equal seq tombstone: wins
    spark.createDataFrame(b1, CH).coalesce(1).write.mode(
        "overwrite").parquet(feed + "/part=0")
    spark.createDataFrame(b2, CH).coalesce(1).write.mode(
        "overwrite").parquet(feed + "/part=1")
    stream = (spark.readStream
              .schema(CH + ", part int")
              .option("maxFilesPerTrigger", 1)
              .parquet(feed))
    out = run_changelog_compaction(
        stream.drop("part"), str(tmp_path / "state"), ["k"], "seq")
    rows = {r.k: (r.v, r.seq, r.op) for r in out.collect()}
    assert rows[1] == ("v1", 5, "U")
    assert rows[2] == ("x2", 7, "U")
    assert rows[3] == (None, 2, "D")


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
