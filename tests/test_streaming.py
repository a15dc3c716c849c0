"""Structured Streaming parity tests (X7): the streaming forms must
produce the batch-mode results (same expressions, availableNow trigger,
memory sink)."""

from __future__ import annotations

import os

import pytest

from sync_cosmos_db_spark.session import load_table
from sync_cosmos_db_spark.streaming import windows as SW


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("events_stream")
    os.symlink(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _rows(df, key_cols):
    return sorted(tuple(r[c] for c in key_cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream_dir):
    batch = SW.tumbling_counts(load_table(spark, sf_dir, "events"))
    stream_src = SW.read_events_stream(spark, events_stream_dir)
    streamed = SW.run_stream_to_memory(
        spark, SW.tumbling_counts_stream(stream_src), "tumbling_mem",
        mode="complete")
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(batch, cols) == _rows(streamed, cols)


def test_session_stream_emits_finalized_sessions(spark, sf_dir,
                                                 events_stream_dir):
    """Append-mode session windows emit only watermark-finalized
    sessions — every emitted row must match the batch result exactly;
    rows inside the final watermark horizon may be withheld."""
    batch = SW.session_counts(load_table(spark, sf_dir, "events"))
    stream_src = SW.read_events_stream(spark, events_stream_dir)
    streamed = SW.run_stream_to_memory(
        spark, SW.session_counts_stream(stream_src), "session_mem",
        mode="append")
    cols = ["session_start", "user_id", "n_events", "sum_value"]
    batch_rows = set(_rows(batch, cols))
    stream_rows = set(_rows(streamed, cols))
    assert stream_rows, "no finalized sessions emitted"
    assert stream_rows <= batch_rows
    # the watermark horizon is 10 minutes of a 30-day stream: nearly all
    # sessions must be finalized
    assert len(stream_rows) >= 0.95 * len(batch_rows)
