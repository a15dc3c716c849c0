"""Custom stateful streaming operator (X7): per-key running aggregates
via ``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.2 A7). This is the
"custom stateful operator" seam the north star mandates — the shape you
reach for when native windowed aggs can't express the state machine
(per-entity counters, CDC folding, custom sessionization). State here is
a (count, sum) pair per key, updated per micro-batch; the same callable
serves any accumulator that fits in a row.

Scale: state lives in the state store partitioned by key — shuffle is
on the grouping key only, state size is O(distinct keys), and the
watermark bounds how long dormant keys are retained when a timeout is
configured. Arrow batches both directions (Pandas in/out).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sync_cosmos_db_spark.streaming.windows import DEFAULT_WATERMARK

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, s double"


def running_user_totals(events: DataFrame,
                        watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming per-user running (count, sum) with explicit state.
    Update mode: each micro-batch emits the keys it touched with their
    cumulative totals — the final emission per key equals the batch
    ``groupBy(user).agg(count, sum)``.

    The state callable is a self-contained CLOSURE (imports inside, no
    module-level references) so cloudpickle ships it by value and the
    Python workers don't need this package on their import path — same
    pattern as ``operators/multimodal.py``."""

    def update(key: Any, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield _pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                             "sum_value": [s]})

    ev = events.withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        update, _OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
