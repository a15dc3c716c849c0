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


def test_stateful_running_totals_matches_batch(spark, sf_dir,
                                               events_stream_dir):
    """applyInPandasWithState: final per-key state == batch aggregate."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.streaming.stateful import running_user_totals

    src = SW.read_events_stream(spark, events_stream_dir)
    mem = SW.run_stream_to_memory(spark, running_user_totals(src),
                                  "stateful_parity_mem", mode="update")
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (mem.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
             .select("user_id", "n_events", "sum_value"))
    batch = (load_table(spark, sf_dir, "events").groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("value").alias("sum_value")))
    a = sorted((r.user_id, r.n_events, round(r.sum_value, 6))
               for r in final.collect())
    b = sorted((r.user_id, r.n_events, round(r.sum_value, 6))
               for r in batch.collect())
    assert a == b


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


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving AFTER its window passed the watermark is
    dropped by the stream but counted by the batch form — the bounded-
    state trade documented in streaming/windows.py. Two source files
    processed as separate micro-batches (maxFilesPerTrigger=1): file 1
    advances the watermark past the late event's window, file 2
    delivers the late event."""
    from pyspark.sql import functions as F

    d = tmp_path / "late_events"
    d.mkdir()
    schema = ("event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double, props string")

    def rows_df(rows):
        return spark.createDataFrame(rows, schema).withColumn(
            "ts_ns", (F.col("ts") * 1_000_000_000).cast("long"))

    base = 3_600 * 24 * 365 * 54  # ~2024, epoch seconds
    on_time = [(i, base + 7200 + i * 60, 1, "click", 1.0, "{}")
               for i in range(20)]                        # 02:00-02:19
    late = [(99, base + 0, 1, "click", 1.0, "{}")]        # 00:00 — late
    rows_df(on_time).select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type",
        "value", "props").coalesce(1).write.parquet(str(d / "f1.parquet"))
    rows_df(late).select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type",
        "value", "props").coalesce(1).write.parquet(str(d / "f2.parquet"))

    src_schema = schema
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        raw = (spark.readStream.schema(src_schema)
               .option("maxFilesPerTrigger", 1)
               .parquet(str(d)))
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    stream = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    agg = SW.tumbling_counts_stream(stream, "1 hour", watermark="10 minutes")
    out = SW.run_stream_to_memory(spark, agg, "late_mem", mode="append")
    streamed_windows = {r.window_start for r in out.collect()}

    batch_df = spark.createDataFrame(
        [(i, base + 7200 + i * 60, 1, "click", 1.0, "{}")
         for i in range(20)] + [(99, base, 1, "click", 1.0, "{}")],
        schema).withColumn("ts", F.timestamp_seconds("ts"))
    batch_windows = {r.window_start
                     for r in SW.tumbling_counts(batch_df, "1 hour").collect()}

    late_window = base  # 00:00 hour bucket
    assert late_window in batch_windows         # batch counts it
    assert late_window not in streamed_windows  # stream dropped it


def test_dedup_stream_drops_in_flight_duplicates(spark, tmp_path):
    """Doubled input through dropDuplicatesWithinWatermark keyed on
    event_id must emit each key exactly once; state is watermark-bounded
    (the API contract — asserted by the query plan containing the
    within-watermark dedup operator, not plain dropDuplicates)."""
    import pandas as pd

    d = tmp_path / "src"
    d.mkdir()
    base = 1_700_000_000
    pdf = pd.DataFrame({
        "event_id": list(range(50)),
        "ts": [(base + i * 60) * 1_000_000_000 for i in range(50)],
        "user_id": [i % 5 for i in range(50)],
        "event_type": ["click"] * 50,
        "value": [float(i) for i in range(50)],
        "props": ["{}"] * 50,
    })
    pdf.to_parquet(str(d / "events.parquet"))

    src = SW.read_events_stream(spark, str(d))
    doubled = src.unionByName(src)
    deduped = SW.dedup_stream(doubled, ["event_id"], watermark="10 minutes")
    assert "WithinWatermark" in deduped._jdf.queryExecution().analyzed() \
        .toString(), "must be the state-bounded dedup, not dropDuplicates"
    out = SW.run_stream_to_memory(
        spark, deduped.select("event_id", "value"), "dedup_test_mem",
        mode="append")
    rows = out.collect()
    assert len(rows) == 50
    assert {r.event_id for r in rows} == set(range(50))


def test_interval_join_stream_matches_batch(spark, sf_dir,
                                            events_stream_dir):
    """Stream-stream interval join == the identical batch join, and
    every emitted pair respects the [ts - lookback, ts] bound."""
    from pyspark.sql import functions as F

    def shape(src):
        purchases = (src.filter(F.col("event_type") == "purchase")
                     .select(F.col("event_id").alias("purchase_id"),
                             F.col("ts").alias("p_ts"), "user_id"))
        clicks = (src.filter(F.col("event_type") == "click")
                  .select(F.col("event_id").alias("click_id"),
                          F.col("ts").alias("c_ts"), "user_id"))
        return SW.interval_join_stream(purchases, clicks, key="user_id",
                                       left_ts="p_ts", right_ts="c_ts",
                                       lookback="1 hour")

    streamed = SW.run_stream_to_memory(
        spark, shape(SW.read_events_stream(spark, events_stream_dir)),
        "ivj_parity_mem", mode="append")
    batch = shape(load_table(spark, sf_dir, "events"))

    cols = ["purchase_id", "click_id", "user_id"]
    assert _rows(streamed, cols) == _rows(batch, cols)
    assert streamed.count() > 0  # the fixture data has real matches
    out_of_bound = streamed.filter(
        (F.col("c_ts") > F.col("p_ts"))
        | (F.col("c_ts") < F.col("p_ts") - F.expr("INTERVAL 1 hour")))
    assert out_of_bound.count() == 0


def test_enrich_stream_matches_batch_and_keeps_unmatched(
        spark, sf_dir, events_stream_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    # dimension deliberately missing user_ids >= 5 → those events
    # must survive with a NULL segment (left join, never drops)
    dim = (cust.filter(F.col("c_custkey") < 5)
           .select(F.col("c_custkey").alias("user_id"),
                   F.col("c_mktsegment").alias("segment")))
    batch = (ev.join(dim, "user_id", "left")
             .groupBy("segment").agg(F.count("*").alias("n")))
    src = SW.read_events_stream(spark, events_stream_dir)
    streamed = SW.run_stream_to_memory(
        spark, SW.enrich_stream(src, dim, "user_id")
        .groupBy("segment").agg(F.count("*").alias("n")),
        "enrich_test_mem", mode="complete")
    a = {(r.segment, r.n) for r in batch.collect()}
    b = {(r.segment, r.n) for r in streamed.collect()}
    assert a == b
    assert any(seg is None for seg, _ in b)

def test_read_events_stream_sniff_raises_on_mixed_and_missing(
        spark, tmp_path):
    """Round-3 ADVICE: the ts-unit sniff must iterate past unreadable
    files, refuse mixed encodings, and refuse a ts-less directory —
    never silently default to micros."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    # directory with no ts field at all -> raise
    d1 = tmp_path / "no_ts"
    d1.mkdir()
    pd.DataFrame({"x": [1, 2]}).to_parquet(str(d1 / "a.parquet"))
    with pytest.raises(ValueError, match="readable 'ts'"):
        SW.read_events_stream(spark, str(d1))

    # mixed encodings (us in one file, ns-int64 in another) -> raise
    d2 = tmp_path / "mixed"
    d2.mkdir()
    ts = pd.to_datetime(["2024-01-01 00:00:00"])
    pq.write_table(pa.table({"event_id": [1], "ts": ts.astype("datetime64[us]")}),
                   str(d2 / "a.parquet"))
    pq.write_table(pa.table({"event_id": [2],
                             "ts": np.array([10**18], dtype="int64")}),
                   str(d2 / "b.parquet"))
    with pytest.raises(ValueError, match="mixed ts encodings"):
        SW.read_events_stream(spark, str(d2))


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """Unmatched left rows emit with NULL right side once the watermark
    passes; `how` is validated."""
    import pandas as pd
    import pytest as _pytest
    from pyspark.sql import functions as F

    d = tmp_path / "ev"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 00:00:00")
    # the stream-stream watermark is the MIN across both sides, so
    # BOTH a late purchase and a late click are needed to advance it
    rows = {
        "event_id": [1, 2, 3, 100, 101],
        "ts": [base, base + pd.Timedelta("10 minutes"),
               base + pd.Timedelta("20 minutes"),
               base + pd.Timedelta("6 hours"),     # left watermark driver
               base + pd.Timedelta("6 hours")],    # right watermark driver
        "user_id": [7, 7, 8, 9, 10],
        "event_type": ["click", "purchase", "purchase", "purchase",
                       "click"],
        "value": [1.0] * 5,
        "props": ["{}"] * 5,
    }
    pd.DataFrame(rows).to_parquet(str(d / "events.parquet"))
    src = SW.read_events_stream(spark, str(d))
    p = (src.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts"), "user_id"))
    c = (src.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("ts").alias("c_ts"), "user_id"))
    with _pytest.raises(ValueError, match="left_outer"):
        SW.interval_join_stream(p, c, key="user_id", left_ts="p_ts",
                                right_ts="c_ts", how="full")
    out = SW.run_stream_to_memory(
        spark,
        SW.interval_join_stream(p, c, key="user_id", left_ts="p_ts",
                                right_ts="c_ts", lookback="1 hour",
                                watermark="10 minutes",
                                how="left_outer")
        .select("purchase_id", "click_id"),
        "ivj_outer_unit_mem", mode="append")
    got = {(r.purchase_id, r.click_id) for r in out.collect()}
    # purchase 2 (user 7) matches click 1; purchase 3 (user 8) has no
    # click and is far inside the final watermark -> NULL row emitted
    assert (2, 1) in got
    assert (3, None) in got


def test_rate_limit_batchmerge_carries_counters_across_batches(
        spark, tmp_path):
    """X160 scale form (round-7 verdict item 2): the foreachBatch
    counter merge must reproduce the live state-store semantics — a
    (user, hour) key whose admission budget is exhausted in batch 1
    admits nothing in batch 2, and a fresh key admits up to the limit
    regardless of batch position."""
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401
    from sync_cosmos_db_spark.streaming.stateful import (
        run_rate_limit_batchmerge,
    )

    d = tmp_path / "rl_src"
    d.mkdir()
    base = pd.Timestamp("2024-03-01 10:00:00")
    # batch 1: user 1 sends 7 events in hour H (limit 5 -> admit 5),
    #          user 2 sends 2 (admit 2)
    b1 = pd.DataFrame({
        "event_id": range(9),
        "ts": [base + pd.Timedelta(seconds=i) for i in range(9)],
        "user_id": [1] * 7 + [2] * 2,
        "value": [1.0] * 9,
    })
    # batch 2: user 1 sends 4 more in the SAME hour (admit 0 — budget
    # spent), user 2 sends 4 (admit 3 -> total 5), user 3 sends 6 in a
    # NEW hour (admit 5)
    b2 = pd.DataFrame({
        "event_id": range(100, 114),
        "ts": ([base + pd.Timedelta(minutes=30, seconds=i)
                for i in range(8)]
               + [base + pd.Timedelta(hours=2, seconds=i)
                  for i in range(6)]),
        "user_id": [1] * 4 + [2] * 4 + [3] * 6,
        "value": [1.0] * 14,
    })
    for i, b in enumerate((b1, b2)):
        p = d / f"b{i}.parquet"
        b.assign(ts=b["ts"].astype("datetime64[us]")).to_parquet(str(p))
        os.utime(str(p), (1_000_000_000 + i * 1000,) * 2)
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "value double")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(d)))
    out = run_rate_limit_batchmerge(
        stream, str(tmp_path / "rl_state"), limit=5)
    got = {int(r.window_start): (r.n_events, r.n_admitted, r.n_dropped)
           for r in out.collect()}
    h0 = int(base.timestamp())
    h2 = int((base + pd.Timedelta(hours=2)).timestamp())
    # hour H: 7+2 (b1) + 4+4 (b2) = 17 events; admitted 5+2 (b1) +
    # 0+3 (b2) = 10
    assert got[h0] == (17, 10, 7)
    # hour H+2: 6 events, 5 admitted
    assert got[h2] == (6, 5, 1)


class _rocksdb_provider:
    """TWS needs the RocksDB state store (column families); scope the
    provider override to the query under test."""

    def __init__(self, spark):
        self._spark = spark
        self._key = "spark.sql.streaming.stateStore.providerClass"

    def __enter__(self):
        self._old = self._spark.conf.get(self._key, None)
        self._spark.conf.set(
            self._key, "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider")

    def __exit__(self, *exc):
        if self._old is None:
            self._spark.conf.unset(self._key)
        else:
            self._spark.conf.set(self._key, self._old)


def test_rate_limit_tws_matches_live_form(spark, tmp_path):
    """Round-7 verdict item 7 — Spark 4 ``transformWithStateInPandas``
    behind a capability probe.  Since round 9 the probe PASSES in this
    sandbox (``protobuf_shim`` aliases the host Cloud SDK's public
    pure-Python protobuf runtime), so this runs the TWS rate limiter
    against the legacy ``applyInPandasWithState`` form and asserts
    identical per-window admission totals."""
    import pandas as pd
    import pytest as _pytest

    from pyspark.sql import functions as F
    from sync_cosmos_db_spark.streaming import stateful as ST

    if not ST.transform_with_state_available():
        _pytest.skip("transformWithStateInPandas unavailable: no usable "
                     "protobuf runtime in this environment")

    d = tmp_path / "tws_src"
    d.mkdir()
    base = pd.Timestamp("2024-03-01 10:00:00")
    b = pd.DataFrame({
        "event_id": range(12),
        "ts": [base + pd.Timedelta(seconds=i) for i in range(12)],
        "user_id": [1] * 8 + [2] * 4,
        "value": [1.0] * 12,
    })
    b.assign(ts=b["ts"].astype("datetime64[us]")).to_parquet(
        str(d / "b0.parquet"))
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "value double")

    def totals(make_stream_op, name):
        from sync_cosmos_db_spark.streaming.windows import (
            run_stream_to_memory,
        )
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        out = run_stream_to_memory(spark, make_stream_op(stream),
                                   name, mode="update")
        return sorted(
            (int(r.user_id), int(r.window_start),
             int(r.n_batch), int(r.n_admitted_batch))
            for r in out.groupBy("user_id", "window_start")
            .agg(F.sum("n_batch").alias("n_batch"),
                 F.sum("n_admitted_batch").alias("n_admitted_batch"))
            .collect())

    live = totals(lambda s: ST.rate_limit_stream(s, limit=5),
                  "tws_live_mem")
    with _rocksdb_provider(spark):
        tws = totals(lambda s: ST.rate_limit_stream_tws(s, limit=5),
                     "tws_new_mem")
    assert tws == live


def test_changelog_compact_tws_matches_live_form(spark, tmp_path):
    """X156's TWS twin (round-8 verdict item 5): the TWS changelog
    compactor and the legacy ``applyInPandasWithState`` form must fold
    to identical final winners per key under the (seq DESC, op ASC)
    collapse order, across multiple micro-batches."""
    import pandas as pd
    import pytest as _pytest

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W
    from sync_cosmos_db_spark.streaming import stateful as ST

    if not ST.transform_with_state_available():
        _pytest.skip("transformWithStateInPandas unavailable: no usable "
                     "protobuf runtime in this environment")

    d = tmp_path / "cdc_tws_src"
    d.mkdir()
    # two files -> two micro-batches; key 1 upserts then tombstones at
    # a higher seq, key 2's tie (seq 5) resolves op-ascending (d < u)
    b0 = pd.DataFrame({
        "o_orderkey": [1, 1, 2], "o_totalprice": [10.0, 11.0, 20.0],
        "o_orderstatus": ["O", "O", "F"], "seq": [1, 2, 5],
        "op": ["u", "u", "u"]})
    b1 = pd.DataFrame({
        "o_orderkey": [1, 2, 3], "o_totalprice": [0.0, 21.0, 30.0],
        "o_orderstatus": ["X", "F", "O"], "seq": [3, 5, 1],
        "op": ["d", "d", "u"]})
    b0.to_parquet(str(d / "b0.parquet"))
    b1.to_parquet(str(d / "b1.parquet"))
    schema = ("o_orderkey bigint, o_totalprice double, "
              "o_orderstatus string, seq bigint, op string")

    def winners(make_stream_op, name):
        from sync_cosmos_db_spark.streaming.windows import (
            run_stream_to_memory,
        )
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(d)))
        out = run_stream_to_memory(spark, make_stream_op(stream),
                                   name, mode="update")
        # emissions are monotone under the collapse order: the final
        # winner per key is the (seq DESC, op ASC) head of emissions
        w = (W.partitionBy("o_orderkey")
             .orderBy(F.desc("seq"), F.asc("op")))
        return sorted(
            (int(r.o_orderkey), int(r.seq), str(r.op),
             float(r.o_totalprice), str(r.o_orderstatus))
            for r in out.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn").collect())

    live = winners(ST.changelog_compact_stream, "cdc_tws_live_mem")
    with _rocksdb_provider(spark):
        tws = winners(ST.changelog_compact_stream_tws, "cdc_tws_new_mem")
    assert tws == live
    assert [(k, s, o) for k, s, o, *_ in tws] == [
        (1, 3, "d"), (2, 5, "d"), (3, 1, "u")]


def test_write_event_time_slices_matches_ntile(spark, sf_dir, tmp_path):
    """r18: the two-phase-rank slicer must reproduce EXACT ntile(4)
    slice membership under the global (ts, event_id) order — one file
    per slice, strictly increasing forced mtimes, schema = input
    columns (no slice column leaks into the data files)."""
    import glob

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "slices")
    os.makedirs(out)
    SW.write_event_time_slices(ev, out, n_slices=4)
    files = sorted(glob.glob(os.path.join(out, "slice_*.parquet")))
    assert [os.path.basename(f) for f in files] == [
        f"slice_{i}.parquet" for i in range(1, 5)]
    mtimes = [os.stat(f).st_mtime for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 4
    assert mtimes[-1] < 1_100_000_000  # forced, below any real mtime
    want = ev.withColumn(
        "s", F.ntile(4).over(W.orderBy("ts", "event_id")))
    for i, f in enumerate(files, start=1):
        got = spark.read.parquet(f)
        assert got.columns == ev.columns
        assert (sorted(r.event_id for r in got.select("event_id").collect())
                == sorted(r.event_id for r in
                          want.filter(F.col("s") == i)
                          .select("event_id").collect()))


def test_write_event_time_slices_fewer_rows_than_slices(spark, tmp_path):
    """n < n_slices: ntile gives the first n rows one slice each and
    the trailing slices produce no files."""
    import glob

    from pyspark.sql import functions as F

    df = (spark.range(2)
          .select((F.col("id") + 1).alias("event_id"),
                  F.timestamp_micros(F.col("id") * 1_000_000)
                  .alias("ts")))
    out = str(tmp_path / "tiny")
    os.makedirs(out)
    SW.write_event_time_slices(df, out, n_slices=4)
    files = sorted(glob.glob(os.path.join(out, "slice_*.parquet")))
    assert [os.path.basename(f) for f in files] == [
        "slice_1.parquet", "slice_2.parquet"]
    assert [r.event_id for f in files
            for r in spark.read.parquet(f).collect()] == [1, 2]
