"""Round-6 operator families (sixth batch) X157-X159: STL-lite
seasonal decomposition, an autocomplete prefix index, and the 2-D
Pareto frontier (skyline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X157 — STL-lite decomposition (trend / weekly seasonal / residual)
# ---------------------------------------------------------------------------

@query(
    "decompose_daily_events",
    """
    WITH s AS (SELECT ts::DATE AS day, count(*)::DOUBLE AS v
               FROM events GROUP BY 1),
    tr AS (SELECT day, v,
                  CASE WHEN count(*) OVER w7 = 7
                       THEN floor(avg(v) OVER w7 * 1000000 + 0.5)
                            / 1000000
                  END AS trend
           FROM s
           WINDOW w7 AS (ORDER BY day
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    dt AS (SELECT *, dayofweek(day) AS dow, v - trend AS det
           FROM tr),
    se AS (SELECT dow,
                  floor(avg(det) * 1000000 + 0.5) / 1000000 AS seasonal
           FROM dt WHERE det IS NOT NULL GROUP BY 1)
    SELECT dt.day, dt.v, dt.trend, se.seasonal,
           CASE WHEN dt.trend IS NOT NULL
                THEN floor((dt.v - dt.trend - se.seasonal) * 1000000
                           + 0.5) / 1000000
           END AS residual
    FROM dt JOIN se USING (dow)
    """,
)
def decompose_daily_events(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X157 — STL-lite decomposition of the daily event-count series:
    trend = centered 7-day moving average (full windows only),
    seasonal = per-day-of-week mean of the detrended series,
    residual = the rest — the additive decomposition behind every
    "is this drop seasonal or real?" question, feeding the drift and
    changepoint detectors (X79, X121, X143) a deseasonalized input.
    The raw stream collapses to one row per day first; the trend
    rides ONE ordered window, the seasonal is a 7-row broadcast
    join.  Trend is rounded BEFORE detrending on both engines."""
    ev = load_table(spark, sf_dir, "events")
    p = 10 ** 6
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    s = (ev.groupBy(F.to_date("ts").alias("day"))
         .agg(F.count("*").cast("double").alias("v")))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = s.withColumn(
        "trend",
        F.when(F.count("*").over(w7) == 7, fr(F.avg("v").over(w7))))
    dt = tr.withColumn("dow", F.dayofweek("day")) \
           .withColumn("det", F.col("v") - F.col("trend"))
    se = (dt.filter(F.col("det").isNotNull())
          .groupBy("dow").agg(fr(F.avg("det")).alias("seasonal")))
    return (dt.join(F.broadcast(se), "dow")
            .select("day", "v", "trend", "seasonal",
                    F.when(F.col("trend").isNotNull(),
                           fr(F.col("v") - F.col("trend")
                              - F.col("seasonal"))).alias("residual")))


# ---------------------------------------------------------------------------
# X158 — autocomplete prefix index
# ---------------------------------------------------------------------------

@query(
    "prefix_index_documents",
    """
    WITH tf AS (
      SELECT tok, count(*)::BIGINT AS freq
      FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents)
      WHERE tok <> '' GROUP BY 1),
    px AS (
      SELECT substr(tok, 1, pl.l) AS prefix, tok, freq
      FROM tf CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS l)
                         pl
      WHERE length(tok) >= pl.l)
    SELECT prefix, rank::BIGINT AS rank, tok AS token, freq FROM (
      SELECT prefix, tok, freq,
             row_number() OVER (PARTITION BY prefix
                                ORDER BY freq DESC, tok) AS rank
      FROM px)
    WHERE rank <= 3
    """,
)
def prefix_index_documents(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X158 — autocomplete prefix index: for every 1-4 character
    token prefix, the top-3 completions by corpus frequency — the
    precomputed search-suggestion table (type "pro" → see the three
    most frequent "pro…" tokens).  One token count, a bounded ×4
    in-row prefix explode, ONE prefix-keyed top-k window
    (WindowGroupLimit ships 3 rows per prefix past the sort);
    (freq desc, token asc) makes ranking engine-deterministic with
    no float involved at all."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (docs.select(F.explode(F.split(F.col("text"), r"\s+"))
                      .alias("tok"))
          .filter(F.col("tok") != "")
          .groupBy("tok")
          .agg(F.count("*").cast("long").alias("freq")))
    px = (tf.select(
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("l"),
        "tok", "freq")
        .filter(F.length("tok") >= F.col("l"))
        .select(F.expr("substr(tok, 1, l)").alias("prefix"),
                "tok", "freq"))
    w = Window.partitionBy("prefix").orderBy(F.col("freq").desc(),
                                             F.col("tok"))
    return (px.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("prefix", F.col("rank").cast("long").alias("rank"),
                    F.col("tok").alias("token"), "freq"))


# ---------------------------------------------------------------------------
# X159 — Pareto frontier (2-D skyline)
# ---------------------------------------------------------------------------

@query(
    "pareto_frontier_customers",
    """
    WITH m AS (
      SELECT c.c_nationkey, o.o_custkey,
             floor(sum(o.o_totalprice) * 100 + 0.5) / 100 AS spend,
             count(*)::BIGINT AS n_orders
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2)
    SELECT m.c_nationkey, m.o_custkey AS c_custkey, m.spend,
           m.n_orders
    FROM m
    WHERE NOT EXISTS (
      SELECT 1 FROM m d
      WHERE d.c_nationkey = m.c_nationkey
        AND d.spend > m.spend AND d.n_orders > m.n_orders)
    """,
)
def pareto_frontier_customers(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X159 — 2-D Pareto frontier (skyline) per nation: customers not
    STRICTLY dominated on (total spend, order count) — the
    "best-tradeoff" query (top-spenders-or-most-frequent, and every
    efficient mix between) that a naive top-k by either axis gets
    wrong.  The 2-D skyline needs no dominance join: group rows by
    the first axis, take the per-value max of the second, ONE ordered
    window (running max + lag) yields max{y' : x' > x}, and a row is
    on the frontier iff that strict-prefix max does not exceed its
    own y.  All shuffles are nation-keyed; the oracle is the literal
    n² NOT EXISTS dominance predicate (per-nation partitions keep it
    feasible at test scale).  Spend is rounded BEFORE grouping on
    both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    p = 10 ** 2
    m = (orders.join(F.broadcast(cust),
                     orders["o_custkey"] == cust["c_custkey"])
         .groupBy("c_nationkey", "o_custkey")
         .agg((F.floor(F.sum("o_totalprice") * p + F.lit(0.5)) / p)
              .alias("spend"),
              F.count("*").cast("long").alias("n_orders")))
    g = (m.groupBy("c_nationkey", "spend")
         .agg(F.max("n_orders").alias("gmax")))
    w = (Window.partitionBy("c_nationkey")
         .orderBy(F.col("spend").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wl = Window.partitionBy("c_nationkey").orderBy(F.col("spend").desc())
    strict = (g.withColumn("runmax", F.max("gmax").over(w))
              .withColumn("prev_strict_max", F.lag("runmax").over(wl))
              .select("c_nationkey", "spend", "prev_strict_max"))
    return (m.join(strict, ["c_nationkey", "spend"])
            .filter(F.col("prev_strict_max").isNull()
                    | (F.col("prev_strict_max") <= F.col("n_orders")))
            .select("c_nationkey",
                    F.col("o_custkey").alias("c_custkey"),
                    "spend", "n_orders"))


# ---------------------------------------------------------------------------
# X160 — streaming per-key rate limiter (X131's live twin)
# ---------------------------------------------------------------------------

@query(
    "stream_rate_limit_hourly",
    """
    WITH rn AS (
      SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT
               AS window_start,
             row_number() OVER (
               PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
               ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT window_start, count(*)::BIGINT AS n_events,
           sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END)::BIGINT
             AS n_admitted,
           sum(CASE WHEN rn > 5 THEN 1 ELSE 0 END)::BIGINT
             AS n_dropped
    FROM rn GROUP BY 1
    """,
)
def stream_rate_limit_hourly(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X160 — STREAMING per-key rate limiter
    (``streaming.stateful.rate_limit_stream``): the live form of the
    X131 batch replay — admission counters per (user, hour) persist
    in the state store across micro-batches.  The events table is
    replayed as a REAL 4-batch availableNow stream in event-time
    order (ntile slices written sequentially with forced mtimes, so
    a user-hour spanning a batch boundary genuinely tests the
    carried counter), and the per-batch admission partials are
    summed per window.  The oracle is X131's batch SQL verbatim —
    the streaming limiter must admit exactly the rows the batch
    row_number form admits."""
    import os
    import tempfile
    import uuid

    from sync_cosmos_db_spark.streaming.stateful import rate_limit_stream
    from sync_cosmos_db_spark.streaming.windows import run_stream_to_memory

    ev = load_table(spark, sf_dir, "events")
    sliced = ev.withColumn(
        "slice", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    tmp = tempfile.mkdtemp(prefix="rl_stream_")
    for i in range(1, 5):
        (sliced.filter(F.col("slice") == i).drop("slice")
         .coalesce(1).write.mode("append").parquet(tmp))
        # force strictly increasing mtimes so the file source replays
        # slices in event-time order regardless of write latency —
        # stamping ONLY files not yet in the forced 1e9 range, so slice
        # i's file alone gets 1e9+i·1000 (re-stamping everything would
        # leave all files on the last stamp; advisor r8 finding)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                full = os.path.join(tmp, f)
                cur = os.stat(full)
                if cur.st_mtime > 1_100_000_000:
                    os.utime(full, (cur.st_atime, 1_000_000_000 + i * 1000))
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(tmp))
    emitted = run_stream_to_memory(
        spark, rate_limit_stream(stream, limit=5),
        f"rl_mem_{uuid.uuid4().hex[:8]}", mode="update")
    return (emitted.groupBy("window_start")
            .agg(F.sum("n_batch").cast("long").alias("n_events"),
                 F.sum("n_admitted_batch").cast("long")
                 .alias("n_admitted"),
                 (F.sum("n_batch") - F.sum("n_admitted_batch"))
                 .cast("long").alias("n_dropped")))


# ---------------------------------------------------------------------------
# X161 — whole-table column profile sweep
# ---------------------------------------------------------------------------

@query(
    "column_profile_orders",
    """
    WITH tall AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'o_custkey', o_custkey::VARCHAR FROM orders),
    agg AS (
      SELECT col, count(*)::BIGINT AS n,
             sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_null,
             count(DISTINCT val)::BIGINT AS n_distinct,
             min(val) AS min_val, max(val) AS max_val
      FROM tall GROUP BY 1),
    top AS (
      SELECT col, val AS top_val, cnt AS top_n FROM (
        SELECT col, val, count(*)::BIGINT AS cnt,
               row_number() OVER (PARTITION BY col
                                  ORDER BY count(*) DESC, val) AS rn
        FROM tall WHERE val IS NOT NULL GROUP BY col, val)
      WHERE rn = 1)
    SELECT agg.col, agg.n, agg.n_null, agg.n_distinct,
           agg.min_val, agg.max_val, top.top_val, top.top_n
    FROM agg JOIN top USING (col)
    """,
)
def column_profile_orders(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X161 — whole-table column profile in ONE sweep: per column,
    row/null/distinct counts, min/max, and the modal value with its
    frequency — the first query anyone runs on an unfamiliar table,
    and the nightly data-quality snapshot whose diffs (via X28/X79)
    catch silent upstream changes.  Columns unpivot in-row to a tall
    (col, val) stream (strings, so one schema fits all), then ONE
    col-keyed aggregate + ONE (col, val)-keyed mode election with a
    col-keyed top-1 window (WindowGroupLimit).  Ties on the mode
    break by value ascending — deterministic on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    tall = orders.selectExpr(
        "stack(3, 'o_orderstatus', o_orderstatus, "
        "'o_orderpriority', o_orderpriority, "
        "'o_custkey', cast(o_custkey AS string)) AS (col, val)")
    agg = (tall.groupBy("col")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum(F.col("val").isNull().cast("long")).cast("long")
                .alias("n_null"),
                F.countDistinct("val").cast("long").alias("n_distinct"),
                F.min("val").alias("min_val"),
                F.max("val").alias("max_val")))
    w = Window.partitionBy("col").orderBy(F.col("cnt").desc(),
                                          F.col("val"))
    top = (tall.filter(F.col("val").isNotNull())
           .groupBy("col", "val")
           .agg(F.count("*").cast("long").alias("cnt"))
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1)
           .select("col", F.col("val").alias("top_val"),
                   F.col("cnt").alias("top_n")))
    return agg.join(top, "col")


# ---------------------------------------------------------------------------
# X162 — ingestion watermark-lag monitor
# ---------------------------------------------------------------------------

@query(
    "ingest_lag_by_type",
    """
    WITH g AS (SELECT max(ts) AS gmax FROM events),
    p AS (SELECT event_type, count(*)::BIGINT AS n,
                 max(ts) AS part_max,
                 min(ts) AS part_min
          FROM events GROUP BY 1)
    SELECT p.event_type, p.n,
           floor((epoch(g.gmax) - epoch(p.part_max)) * 100 + 0.5)
             / 100 AS lag_s,
           floor((epoch(p.part_max) - epoch(p.part_min)) * 100 + 0.5)
             / 100 AS span_s,
           p.part_max = g.gmax AS is_freshest
    FROM p, g
    """,
)
def ingest_lag_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X162 — ingestion watermark-lag monitor: per event type, how
    far its newest record trails the global high-water mark, plus
    its time span and a freshest flag — the per-partition lag board
    that catches a stalled producer (one topic silently three hours
    behind) before downstream windows close on incomplete data.
    One type-keyed aggregate + a 1-row global max broadcast."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("gmax"))
    p100 = 100
    fr = lambda c: F.floor(c * p100 + F.lit(0.5)) / p100  # noqa: E731
    p = (ev.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n"),
              F.max("ts").alias("part_max"),
              F.min("ts").alias("part_min")))
    return (p.crossJoin(F.broadcast(g))
            .select("event_type", "n",
                    fr(F.col("gmax").cast("double")
                       - F.col("part_max").cast("double"))
                    .alias("lag_s"),
                    fr(F.col("part_max").cast("double")
                       - F.col("part_min").cast("double"))
                    .alias("span_s"),
                    (F.col("part_max") == F.col("gmax"))
                    .alias("is_freshest")))


# ---------------------------------------------------------------------------
# X163 — encoding-quality (mojibake) audit
# ---------------------------------------------------------------------------

_REPL = "�"
_BELL = "\x07"


@query(
    "encoding_audit_documents",
    f"""
    WITH fix AS (
      SELECT source,
             text
               || CASE WHEN doc_id % 13 = 0 THEN ' café naïve'
                       ELSE '' END
               || CASE WHEN doc_id % 17 = 0 THEN ' cafÃ©'
                       ELSE '' END
               || CASE WHEN doc_id % 19 = 0 THEN ' {_REPL}ware'
                       ELSE '' END
               || CASE WHEN doc_id % 23 = 0 THEN chr(7) || 'ding'
                       ELSE '' END AS txt
      FROM documents),
    m AS (
      SELECT source,
             length(txt) - length(replace(txt, '{_REPL}', '')) AS n_repl,
             length(txt) - length(replace(txt, 'Ã', '')) AS n_moji,
             length(txt) - length(replace(txt, chr(7), '')) AS n_ctl,
             length(txt) - length(replace(txt, 'é', ''))
               + length(txt) - length(replace(txt, 'ï', ''))
               AS n_acc
      FROM fix)
    SELECT source, count(*)::BIGINT AS n_docs,
           floor(avg(CASE WHEN n_repl > 0 THEN 1.0 ELSE 0.0 END)
                 * 10000 + 0.5) / 10000 AS frac_replacement_docs,
           sum(n_moji)::BIGINT AS n_mojibake_marks,
           sum(n_ctl)::BIGINT AS n_control_chars,
           floor(avg(CASE WHEN n_acc > 0 THEN 1.0 ELSE 0.0 END)
                 * 10000 + 0.5) / 10000 AS frac_accented_docs
    FROM m GROUP BY 1
    """,
)
def encoding_audit_documents(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X163 — encoding-quality audit per source: U+FFFD replacement
    characters (a decoder already gave up), 'Ã' digraph marks (the
    UTF-8-read-as-Latin-1 mojibake signature), C0 control characters,
    and legitimately-accented docs for contrast — the triage that
    decides whether a source needs re-decoding before it poisons a
    tokenizer.  Markers are injected deterministically (the harness
    corpus is clean ASCII; X123/X145 discipline).  Every counter is a
    replace-diff on a SINGLE code point — no regex, so the two
    engines cannot disagree on pattern dialects; zero shuffle before
    the per-source reduce."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 13 == 0,
               F.lit(" café naïve")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 17 == 0,
               F.lit(" cafÃ©")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 19 == 0,
               F.lit(f" {_REPL}ware")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 23 == 0,
               F.lit(_BELL + "ding")).otherwise(F.lit("")))

    def marks(ch):
        return F.length(F.col("txt")) - F.length(
            F.replace(F.col("txt"), F.lit(ch), F.lit("")))

    p = 10 ** 4
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    m = (docs.select("source", txt.alias("txt"))
         .select("source",
                 marks(_REPL).alias("n_repl"),
                 marks("Ã").alias("n_moji"),
                 marks(_BELL).alias("n_ctl"),
                 (marks("é") + marks("ï")).alias("n_acc")))
    return (m.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 fr(F.avg((F.col("n_repl") > 0).cast("double")))
                 .alias("frac_replacement_docs"),
                 F.sum("n_moji").cast("long").alias("n_mojibake_marks"),
                 F.sum("n_ctl").cast("long").alias("n_control_chars"),
                 fr(F.avg((F.col("n_acc") > 0).cast("double")))
                 .alias("frac_accented_docs")))
