"""Round-5 extension operators, second batch (X88–X96 + the O2
pagination projection): binary-file ingestion, hive-partitioned pruned
layout, bounded-depth BFS, duplicate-cluster survivorship election,
oracle-checked stable pagination buckets, Theil–Sen robust trend,
day-of-week seasonality, TTL expiry sweep, share-of-total analytics,
and session path trigrams.

None of these exist in the reference (the closest is its page-at-a-time
container read loop, ``/root/reference/src/containers.py:55-89``, which
O2/`streaming/incremental.py` already re-expresses); they extend the
ingestion / layout / graph / curation surface mandated by
BASELINE.json.  Same contract as every query module: Spark-first plans,
DuckDB-recomputable oracles.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X88 — binary-file ingestion (multimodal ingest plumbing)
# ---------------------------------------------------------------------------

@query(
    "binaryfile_ingest_documents",
    """
    SELECT doc_id, (octet_length(encode(text)) + 1)::BIGINT AS n_bytes,
           sha256(text || chr(10)) AS content_sha
    FROM documents WHERE doc_id < 100
    """,
)
def binaryfile_ingest_documents(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X88 — opaque-file ingestion through Spark's built-in
    ``binaryFile`` source — the entry path for image/audio corpora
    (X5) where payloads arrive as FILES, not rows: write the first 100
    documents as one UTF-8 text file each (hive layout keyed by
    doc_id), read the directory back as binary blobs, recover the id
    from the PATH, and hash the bytes.  The oracle pins the full
    byte-level roundtrip (text sink appends exactly one ``\\n``).  At
    100 TB this is the same plan: binaryFile scans are
    per-file-partitioned, filters on path/length prune before any
    bytes load, and the decode is a narrow projection."""
    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 100))
    path = os.path.join(tempfile.mkdtemp(prefix="binaryfile_"), "docs")
    (docs.select("doc_id", "text")
     .repartition(8)
     .write.partitionBy("doc_id").mode("overwrite").text(path))
    blobs = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.txt")
             .option("recursiveFileLookup", "false")
             .load(path))
    return (blobs.select(
        F.regexp_extract(F.col("path"), r"doc_id=(\d+)", 1)
        .cast("long").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha")))


# ---------------------------------------------------------------------------
# X89 — hive-partitioned layout + partition-pruned read
# ---------------------------------------------------------------------------

@query(
    "partition_pruned_read_en",
    """
    SELECT doc_id, lang, sha256(text) AS text_sha
    FROM documents WHERE lang = 'en'
    """,
)
def partition_pruned_read_en(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X89 — hive-style partitioned layout (``sinks.write_partitioned``
    keyed by ``lang``) read back under a partition predicate.  The
    filter resolves against DIRECTORY NAMES, not data — the scan's
    PartitionFilters prune every non-en directory before a single row
    is read (plan-asserted in tests/test_sinks.py), which is the
    difference between scanning 1/n_langs of 100 TB and all of it.
    The oracle pins that pruning moved bytes, not values."""
    from sync_cosmos_db_spark.sinks import write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="partsink_"), "docs")
    write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.select("doc_id", F.col("lang").cast("string").alias("lang"),
                       F.sha2(F.col("text"), 256).alias("text_sha"))


# ---------------------------------------------------------------------------
# X90 — bounded-depth BFS (operators/graph.py)
# ---------------------------------------------------------------------------

@query(
    "bfs_3hop_nation1",
    """
    WITH RECURSIVE e AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    edges AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    seeds AS (SELECT c_custkey * 2 AS node FROM customer
              WHERE c_nationkey = 1),
    walk(node, hops) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT edges.dst, walk.hops + 1
      FROM walk JOIN edges ON edges.src = walk.node
      WHERE walk.hops < 3)
    SELECT node, min(hops)::BIGINT AS hops FROM walk GROUP BY node
    """,
)
def bfs_3hop_nation1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X90 — minimum-hop frontier (``graph.bfs_hops``): every node of
    the symmetric customer↔supplier trade graph within 3 hops of the
    nation-1 customer seed set — the blast-radius query (same node
    encoding and edge derivation as X27 PageRank).  The Spark loop is
    one frontier join + one visited anti-join per hop; the oracle is
    a bounded recursive CTE taking min(hops) — two mechanisms, one
    answer."""
    from sync_cosmos_db_spark.operators.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    raw = (li.join(o, li.l_orderkey == o.o_orderkey)
           .groupBy((F.col("o_custkey") * 2).alias("c_node"),
                    (F.col("l_suppkey") * 2 + 1).alias("s_node"))
           .agg(F.count(F.lit(1)).alias("__n")))
    edges = (raw.select(F.col("c_node").alias("src"),
                        F.col("s_node").alias("dst"))
             .unionByName(raw.select(F.col("s_node").alias("src"),
                                     F.col("c_node").alias("dst"))))
    seeds = (load_table(spark, sf_dir, "customer")
             .filter(F.col("c_nationkey") == 1)
             .select((F.col("c_custkey") * 2).alias("node")))
    return bfs_hops(edges, seeds, max_hops=3)


# ---------------------------------------------------------------------------
# X91 — duplicate-cluster survivorship (operators/dedup.py)
# ---------------------------------------------------------------------------

@query(
    "canonical_doc_election",
    """
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text || ' zz yy' AS text, lang
      FROM documents WHERE doc_id % 11 = 0
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
            FROM corpus)
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b
        ON a.doc_id < b.doc_id AND a.lang = b.lang
      WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(list_concat(a.shingles, b.shingles)))
            >= 0.5
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(node, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT edges.a, reach.r FROM edges
      JOIN reach ON edges.b = reach.node
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
    q AS (SELECT comp.component, comp.node,
                 length(corpus.text)::BIGINT AS ql
          FROM comp JOIN corpus ON corpus.doc_id = comp.node)
    SELECT component, count(*)::BIGINT AS n_members,
           max(ql) AS best_quality,
           min(node) FILTER (WHERE ql = best) AS canonical_id
    FROM (SELECT component, node, ql,
                 max(ql) OVER (PARTITION BY component) AS best
          FROM q) t
    GROUP BY component
    """,
)
def canonical_doc_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X91 — survivorship election (``dedup.elect_canonical``): the
    step between near-dup detection and the curated corpus.  Exact
    Jaccard pairs (the X2 baseline corpus: documents ∪ ' zz yy'
    near-copies) → connected components → per cluster keep the
    longest member, lowest id on ties.  The Spark election is one
    cluster-keyed max-struct aggregate (membership lists never
    collect); the oracle re-derives pairs, clusters (recursive CTE),
    and the election (window + filtered min) independently."""
    from sync_cosmos_db_spark.operators.dedup import (
        elect_canonical, jaccard_pairs,
    )
    from sync_cosmos_db_spark.queries_llm import _corpus_with_near_dups

    corpus = (_corpus_with_near_dups(spark, sf_dir)
              .withColumn("__quality", F.length("text")))
    pairs = jaccard_pairs(corpus, id_col="doc_id", text_col="text",
                          threshold=0.5, n=3, block_col="lang")
    out = elect_canonical(pairs.select("id_a", "id_b"), corpus,
                          id_col="doc_id", quality_col="__quality")
    return out.select("component", "n_members", "best_quality",
                      "canonical_id")


# ---------------------------------------------------------------------------
# O2 projection — stable pagination buckets (streaming/incremental.py)
# ---------------------------------------------------------------------------

@query(
    "pagination_buckets_orders",
    """
    WITH b AS (
      SELECT translate(substr(sha256(o_orderkey::VARCHAR || ':page'),
                              1, 6), 'abcdef', '012345')::BIGINT % 8
               AS bucket,
             o_totalprice
      FROM orders)
    SELECT bucket, count(*)::BIGINT AS n_rows,
           floor(sum(o_totalprice) * 100 + 0.5) / 100 AS sum_price
    FROM b GROUP BY bucket
    """,
)
def pagination_buckets_orders(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """O2 projection — stable pagination: the reference resumes
    container reads with continuation tokens
    (``/root/reference/src/containers.py:55-89``); the Spark
    re-expression pages by DETERMINISTIC KEY BUCKET so any worker can
    re-derive its page membership after restart
    (``streaming/incremental.key_bucket`` holds the production
    xxhash64 form; this query runs the sha2 twin from
    ``curation.hash_bucket``, whose SQL equivalent is documented and
    oracle-checked).  Every row lands in exactly one of 8 buckets —
    the per-bucket counts and sums reconcile against the full table,
    which is the resume-safety property O2 needs."""
    from sync_cosmos_db_spark.operators.curation import hash_bucket

    orders = load_table(spark, sf_dir, "orders")
    return (orders
            .withColumn("bucket", hash_bucket("o_orderkey", 8, "page"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 (F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5)) / 100)
                 .alias("sum_price")))


# ---------------------------------------------------------------------------
# X92 — Theil–Sen robust trend (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "theil_sen_monthly_revenue",
    """
    WITH m AS (
      SELECT o_orderpriority AS g,
             (year(o_orderdate) * 12 + month(o_orderdate))::DOUBLE AS x,
             sum(o_totalprice) AS y
      FROM orders GROUP BY 1, 2),
    pr AS (SELECT a.g, (b.y - a.y) / (b.x - a.x) AS slope
           FROM m a JOIN m b ON a.g = b.g AND a.x < b.x),
    np AS (SELECT g, count(*)::BIGINT AS n_points FROM m GROUP BY 1)
    SELECT pr.g AS o_orderpriority, np.n_points,
           count(*)::BIGINT AS n_pairs,
           floor(quantile_cont(slope, 0.5) * 10000 + 0.5) / 10000 AS slope
    FROM pr JOIN np USING (g)
    GROUP BY pr.g, np.n_points
    """,
)
def theil_sen_monthly_revenue(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X92 — Theil–Sen robust slope (``profiling.theil_sen_slope``) of
    monthly revenue per order priority: the median-of-pairwise-slopes
    estimator that shrugs off up to ~29% corrupted months where the
    OLS trend (X29) follows them.  Runs on the PRE-AGGREGATED monthly
    series (the estimator's pair space is quadratic in points per
    group — aggregation level is the scale knob, stated in the
    operator contract)."""
    from sync_cosmos_db_spark.operators.profiling import theil_sen_slope

    monthly = (load_table(spark, sf_dir, "orders")
               .groupBy(F.col("o_orderpriority"),
                        (F.year("o_orderdate") * 12
                         + F.month("o_orderdate")).cast("double")
                        .alias("x"))
               .agg(F.sum("o_totalprice").alias("y")))
    return theil_sen_slope(monthly, "o_orderpriority", "x", "y")


# ---------------------------------------------------------------------------
# X93 — day-of-week seasonality profile
# ---------------------------------------------------------------------------

@query(
    "dow_seasonality_events",
    """
    WITH d AS (
      SELECT isodow(ts)::BIGINT AS iso_dow,
             sum(value) AS s, count(*)::DOUBLE AS c
      FROM events GROUP BY 1)
    SELECT iso_dow, c::BIGINT AS n_events,
           floor(s / c * 10000 + 0.5) / 10000 AS avg_value,
           floor((s / c) / (sum(s) OVER () / sum(c) OVER ())
                 * 10000 + 0.5) / 10000 AS seasonal_index
    FROM d
    """,
)
def dow_seasonality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X93 — day-of-week seasonal index of event value: per-ISO-dow
    mean over the global mean — the calendar-seasonality baseline a
    forecaster divides out (and an anomaly detector must NOT flag).
    One dow-keyed aggregate; the normalizing global mean is a window
    over the 7-ROW aggregate, never a second pass over events."""
    ev = load_table(spark, sf_dir, "events")
    iso = ((F.dayofweek("ts") + 5) % 7 + 1).cast("long")
    d = (ev.groupBy(iso.alias("iso_dow"))
         .agg(F.sum("value").alias("s"),
              F.count(F.lit(1)).cast("double").alias("c")))
    w = Window.partitionBy()
    p = 10 ** 4
    return d.select(
        "iso_dow", F.col("c").cast("long").alias("n_events"),
        (F.floor(F.col("s") / F.col("c") * p + F.lit(0.5)) / p)
        .alias("avg_value"),
        (F.floor((F.col("s") / F.col("c"))
                 / (F.sum("s").over(w) / F.sum("c").over(w)) * p
                 + F.lit(0.5)) / p).alias("seasonal_index"))


# ---------------------------------------------------------------------------
# X94 — TTL expiry sweep (Cosmos container-TTL semantics)
# ---------------------------------------------------------------------------

@query(
    "ttl_expiry_events",
    """
    SELECT event_type, count(*)::BIGINT AS n_total,
           sum(CASE WHEN epoch_us(ts) < m.mx - 7 * 86400000000::BIGINT
                    THEN 1 ELSE 0 END)::BIGINT AS n_expired,
           sum(CASE WHEN epoch_us(ts) >= m.mx - 7 * 86400000000::BIGINT
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM events CROSS JOIN (SELECT max(epoch_us(ts)) AS mx FROM events) m
    GROUP BY event_type
    """,
)
def ttl_expiry_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X94 — TTL expiry sweep: Cosmos DB containers expire documents
    ``DefaultTimeToLive`` seconds after their last write; the batch
    re-expression classifies every row against
    ``max(ts) − ttl`` (microsecond-exact) — the pre-migration audit
    that predicts how many source documents the connector will never
    see.  The watermark is a broadcast single-row aggregate (the
    q11-style scalar-subquery shape); one event-type-keyed aggregate
    does the rest."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("mx"))
    ttl_us = 7 * 86400 * 1_000_000
    expired = (F.unix_micros("ts") < F.col("mx") - F.lit(ttl_us))
    return (ev.crossJoin(F.broadcast(mx))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_total"),
                 F.sum(expired.cast("long")).cast("long")
                 .alias("n_expired"),
                 F.sum((~expired).cast("long")).cast("long")
                 .alias("n_kept")))


# ---------------------------------------------------------------------------
# X95 — share-of-total window analytics
# ---------------------------------------------------------------------------

@query(
    "nation_revenue_share",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             sum(o.o_totalprice) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2)
    SELECT region, nation,
           floor(rev * 100 + 0.5) / 100 AS revenue,
           floor(rev / sum(rev) OVER (PARTITION BY region)
                 * 1000000 + 0.5) / 1000000 AS region_share
    FROM rev
    """,
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95 — percent-of-parent analytics: each nation's share of its
    region's revenue — the ratio_to_report pattern every BI layer
    needs.  The heavy work is one groupBy over the order→customer→
    nation→region star (dimension joins broadcast); the share is a
    window over the ≤|nations|-row aggregate, so the normalization
    never rescans facts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .groupBy(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"))
           .agg(F.sum("o_totalprice").alias("rev")))
    w = Window.partitionBy("region")
    return rev.select(
        "region", "nation",
        (F.floor(F.col("rev") * 100 + F.lit(0.5)) / 100).alias("revenue"),
        (F.floor(F.col("rev") / F.sum("rev").over(w) * 1e6 + F.lit(0.5))
         / 1e6).alias("region_share"))


# ---------------------------------------------------------------------------
# X96 — session path trigrams (operators/behavioral.py)
# ---------------------------------------------------------------------------

@query(
    "session_path_trigrams",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                     > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (SELECT user_id, ts, event_id, event_type,
                 sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
          FROM o),
    tri AS (
      SELECT event_type || '>' ||
             lead(event_type, 1) OVER w || '>' ||
             lead(event_type, 2) OVER w AS path
      FROM s
      WINDOW w AS (PARTITION BY user_id, session_idx
                   ORDER BY ts, event_id))
    SELECT path, count(*)::BIGINT AS n
    FROM tri WHERE path IS NOT NULL
    GROUP BY path HAVING count(*) >= 5
    """,
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X96 — top session paths: 3-step event-type sequences WITHIN a
    30-minute session (``behavioral.sessionize`` + two leads over the
    same (user, session, ts, id) sort), counted corpus-wide with a
    ≥5 support floor — the navigation-pattern miner behind "users who
    did X then Y then Z".  The trigram window reuses sessionize's
    partitioning (one sort serves three window functions); the count
    is a path-keyed aggregate over short strings."""
    from sync_cosmos_db_spark.operators.behavioral import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, gap_seconds=1800)
    w = (Window.partitionBy("user_id", "session_idx")
         .orderBy(F.col("ts"), F.col("event_id")))
    tri = (s.withColumn("__l1", F.lead("event_type", 1).over(w))
           .withColumn("__l2", F.lead("event_type", 2).over(w))
           .filter(F.col("__l1").isNotNull() & F.col("__l2").isNotNull())
           .select(F.concat_ws(">", "event_type", "__l1", "__l2")
                   .alias("path")))
    return (tri.groupBy("path")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .filter(F.col("n") >= 5))
