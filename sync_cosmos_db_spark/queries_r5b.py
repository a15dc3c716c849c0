"""Round-5 extension operators, second batch (X88–X91 + the O2
pagination projection): binary-file ingestion, hive-partitioned pruned
layout, bounded-depth BFS, duplicate-cluster survivorship election,
and oracle-checked stable pagination buckets.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X88 — binary-file ingestion (multimodal ingest plumbing)
# ---------------------------------------------------------------------------

@query(
    "binaryfile_ingest_documents",
    """
    SELECT doc_id, (length(text) + 1)::BIGINT AS n_bytes,
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
