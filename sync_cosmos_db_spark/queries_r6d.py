"""Round-6 operator families (fourth batch) X148-X152: min-label
propagation, bounded k-core peeling, TF-IDF keyword extraction,
quantile normalization, and transition dwell-time profiling.

The two graph oracles use the same ring-chord document graph as X125
(clustering coefficient); the label-propagation oracle recomputes
"min id within k hops" by a recursive CTE — a different mechanism
than the Spark round loop, same answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table

# the shared deterministic doc graph (X125's rules), symmetric closure
_GRAPH_CTE = """
    raw AS (
      SELECT doc_id AS s, (doc_id * 7 + 3) % 500 AS d FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 1) % 500 FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % 500 FROM documents),
    e AS (SELECT DISTINCT s, d FROM (
            SELECT s, d FROM raw
            UNION ALL
            SELECT d, s FROM raw)
          WHERE s <> d)
"""


def _doc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = (docs.select(F.col("doc_id").alias("s"),
                       ((F.col("doc_id") * 7 + 3) % 500).alias("d"))
           .unionByName(docs.select(
               F.col("doc_id").alias("s"),
               ((F.col("doc_id") + 1) % 500).alias("d")))
           .unionByName(docs.select(
               F.col("doc_id").alias("s"),
               ((F.col("doc_id") + 2) % 500).alias("d"))))
    sym = raw.unionByName(raw.select(F.col("d").alias("s"),
                                     F.col("s").alias("d")))
    return (sym.filter(F.col("s") != F.col("d")).distinct()
            .select(F.col("s").alias("src"), F.col("d").alias("dst")))


# ---------------------------------------------------------------------------
# X148 — bounded-round minimum-label propagation
# ---------------------------------------------------------------------------

@query(
    "label_propagation_docs",
    f"""
    WITH RECURSIVE {_GRAPH_CTE},
    nodes AS (SELECT DISTINCT s AS node FROM e
              UNION SELECT d FROM e),
    r AS (
      SELECT node AS v, node AS u, 0 AS hops FROM nodes
      UNION
      SELECT r.v, e.s, r.hops + 1
      FROM r JOIN e ON e.d = r.u WHERE r.hops < 3)
    SELECT v::BIGINT AS node, min(u)::BIGINT AS label
    FROM r GROUP BY v
    """,
)
def label_propagation_docs(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X148 — min-label propagation
    (``graph.min_label_propagation``, 3 rounds) over the symmetric
    doc graph: each node's label converges to the minimum node id
    within 3 hops — bounded-horizon community seeds, the building
    block of distributed connected components.  The Spark loop is
    one src-keyed join + one dst-keyed min + one node-keyed merge
    per round (localCheckpoint lineage truncation); the oracle
    recomputes min-id-within-k-hops by recursive CTE — different
    mechanism, same answer."""
    from sync_cosmos_db_spark.operators.graph import (
        min_label_propagation,
    )

    edges = _doc_edges(spark, sf_dir)
    out = min_label_propagation(edges, rounds=3)
    return out.select(F.col("node").cast("long").alias("node"),
                      F.col("label").cast("long").alias("label"))


# ---------------------------------------------------------------------------
# X149 — bounded-round k-core peeling
# ---------------------------------------------------------------------------

@query(
    "kcore_docs",
    f"""
    WITH {_GRAPH_CTE},
    d1 AS (SELECT s AS node, count(*) AS deg FROM e GROUP BY 1),
    k1 AS (SELECT node FROM d1 WHERE deg >= 6),
    e1 AS (SELECT e.s, e.d FROM e
           JOIN k1 a ON a.node = e.s JOIN k1 b ON b.node = e.d),
    d2 AS (SELECT s AS node, count(*) AS deg FROM e1 GROUP BY 1),
    k2 AS (SELECT node FROM d2 WHERE deg >= 6),
    e2 AS (SELECT e1.s, e1.d FROM e1
           JOIN k2 a ON a.node = e1.s JOIN k2 b ON b.node = e1.d),
    d3 AS (SELECT s AS node, count(*) AS deg FROM e2 GROUP BY 1),
    k3 AS (SELECT node FROM d3 WHERE deg >= 6),
    e3 AS (SELECT e2.s, e2.d FROM e2
           JOIN k3 a ON a.node = e2.s JOIN k3 b ON b.node = e2.d)
    SELECT s::BIGINT AS node, count(*)::BIGINT AS degree
    FROM e3 GROUP BY 1
    """,
)
def kcore_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X149 — bounded k-core peeling (``graph.k_core``, k=6, 3
    rounds) on the symmetric doc graph: iteratively drop nodes with
    induced degree < 6 — the cohesion filter that separates a dense
    community from a hub-and-pendants star.  Per round one degree
    count + two semi-joins, localCheckpoint-truncated; the oracle
    unrolls the identical 3 peels as chained CTEs."""
    from sync_cosmos_db_spark.operators.graph import k_core

    edges = _doc_edges(spark, sf_dir)
    out = k_core(edges, k=6, rounds=3)
    return out.select(F.col("node").cast("long").alias("node"),
                      "degree")


# ---------------------------------------------------------------------------
# X150 — TF-IDF top-k keyword extraction
# ---------------------------------------------------------------------------

@query(
    "tfidf_keywords_documents",
    """
    WITH tf AS (
      SELECT doc_id AS doc, tok AS token, count(*)::DOUBLE AS tf
      FROM (SELECT doc_id,
                   unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    dfq AS (SELECT token, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc)::DOUBLE AS n FROM tf),
    sc AS (SELECT doc, token,
                  floor(tf * ln((SELECT n FROM n) / df) * 1000000
                        + 0.5) / 1000000 AS score
           FROM tf JOIN dfq USING (token))
    SELECT doc, rank::BIGINT AS rank, token, score FROM (
      SELECT doc, token, score,
             row_number() OVER (PARTITION BY doc
                                ORDER BY score DESC, token) AS rank
      FROM sc)
    WHERE rank <= 3
    """,
)
def tfidf_keywords_documents(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X150 — top-3 TF-IDF keywords per document
    (``retrieval.tfidf_top_terms``): the cheap extractive tagger.
    Scores are floor-rounded BEFORE ranking with (score desc, token
    asc) tie-break, so the per-doc top-k window is
    engine-deterministic; WindowGroupLimit ships only 3 rows per doc
    past the sort."""
    from sync_cosmos_db_spark.operators.retrieval import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", top_k=3)


# ---------------------------------------------------------------------------
# X151 — quantile normalization transform
# ---------------------------------------------------------------------------

@query(
    "quantile_normalize_doc_lengths",
    """
    WITH base AS (SELECT doc_id AS id, source AS g,
                         n_chars::DOUBLE AS v
                  FROM documents),
    rk AS (SELECT *,
                  row_number() OVER (PARTITION BY g ORDER BY v, id)
                    AS rk,
                  row_number() OVER (ORDER BY v, id) AS gi
           FROM base),
    sz AS (SELECT g, count(*) AS ng FROM base GROUP BY 1),
    nt AS (SELECT count(*) AS nt FROM base),
    px AS (SELECT rk.id, rk.g, rk.v,
                  CASE WHEN sz.ng > 1
                       THEN (rk.rk - 1.0) / (sz.ng - 1.0)
                            * ((SELECT nt FROM nt) - 1)
                       ELSE ((SELECT nt FROM nt) - 1) / 2.0
                  END AS pos
           FROM rk JOIN sz USING (g)),
    ix AS (SELECT *,
                  floor(pos)::BIGINT + 1 AS lo,
                  least(floor(pos)::BIGINT + 2,
                        (SELECT nt FROM nt)) AS hi,
                  pos - floor(pos) AS frac
           FROM px)
    SELECT ix.id AS id, ix.g AS source, ix.v AS n_chars,
           floor((glo.v + ix.frac * (ghi.v - glo.v)) * 10000 + 0.5)
             / 10000 AS mapped
    FROM ix
    JOIN rk glo ON glo.gi = ix.lo
    JOIN rk ghi ON ghi.gi = ix.hi
    """,
)
def quantile_normalize_doc_lengths(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """X151 — quantile normalization (``curation.quantile_normalize``)
    of document lengths across sources: each source's length
    distribution is mapped by rank onto the global one — X138
    reports the per-decile skew, this APPLIES the fix.  Two ordered
    windows + equi-joins on global order-statistic positions; the
    global sort is the honest cost of exact mapping (the X82
    boundary-broadcast deciles are the approximate substitute at
    unbounded scale)."""
    from sync_cosmos_db_spark.operators.curation import quantile_normalize

    docs = load_table(spark, sf_dir, "documents")
    return quantile_normalize(docs, "source", "doc_id", "n_chars")


# ---------------------------------------------------------------------------
# X152 — transition dwell-time profile
# ---------------------------------------------------------------------------

@query(
    "transition_dwell_events",
    """
    WITH g AS (
      SELECT user_id, event_type,
             lag(event_type) OVER w AS from_type,
             floor((epoch(ts) - lag(epoch(ts)) OVER w) * 100 + 0.5)
               / 100 AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT from_type, event_type AS to_type, count(*)::BIGINT AS n,
           floor(avg(gap) * 100 + 0.5) / 100 AS mean_s,
           floor(quantile_cont(gap, 0.5) * 100 + 0.5) / 100 AS p50_s,
           floor(quantile_cont(gap, 0.9) * 100 + 0.5) / 100 AS p90_s
    FROM g WHERE from_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def transition_dwell_events(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X152 — transition dwell-time profile
    (``behavioral.transition_dwell``): per (from, to) event
    transition, mean / median / p90 of the dwell — the timing
    companion of the X26 Markov counts (where users go vs how long
    they hesitate).  ONE user-keyed lag window, one
    transition-keyed aggregate; gaps round at 1e-2 s before any
    aggregation on both engines."""
    from sync_cosmos_db_spark.operators.behavioral import transition_dwell

    ev = load_table(spark, sf_dir, "events")
    return transition_dwell(ev, "user_id", "ts", "event_type",
                            "event_id")
