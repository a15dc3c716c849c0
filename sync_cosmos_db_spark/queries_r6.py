"""Round-6 operator families X119-X132: edit-distance join, bigram LM
scoring, vocabulary overlap, PII co-occurrence, robust scaling, local
clustering coefficient, out-of-order audit, target encoding, split
leakage audit, time-weighted average, centroid cosine matrix, rate
limiting, referential-integrity audit, stride chunking.

Each query drives the real operator end-to-end on the harness tables
and carries a DuckDB oracle that recomputes the result independently
(same fixtures, independent formulation where the operator is blocked /
windowed / iterative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X119 — exact edit-distance self-join (PassJoin blocking)
# ---------------------------------------------------------------------------

@query(
    "editdist_pairs_customers",
    """
    SELECT least(a.c_custkey, b.c_custkey)::BIGINT AS id_a,
           greatest(a.c_custkey, b.c_custkey)::BIGINT AS id_b,
           levenshtein(a.c_name, b.c_name)::BIGINT AS dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def editdist_pairs_customers(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X119 — typo-level name dedup (``linkage.editdist_join``): all
    customer-name pairs within edit distance 1 via PassJoin segment
    blocking (pigeonhole-complete, never O(n²)) + in-row JVM
    ``levenshtein`` verify.  The oracle is the unblocked n²
    formulation — feasible at test scale, which is exactly why the
    blocked form exists for the real one."""
    from sync_cosmos_db_spark.operators.linkage import editdist_join

    cust = load_table(spark, sf_dir, "customer")
    return editdist_join(cust, "c_custkey", "c_name", max_dist=1)


# ---------------------------------------------------------------------------
# X120 — interpolated bigram LM scoring
# ---------------------------------------------------------------------------

@query(
    "bigram_lm_documents",
    """
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split_regex(text, '\\s+'), 1)
               AS pos,
             unnest(string_split_regex(text, '\\s+')) AS w
      FROM documents),
    bigf AS (
      SELECT * FROM (
        SELECT doc_id, w AS w1,
               lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks)
      WHERE w2 IS NOT NULL),
    bc AS (SELECT w1, w2, count(*)::DOUBLE AS cb
           FROM bigf GROUP BY 1, 2),
    uc AS (SELECT w, count(*)::DOUBLE AS cu FROM toks GROUP BY 1),
    tot AS (SELECT sum(cu) AS t FROM uc),
    lp AS (SELECT b.doc_id,
                  ln(0.8 * bc.cb / u1.cu
                     + 0.2 * u2.cu / (SELECT t FROM tot)) AS lp
           FROM bigf b
           JOIN bc USING (w1, w2)
           JOIN uc u1 ON u1.w = b.w1
           JOIN uc u2 ON u2.w = b.w2)
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           floor(-avg(lp) * 1000000 + 0.5) / 1000000 AS avg_neg_logprob
    FROM lp GROUP BY 1
    """,
)
def bigram_lm_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X120 — per-document scoring under an interpolated bigram LM fit
    on the corpus (``text.bigram_backoff_logprob``): the
    Jelinek-Mercer upgrade of the unigram CCNet scorer (X17) —
    context-aware fluency, same token-keyed shuffle shape."""
    from sync_cosmos_db_spark.operators.text import bigram_backoff_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_backoff_logprob(docs, "doc_id", "text", lam=0.8)


# ---------------------------------------------------------------------------
# X122 — cross-source vocabulary overlap
# ---------------------------------------------------------------------------

@query(
    "vocab_overlap_sources",
    """
    WITH tv AS (
      SELECT DISTINCT source AS g,
             unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents),
    sz AS (SELECT g, count(*)::BIGINT AS n FROM tv GROUP BY 1),
    inter AS (SELECT a.g AS ga, b.g AS gb, count(*)::BIGINT AS inter
              FROM tv a JOIN tv b ON a.tok = b.tok AND a.g < b.g
              GROUP BY 1, 2)
    SELECT ga AS group_a, gb AS group_b,
           sa.n AS n_a, sb.n AS n_b, inter,
           floor(inter / (sa.n + sb.n - inter) * 1000000 + 0.5)
             / 1000000 AS jaccard
    FROM inter
    JOIN sz sa ON sa.g = ga
    JOIN sz sb ON sb.g = gb
    """,
)
def vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X122 — pairwise vocabulary Jaccard between sources
    (``text.source_vocab_overlap``): the mixture-design /
    snapshot-drift diagnostic.  Token-keyed distinct + self-join with
    per-token fan-out bounded by |sources|²."""
    from sync_cosmos_db_spark.operators.text import source_vocab_overlap

    docs = load_table(spark, sf_dir, "documents")
    return source_vocab_overlap(docs, "source", "text")


# ---------------------------------------------------------------------------
# X123 — PII co-occurrence audit
# ---------------------------------------------------------------------------

_PII_EMAIL = "[a-z0-9]+@[a-z]+\\.com"
_PII_PHONE = "[0-9]{3}-[0-9]{4}"
_PII_REF = "ID-[0-9]{6}"


@query(
    "pii_cooccurrence_docs",
    f"""
    WITH fix AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' mail u' || doc_id || '@ex.com'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' tel 555-' || lpad((doc_id % 10000)::VARCHAR,
                                                4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' ref ID-' || lpad(doc_id::VARCHAR, 6, '0')
                       ELSE '' END AS txt
      FROM documents),
    flags AS (
      SELECT regexp_matches(txt, '{_PII_EMAIL}') AS has_email,
             regexp_matches(txt, '{_PII_PHONE}') AS has_phone,
             regexp_matches(txt, '{_PII_REF}') AS has_ref
      FROM fix)
    SELECT has_email, has_phone, has_ref, count(*)::BIGINT AS n
    FROM flags GROUP BY 1, 2, 3
    """,
)
def pii_cooccurrence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X123 — PII co-occurrence audit: documents bucketed by WHICH
    combination of PII classes they contain (email × phone × internal
    reference id) — the risk-tiering pass before redaction
    (``sanitizer.redact_text``, X22): a doc with email+phone is a
    contact record, one with all three is a leaked CRM row.  The PII
    is injected deterministically in-query (the harness corpus is
    clean); detection is three single-pass JVM regexps — zero
    shuffle before the ≤8-row combination aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" mail u"), F.col("doc_id"),
                        F.lit("@ex.com"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" tel 555-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"),
                               4, "0"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" ref ID-"),
                        F.lpad(F.col("doc_id").cast("string"),
                               6, "0"))).otherwise(F.lit("")))
    return (docs.select(
        txt.rlike(_PII_EMAIL).alias("has_email"),
        txt.rlike(_PII_PHONE).alias("has_phone"),
        txt.rlike(_PII_REF).alias("has_ref"))
        .groupBy("has_email", "has_phone", "has_ref")
        .agg(F.count("*").cast("long").alias("n")))


# ---------------------------------------------------------------------------
# X124 — robust (median/IQR) scaling profile
# ---------------------------------------------------------------------------

@query(
    "robust_scale_prices",
    """
    WITH q AS (
      SELECT o_orderpriority AS grp,
             floor(quantile_cont(o_totalprice, 0.25) * 10000 + 0.5)
               / 10000 AS q1,
             floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5)
               / 10000 AS med,
             floor(quantile_cont(o_totalprice, 0.75) * 10000 + 0.5)
               / 10000 AS q3
      FROM orders GROUP BY 1),
    z AS (SELECT o.o_orderpriority AS g, q.med, q.q3 - q.q1 AS iqr,
                 (o.o_totalprice - q.med) / (q.q3 - q.q1) AS z
          FROM orders o JOIN q ON q.grp = o.o_orderpriority)
    SELECT g AS o_orderpriority, count(*)::BIGINT AS n,
           max(med) AS med, max(iqr) AS iqr,
           CASE WHEN max(iqr) > 0
                THEN floor(avg(z) * 10000 + 0.5) / 10000 END
             AS scaled_mean,
           CASE WHEN max(iqr) > 0
                THEN floor(avg(CASE WHEN abs(z) <= 1.0
                                    THEN 1.0 ELSE 0.0 END)
                           * 10000 + 0.5) / 10000 END
             AS frac_within_1
    FROM z GROUP BY 1
    """,
)
def robust_scale_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X124 — median/IQR robust scaling with verification stats
    (``profiling.robust_scale_profile``): the outlier-immune
    standardization for scraped numerics; scale parameters are
    rounded BEFORE the transform on both engines."""
    from sync_cosmos_db_spark.operators.profiling import (
        robust_scale_profile,
    )

    orders = load_table(spark, sf_dir, "orders")
    return robust_scale_profile(orders, "o_orderpriority", "o_totalprice")


# ---------------------------------------------------------------------------
# X125 — local clustering coefficient
# ---------------------------------------------------------------------------

@query(
    "clustering_coeff_docs",
    """
    WITH raw AS (
      SELECT doc_id AS s, (doc_id * 7 + 3) % 500 AS d FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 1) % 500 FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % 500 FROM documents),
    e AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
          FROM raw WHERE s <> d),
    deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
              SELECT lo AS node FROM e
              UNION ALL SELECT hi FROM e) GROUP BY 1),
    tri AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM e e1 JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                      JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
    tn AS (SELECT node, count(*)::BIGINT AS n_tri FROM (
             SELECT a AS node FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri) GROUP BY 1)
    SELECT deg.node, deg.degree,
           coalesce(tn.n_tri, 0)::BIGINT AS n_tri,
           floor(coalesce(tn.n_tri, 0) * 2.0
                 / (deg.degree * (deg.degree - 1)) * 1000000 + 0.5)
             / 1000000 AS cc
    FROM deg LEFT JOIN tn USING (node)
    WHERE deg.degree >= 2
    """,
)
def clustering_coeff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X125 — local clustering coefficient
    (``graph.clustering_coefficient``) over the same ring-chord doc
    graph as the X47 triangle count: per-node neighborhood tightness
    from compact-forward wedge enumeration; the oracle recounts with
    an independent 3-way self-join."""
    from sync_cosmos_db_spark.operators.graph import (
        clustering_coefficient,
    )

    docs = load_table(spark, sf_dir, "documents")
    raw = (docs.select(F.col("doc_id").alias("src"),
                       ((F.col("doc_id") * 7 + 3) % 500).alias("dst"))
           .unionByName(docs.select(
               F.col("doc_id").alias("src"),
               ((F.col("doc_id") + 1) % 500).alias("dst")))
           .unionByName(docs.select(
               F.col("doc_id").alias("src"),
               ((F.col("doc_id") + 2) % 500).alias("dst"))))
    return clustering_coefficient(raw)


# ---------------------------------------------------------------------------
# X126 — out-of-order arrival audit
# ---------------------------------------------------------------------------

@query(
    "out_of_order_events",
    """
    WITH flagged AS (
      SELECT event_type,
             CASE WHEN ts < max(ts) OVER (
                    PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS late
      FROM events)
    SELECT event_type, count(*)::BIGINT AS n,
           sum(late)::BIGINT AS n_late,
           floor(avg(late::DOUBLE) * 1000000 + 0.5) / 1000000
             AS late_rate
    FROM flagged GROUP BY 1
    """,
)
def out_of_order_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X126 — out-of-order arrival audit: per event type, the fraction
    of events whose timestamp precedes the running maximum of their
    user's stream in ARRIVAL order (event_id) — the ingest-quality
    pre-flight that sizes streaming watermarks (A7) and decides
    whether a pipeline needs late-data reconciliation at all.  One
    user-keyed window (running max), one tiny per-type aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    late = F.when(F.col("ts") < F.max("ts").over(w), 1).otherwise(0)
    p = 10 ** 6
    return (ev.withColumn("late", late)
            .groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("late").cast("long").alias("n_late"),
                 (F.floor(F.avg(F.col("late").cast("double")) * p
                          + F.lit(0.5)) / p).alias("late_rate")))


# ---------------------------------------------------------------------------
# X127 — smoothed (m-estimate) target encoding
# ---------------------------------------------------------------------------

@query(
    "target_encode_segments",
    """
    WITH j AS (
      SELECT c.c_mktsegment AS cat, o.o_totalprice::DOUBLE AS t
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    g AS (SELECT avg(t) AS gm FROM j)
    SELECT cat, count(*)::BIGINT AS n,
           floor(avg(t) * 10000 + 0.5) / 10000 AS raw_mean,
           floor((sum(t) + 10.0 * (SELECT gm FROM g))
                 / (count(*) + 10.0) * 10000 + 0.5) / 10000 AS encoded
    FROM j GROUP BY 1
    """,
)
def target_encode_segments(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X127 — m-estimate target encoding (``curation.target_encode``)
    of market segment against order value: the smoothed categorical
    encoder (prior weight m=10) that keeps rare categories from
    memorizing their own targets.  Category-keyed aggregate + 1-row
    global broadcast."""
    from sync_cosmos_db_spark.operators.curation import target_encode

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust),
                    orders["o_custkey"] == cust["c_custkey"])
    return target_encode(j, "c_mktsegment", "o_totalprice", m=10.0)


# ---------------------------------------------------------------------------
# X128 — train/eval split leakage audit (row vs group split)
# ---------------------------------------------------------------------------

@query(
    "split_leakage_audit_events",
    """
    WITH rs AS (
      SELECT user_id,
             translate(substr(sha256(event_id::VARCHAR || ':rowsplit'),
                              1, 6), 'abcdef', '012345')::BIGINT % 2 AS b
      FROM events),
    rg AS (SELECT user_id,
                  sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS tr,
                  sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS ev
           FROM rs GROUP BY 1),
    gs AS (
      SELECT user_id,
             translate(substr(sha256(user_id::VARCHAR || ':groupsplit'),
                              1, 6), 'abcdef', '012345')::BIGINT % 2 AS b,
             count(*) AS c
      FROM events GROUP BY 1, 2)
    SELECT 'row' AS method,
           sum(tr)::BIGINT AS n_train, sum(ev)::BIGINT AS n_eval,
           count(*)::BIGINT AS n_groups,
           sum(CASE WHEN tr > 0 AND ev > 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_leaky_groups
    FROM rg
    UNION ALL
    SELECT 'group',
           sum(CASE WHEN b = 0 THEN c ELSE 0 END)::BIGINT,
           sum(CASE WHEN b = 1 THEN c ELSE 0 END)::BIGINT,
           count(*)::BIGINT, 0::BIGINT
    FROM gs
    """,
)
def split_leakage_audit_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X128 — split-leakage audit (``curation.group_split_audit``):
    a row-level hash split scatters most users across train AND eval
    (the memorization leak); the user-keyed split has structurally
    zero leaky groups — the pre-flight assertion before any
    fine-tune.  Both splits are deterministic sha2 buckets, never
    ``rand()``."""
    from sync_cosmos_db_spark.operators.curation import group_split_audit

    ev = load_table(spark, sf_dir, "events")
    return group_split_audit(ev, "event_id", "user_id")


# ---------------------------------------------------------------------------
# X129 — trapezoidal time-weighted average
# ---------------------------------------------------------------------------

@query(
    "twa_user_value",
    """
    WITH paired AS (
      SELECT user_id, epoch(ts) AS t, value::DOUBLE AS v,
             lead(epoch(ts)) OVER w AS t2,
             lead(value::DOUBLE) OVER w AS v2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    areas AS (
      SELECT user_id, (v2 + v) / 2 * (t2 - t) AS area, t2 - t AS dt
      FROM paired WHERE t2 IS NOT NULL)
    SELECT user_id, (count(*) + 1)::BIGINT AS n_obs,
           floor(sum(area) / sum(dt) * 10000 + 0.5) / 10000 AS twa
    FROM areas GROUP BY 1
    HAVING sum(dt) > 0
    """,
)
def twa_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X129 — trapezoidal time-weighted average of event value per
    user (``temporal.time_weighted_avg``): the correct mean for
    irregularly sampled series — one user-keyed lead window, one
    reduce, no self-join."""
    from sync_cosmos_db_spark.operators.temporal import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev, "user_id", "ts", "value",
                             order_col="event_id")


# ---------------------------------------------------------------------------
# X130 — pairwise centroid cosine matrix
# ---------------------------------------------------------------------------

@query(
    "centroid_cosine_labels",
    """
    WITH dv AS (
      SELECT label AS g,
             generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings),
    cent AS (SELECT g, dim,
                    floor(avg(v) * 10000000000 + 0.5) / 10000000000 AS c
             FROM dv GROUP BY 1, 2),
    nrm AS (SELECT g, sqrt(sum(c * c)) AS nrm FROM cent GROUP BY 1),
    dots AS (SELECT a.g AS ga, b.g AS gb, sum(a.c * b.c) AS dot
             FROM cent a JOIN cent b ON a.dim = b.dim AND a.g < b.g
             GROUP BY 1, 2)
    SELECT ga AS group_a, gb AS group_b,
           floor(dot / (na.nrm * nb.nrm) * 10000 + 0.5) / 10000 AS cos
    FROM dots
    JOIN nrm na ON na.g = ga
    JOIN nrm nb ON nb.g = gb
    """,
)
def centroid_cosine_labels(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X130 — pairwise cosine between per-label embedding centroids
    (``similarity.centroid_cosine_matrix``): the class-confusion /
    source-redundancy matrix at embedding level.  Centroids are
    rounded to 10 decimals before any product on BOTH engines so
    summation-order ulps cannot flip the 4-decimal output."""
    from sync_cosmos_db_spark.operators.similarity import (
        centroid_cosine_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_cosine_matrix(emb, "label", "embedding")


# ---------------------------------------------------------------------------
# X131 — deterministic per-key rate limiting
# ---------------------------------------------------------------------------

@query(
    "rate_limit_hourly",
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
def rate_limit_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X131 — deterministic per-key rate limiting: admit the first 5
    events per (user, hour) in (ts, event_id) order, drop the rest —
    the batch replay of an API throttle / abuse damper, and the
    at-scale shape of per-entity cap enforcement in ingest.  ONE
    (user, window)-keyed row_number window (partitions are
    user-hour-sized — tiny even when a user is globally hot), one
    hour-keyed reduce."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    w = Window.partitionBy("user_id", hour).orderBy("ts", "event_id")
    admitted = (F.row_number().over(w) <= 5).cast("long")
    return (ev.withColumn("adm", admitted)
            .groupBy(F.unix_timestamp(hour).alias("window_start"))
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum("adm").cast("long").alias("n_admitted"),
                 (F.count("*") - F.sum("adm")).cast("long")
                 .alias("n_dropped")))


# ---------------------------------------------------------------------------
# X132 — referential-integrity orphan audit
# ---------------------------------------------------------------------------

@query(
    "ri_orphan_audit",
    """
    SELECT 'orders.custkey->customer' AS fk,
           (SELECT count(*) FROM orders)::BIGINT AS n_child,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))::BIGINT
             AS n_orphans
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))::BIGINT
    UNION ALL
    SELECT 'lineitem.partkey->part',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))::BIGINT
    UNION ALL
    SELECT 'orders.custkey->customer[acctbal>0]',
           (SELECT count(*) FROM orders)::BIGINT,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey
                                AND c.c_acctbal > 0))::BIGINT
    """,
)
def ri_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X132 — referential-integrity orphan audit: child rows whose
    foreign key has no parent, for every FK edge of the star schema —
    the pre-flight that catches partial loads and CDC races before a
    join silently drops rows.  Each audit is one LEFT ANTI join
    (broadcast for dimension parents, shuffle-keyed for fact-fact);
    the fourth row audits against a RESTRICTED parent set
    (acctbal > 0) to demonstrate a nonzero finding on clean data."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    def audit(name, child, parent, ck, pk, bcast):
        p = parent.select(pk).distinct()
        if bcast:
            p = F.broadcast(p)
        orphans = child.join(p, child[ck] == p[pk], "left_anti")
        return (child.agg(F.count("*").cast("long").alias("n_child"))
                .crossJoin(F.broadcast(
                    orphans.agg(F.count("*").cast("long")
                                .alias("n_orphans"))))
                .select(F.lit(name).alias("fk"), "n_child", "n_orphans"))

    return (audit("orders.custkey->customer", orders, cust,
                  "o_custkey", "c_custkey", True)
            .unionByName(audit("lineitem.orderkey->orders", li, orders,
                               "l_orderkey", "o_orderkey", False))
            .unionByName(audit("lineitem.partkey->part", li, part,
                               "l_partkey", "p_partkey", True))
            .unionByName(audit("orders.custkey->customer[acctbal>0]",
                               orders,
                               cust.filter(F.col("c_acctbal") > 0),
                               "o_custkey", "c_custkey", True)))


# ---------------------------------------------------------------------------
# X134 — sliding-window chunking with overlap
# ---------------------------------------------------------------------------

@query(
    "stride_chunks_documents",
    """
    WITH base AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS arr
      FROM documents),
    st AS (
      SELECT doc_id, arr, unnest(generate_series(0, len(arr) - 1, 24))
               AS start
      FROM base)
    SELECT doc_id, (start // 24)::BIGINT AS chunk_idx,
           least(32, len(arr) - start)::BIGINT AS n_chunk_tokens,
           arr[start + 1] AS head_tok
    FROM st
    """,
)
def stride_chunks_documents(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X134 — sliding-window chunking with overlap
    (``curation.stride_chunks``, W=32 S=24): the RAG ingestion cut
    that keeps 8 tokens of context across boundaries.  Entirely
    in-row (``sequence`` + ``slice`` over the token array) — zero
    shuffle."""
    from sync_cosmos_db_spark.operators.curation import stride_chunks

    docs = load_table(spark, sf_dir, "documents")
    return stride_chunks(docs, "doc_id", "text", window=32, stride=24)
