"""Round-3 pipeline-extension queries: entity linkage, keyword
retrieval (inverted index + BM25), free-text PII redaction, SCD2
dimension history, numeric profiling, and distributed BPE pair
counting.

Every query here is oracle-checked (hash-compared against DuckDB at
sf0.01).  Where the operator is approximate-by-blocking (the fuzzy
join), the derived corpus is constructed so blocking recall is provably
1.0 (edits are interior, so prefix/suffix blocking keys survive), and
the ORACLE runs the unblocked n² form — an independent recall check,
not a re-implementation of the blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators import bpe as B
from sync_cosmos_db_spark.operators import profiling as P
from sync_cosmos_db_spark.operators import retrieval as R
from sync_cosmos_db_spark.operators.linkage import blocked_fuzzy_join
from sync_cosmos_db_spark.operators.temporal import scd2_history
from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.sanitizer import redact_text
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# Entity resolution (operators/linkage.py)
# ---------------------------------------------------------------------------

@query(
    "linkage_fuzzy_customers",
    # r13 oracle rewrite (the sf0.1 sweep's last timeout, 170 s →
    # 1.2 s): the unblocked CROSS JOIN evaluated the O(len²)
    # levenshtein DP on all ~153M pairs.  lev ≤ 1 decomposes EXACTLY
    # (a theorem, not a blocking heuristic, so the oracle stays an
    # independent full-recall ground truth): equal-length pairs
    # satisfy lev ≤ 1 iff hamming ≤ 1 (DuckDB `mismatches`, O(len));
    # pairs whose lengths differ by 1 satisfy it iff the shorter
    # string EQUALS a single-deletion variant of the longer (an
    # equality hash join against the complete ×len deletion
    # neighborhood); length gaps ≥ 2 can never qualify.  Survivor
    # `dist` values are identical (hamming = lev on equal-length
    # survivors; cross-length survivors have lev exactly 1).  The
    # WHERE is CASE-guarded on length equality (ADVICE r13): DuckDB
    # `mismatches` errors on unequal lengths and does not
    # short-circuit, so correctness must not depend on the planner
    # choosing a hash join for the length-equality ON.
    """
    WITH dirty AS (
      SELECT c_custkey + 500000 AS l_id,
             substr(c_name, 1, 9) || 'X' || substr(c_name, 11) AS l_name
      FROM customer WHERE c_custkey % 3 = 1
      UNION ALL
      SELECT c_custkey + 500000,
             substr(c_name, 1, 9) || substr(c_name, 11)
      FROM customer WHERE c_custkey % 3 = 2
      UNION ALL
      SELECT c_custkey + 900000, 'Noise#' || c_name
      FROM customer WHERE c_custkey % 97 = 0
    ),
    eq AS (
      SELECT d.l_id, d.l_name, c.c_custkey AS r_id, c.c_name AS r_name,
             mismatches(d.l_name, c.c_name)::BIGINT AS dist
      FROM dirty d JOIN customer c
        ON length(d.l_name) = length(c.c_name)
      WHERE CASE WHEN length(d.l_name) = length(c.c_name)
                 THEN mismatches(d.l_name, c.c_name) <= 1
                 ELSE false END),
    cvars AS (
      SELECT DISTINCT c_custkey, c_name,
             substr(c_name, 1, i - 1) || substr(c_name, i + 1) AS v
      FROM (SELECT c_custkey, c_name,
                   unnest(generate_series(1, length(c_name))) AS i
            FROM customer)),
    del1 AS (
      SELECT d.l_id, d.l_name, v.c_custkey AS r_id, v.c_name AS r_name,
             1::BIGINT AS dist
      FROM dirty d JOIN cvars v ON d.l_name = v.v
      WHERE length(d.l_name) = length(v.c_name) - 1),
    dvars AS (
      SELECT DISTINCT l_id, l_name,
             substr(l_name, 1, i - 1) || substr(l_name, i + 1) AS v
      FROM (SELECT l_id, l_name,
                   unnest(generate_series(1, length(l_name))) AS i
            FROM dirty)),
    ins1 AS (
      SELECT dv.l_id, dv.l_name, c.c_custkey AS r_id, c.c_name AS r_name,
             1::BIGINT AS dist
      FROM dvars dv JOIN customer c ON dv.v = c.c_name
      WHERE length(dv.l_name) = length(c.c_name) + 1),
    allc AS (SELECT * FROM eq UNION ALL SELECT * FROM del1
             UNION ALL SELECT * FROM ins1)
    SELECT l_id, l_name, r_id, r_name, dist FROM allc
    QUALIFY row_number() OVER (PARTITION BY l_id ORDER BY dist, r_id) = 1
    """,
)
def linkage_fuzzy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (operators/linkage.py): dirty customer-name
    mentions (one interior substitution or one interior deletion at
    char 10, plus unmatched noise rows) resolved back to the customer
    dimension at levenshtein <= 1.

    The Spark side uses prefix/suffix blocking + hot-key gate + verify;
    the oracle is the UNBLOCKED full-recall nearest-neighbor — equality
    is an end-to-end recall proof, valid because interior edits keep
    the suffix key intact and the min-id winner is always the source
    row (any other insertion candidate has a larger key).  The oracle's
    lev ≤ 1 predicate is computed by exact case decomposition (hamming
    at equal length, complete deletion-neighborhood equality at ±1 —
    see the SQL comment), which is still unblocked over every length-
    compatible pair.
    """
    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    sub = cust.filter(F.col("c_custkey") % 3 == 1).select(
        (F.col("c_custkey") + 500000).alias("l_id"),
        F.concat(F.substring(name, 1, 9), F.lit("X"),
                 F.expr("substring(c_name, 11)")).alias("l_name"))
    dele = cust.filter(F.col("c_custkey") % 3 == 2).select(
        (F.col("c_custkey") + 500000).alias("l_id"),
        F.concat(F.substring(name, 1, 9),
                 F.expr("substring(c_name, 11)")).alias("l_name"))
    noise = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 900000).alias("l_id"),
        F.concat(F.lit("Noise#"), name).alias("l_name"))
    dirty = sub.unionByName(dele).unionByName(noise)
    clean = cust.select(F.col("c_custkey").alias("r_id"),
                        F.col("c_name").alias("r_name"))
    return blocked_fuzzy_join(dirty, clean, max_dist=1)


# ---------------------------------------------------------------------------
# Keyword retrieval (operators/retrieval.py)
# ---------------------------------------------------------------------------

@query(
    "retrieval_index_stats",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
           count(*)::BIGINT AS tf_total
    FROM toks GROUP BY term
    ORDER BY df DESC, tf_total DESC, term LIMIT 30
    """,
)
def retrieval_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index term statistics: top 30 terms by document
    frequency (ties: corpus tf, then term).  One explode + one
    term-keyed shuffle with map-side partials."""
    docs = load_table(spark, sf_dir, "documents")
    return (R.build_inverted_index(docs)
            .orderBy(F.desc("df"), F.desc("tf_total"), F.asc("term"))
            .limit(30))


@query(
    "retrieval_bm25_topk",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    dl AS (SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl
           FROM documents),
    q(term) AS (VALUES ('window'), ('merge'), ('vector')),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
           FROM toks JOIN q USING (term) GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*)::DOUBLE AS df_t FROM tf GROUP BY term),
    stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl)
    SELECT tf.doc_id,
           floor(sum(
             ln((stats.n_docs - dfreq.df_t + 0.5) / (dfreq.df_t + 0.5) + 1.0)
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
           ) * 1000000 + 0.5) / 1000000 AS score
    FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id LIMIT 20
    """,
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a 3-term keyword query (Lucene idf form,
    k1=1.2, b=0.75).  Scores rounded before ranking; ties break on
    doc_id.  Corpus stats join back on a constant equi-key
    (BroadcastHashJoin); the global top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    return R.bm25_topk(spark, docs, ["window", "merge", "vector"], k=20)


# ---------------------------------------------------------------------------
# Free-text PII redaction (sanitizer.redact_text)
# ---------------------------------------------------------------------------

@query(
    "redact_pii_text",
    r"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN
               text || ' reach user' || doc_id
                    || '@example.com or call +1 555 0199 now card'
                    || ' 4000-1234-5678-9010'
             ELSE text END AS t
      FROM documents),
    red AS (
      SELECT doc_id, t,
        regexp_replace(regexp_replace(regexp_replace(t,
          '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}', '<CARD>', 'g'),
          '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,6}', '<EMAIL>', 'g'),
          '\+[0-9]{1,3} [0-9]{3} [0-9]{3}[0-9 ]*[0-9]', '<PHONE>', 'g') AS r
      FROM corpus)
    SELECT doc_id, sha256(r) AS red_sha,
           (length(t) - length(r))::BIGINT AS delta_len,
           len(regexp_extract_all(
             t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,6}'))::BIGINT
             AS n_emails
    FROM red
    """,
)
def redact_pii_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text PII redaction (card/email/phone → <LABEL> tokens) over
    a corpus with deterministically injected PII in half the rows.
    Pure regexp_replace chain — zero shuffle, zero UDF; the redacted
    text is hash-compared so every byte of the replacement is checked.
    """
    docs = load_table(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.col("text"), F.lit(" reach user"),
                 F.col("doc_id").cast("string"),
                 F.lit("@example.com or call +1 555 0199 now card"
                       " 4000-1234-5678-9010"))).otherwise(F.col("text"))
    c = docs.select("doc_id", injected.alias("t"))
    red = c.withColumn("r", redact_text("t"))
    return red.select(
        "doc_id",
        F.sha2("r", 256).alias("red_sha"),
        (F.length("t") - F.length("r")).cast("long").alias("delta_len"),
        F.regexp_count(
            "t", F.lit(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,6}"))
        .cast("long").alias("n_emails"))


# ---------------------------------------------------------------------------
# SCD2 history (operators/temporal.scd2_history)
# ---------------------------------------------------------------------------

@query(
    "scd2_user_event_type",
    """
    WITH up AS (
      SELECT user_id, ts, event_type, event_id
      FROM events
      QUALIFY row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id) = 1),
    runs AS (
      SELECT user_id, ts, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM up),
    keep AS (
      SELECT user_id, ts, event_type FROM runs
      WHERE prev IS NULL OR event_type <> prev)
    SELECT user_id,
           epoch_us(ts)::BIGINT AS valid_from_us,
           epoch_us(lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts))::BIGINT AS valid_to_us,
           event_type,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
             AS is_current
    FROM keep
    """,
)
def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of each user's event_type: consecutive equal
    values collapse into one validity interval [valid_from, valid_to);
    the open interval is flagged current.  One shuffle on user_id —
    all three window passes share the exchange."""
    ev = load_table(spark, sf_dir, "events")
    wdup = W.partitionBy("user_id", "ts").orderBy("event_id")
    up = (ev.withColumn("__rn", F.row_number().over(wdup))
          .filter(F.col("__rn") == 1)
          .select("user_id", "ts", "event_type", "event_id"))
    hist = scd2_history(up, "user_id", "ts", "event_type",
                        tiebreak_col="event_id")
    return hist.select(
        "user_id",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "event_type", "is_current")


# ---------------------------------------------------------------------------
# Numeric profiling (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "profile_price_histogram",
    """
    WITH b AS (
      SELECT greatest(0, least(floor((l_extendedprice - 900.0) / 4337.5),
                               23))::BIGINT AS bucket,
             l_extendedprice AS p
      FROM lineitem WHERE l_extendedprice IS NOT NULL)
    SELECT bucket, count(*)::BIGINT AS n,
           floor(min(p) * 10000 + 0.5) / 10000 AS min_v,
           floor(max(p) * 10000 + 0.5) / 10000 AS max_v,
           floor((900.0 + bucket * 4337.5) * 10000 + 0.5) / 10000 AS lo_edge
    FROM b GROUP BY bucket
    """,
)
def profile_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound 24-bucket histogram of lineitem extended price:
    single scan, 24-row shuffle with map-side partials.  Bounds are
    explicit (no min/max pre-pass — at 100 TB that would double the
    scan) and the bucket expression is plain IEEE arithmetic, so the
    histogram is bit-exactly oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    return P.histogram_fixed(li, "l_extendedprice", 900.0, 105000.0, 24)


@query(
    "profile_null_rates",
    """
    SELECT 'o_custkey' AS col_name, count(*)::BIGINT AS n_rows,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_null FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*)::BIGINT,
           sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT
      FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*)::BIGINT,
           sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT
      FROM orders
    """,
)
def profile_null_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rate profile of three orders columns in ONE scan (stacked
    conditional sums, no per-column jobs)."""
    o = load_table(spark, sf_dir, "orders")
    return P.null_profile(o, ["o_custkey", "o_totalprice", "o_orderstatus"])


# ---------------------------------------------------------------------------
# Distributed BPE (operators/bpe.py)
# ---------------------------------------------------------------------------

@query(
    "bpe_pair_counts",
    """
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents),
    wcount AS (SELECT word, count(*)::BIGINT AS c FROM w
               WHERE word <> '' GROUP BY word),
    pairs AS (
      SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, c
      FROM wcount, unnest(generate_series(1, length(word) - 1)) AS t(i)
      UNION ALL
      SELECT substr(word, length(word), 1) AS a, '</w>' AS b, c
      FROM wcount)
    SELECT a, b, sum(c)::BIGINT AS pair_count
    FROM pairs GROUP BY a, b
    ORDER BY pair_count DESC, a, b LIMIT 30
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE iteration over the corpus: top 30 adjacent symbol
    pairs (chars + end-of-word marker) weighted by word frequency.
    The corpus collapses to the distinct-word table first (Zipf: tiny
    vs the corpus), so iterative merge learning (bpe_learn, pinned
    against a pure-Python reference in tests/test_bpe.py) re-reads
    only that table, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    wc = B._init_symbols(B.word_counts(docs))
    return (B.pair_counts(wc)
            .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
            .limit(30))
