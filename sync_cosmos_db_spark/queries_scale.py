"""Round-3 scale-pattern queries: runtime-filter join pruning,
time-series gap-fill + forward fill, TF-IDF related documents,
incremental aggregate maintenance, and embedding centroid outliers.

Every query is oracle-checked (hash-compared against DuckDB at
sf0.01).  Two of them are *algebra proofs* as much as value checks:

* ``runtime_filter_orders`` — the pruned plan must equal the unpruned
  semi join bit-for-bit (no false negatives in the hash filter);
* ``incr_agg_orders_merge`` — states built over an old/new split and
  merged must equal one full-scan aggregate (mergeability of the
  count/sum/min/max monoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.cache_scope import scoped_local_checkpoint
from sync_cosmos_db_spark.operators import aggstate as S
from sync_cosmos_db_spark.operators.profiling import centroid_outliers
from sync_cosmos_db_spark.operators.pruning import runtime_filter_semi_join
from sync_cosmos_db_spark.operators.retrieval import tfidf_related
from sync_cosmos_db_spark.operators.temporal import gap_fill
from sync_cosmos_db_spark.queries import fround, fsum, query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# Runtime-filter join pruning (operators/pruning.py)
# ---------------------------------------------------------------------------

@query(
    "runtime_filter_orders",
    """
    SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
           count(*)::BIGINT AS n_orders,
           sum(floor(o.o_totalprice * 100 + 0.5)::BIGINT) / 100.0
             AS revenue
    FROM orders o
    WHERE o.o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 7500)
    GROUP BY month
    """,
)
def runtime_filter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order revenue for a selective customer segment, with
    the fact side pruned by a runtime hash filter BEFORE the exact
    semi join (operators/pruning.py).  The oracle is the plain
    unpruned semi join — hash equality proves the filter admits no
    false negatives, the core Bloom/runtime-filter contract."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7500))
    kept = runtime_filter_semi_join(orders, cust, "o_custkey", "c_custkey",
                                    num_buckets=1 << 12)
    return (kept.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").cast("long").alias("n_orders"),
             fsum("o_totalprice", 2).alias("revenue")))


# ---------------------------------------------------------------------------
# Gap-fill + forward fill (operators/temporal.py)
# ---------------------------------------------------------------------------

@query(
    "gapfill_daily_order_revenue",
    """
    WITH daily AS (
      SELECT o_orderpriority AS prio, o_orderdate::DATE AS d,
             sum(floor(o_totalprice * 100 + 0.5)::BIGINT) / 100.0 AS rev
      FROM orders WHERE o_orderkey % 50 = 0 GROUP BY prio, d),
    bounds AS (SELECT prio, min(d) AS lo, max(d) AS hi
               FROM daily GROUP BY prio),
    spine AS (SELECT prio,
                     unnest(generate_series(lo, hi, INTERVAL 1 day)) AS ts
              FROM bounds),
    sp AS (SELECT prio, ts::DATE AS d FROM spine)
    SELECT sp.prio, sp.d, daily.rev,
           last_value(daily.rev IGNORE NULLS) OVER (
             PARTITION BY sp.prio ORDER BY sp.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS rev_filled
    FROM sp LEFT JOIN daily USING (prio, d)
    """,
)
def gapfill_daily_order_revenue(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Daily revenue of a sparse order subset (1-in-50 keys) gap-filled
    to a dense per-priority day grid with last-observation-carried-
    forward (operators/temporal.py gap_fill).  Observed values are
    rounded BEFORE the fill so fill-then-round vs round-then-fill
    can't diverge between engines."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.where(F.col("o_orderkey") % 50 == 0)
             .groupBy(F.col("o_orderpriority").alias("prio"),
                      F.to_date("o_orderdate").alias("d"))
             .agg(fsum("o_totalprice", 2).alias("rev")))
    return gap_fill(daily, ["prio"], "d", ["rev"], step="1 day").select(
        "prio", "d", "rev", F.col("rev_filled"))


# ---------------------------------------------------------------------------
# TF-IDF related documents (operators/retrieval.py)
# ---------------------------------------------------------------------------

@query(
    "tfidf_related_docs",
    """
    WITH corpus AS (
      SELECT doc_id,
             text || ' ka' || (doc_id % 23) || ' kb' || (doc_id % 41) AS t
      FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term
             FROM corpus),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
           FROM toks GROUP BY doc_id, term),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM corpus),
    dfreq AS (SELECT term, count(*)::DOUBLE AS df_t FROM tf
              GROUP BY term HAVING count(*) <= 50),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * ln(n.n_docs / dfreq.df_t) AS w
          FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    unit AS (SELECT doc_id, term,
                    w / sqrt(sum(w * w) OVER (PARTITION BY doc_id)) AS u
             FROM w),
    pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             floor(sum(a.u * b.u) * 1000000 + 0.5) / 1000000 AS cosine
      FROM unit a JOIN unit b USING (term)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    sym AS (SELECT a, b, cosine FROM pairs
            UNION ALL SELECT b, a, cosine FROM pairs)
    SELECT a AS doc_id, b AS related_id, cosine,
           row_number() OVER (PARTITION BY a
                              ORDER BY cosine DESC, b)::BIGINT AS rk
    FROM sym
    QUALIFY rk <= 1
    """,
)
def tfidf_related_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 related document per document under L2-normalized TF-IDF
    cosine (operators/retrieval.py tfidf_related).  The corpus gets two
    injected low-df marker tokens per doc so the df cap (50) does real
    work: the 31 natural stop-word-grade terms (df ≈ 400/500) are
    pruned from the quadratic term self-join while the markers
    (df ≈ 13-22) and one genuinely rare natural term survive —
    exactly the stop-word-vs-signal split the cap exists for."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" ka"), (F.col("doc_id") % 23).cast("string"),
                 F.lit(" kb"), (F.col("doc_id") % 41).cast("string"))
        .alias("text"))
    return tfidf_related(corpus, max_df=50, top_n=1)


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (operators/aggstate.py)
# ---------------------------------------------------------------------------

@query(
    "incr_agg_orders_merge",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*)::BIGINT AS n,
           sum(floor(o_totalprice * 10000 + 0.5)::BIGINT) / 10000.0
             AS total,
           floor(min(o_totalprice) * 10000 + 0.5) / 10000 AS lo,
           floor(max(o_totalprice) * 10000 + 0.5) / 10000 AS hi,
           floor(sum(floor(o_totalprice * 10000 + 0.5)::BIGINT)::DOUBLE
                 / count(*) + 0.5) / 10000 AS mean
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def incr_agg_orders_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (operators/aggstate.py):
    mergeable count/sum/min/max states built SEPARATELY over an
    old/new split of orders (before/after 1999-01-01), merged without
    touching base rows, then finalized (avg derived at the end).  The
    oracle is one full-scan aggregate — hash equality is the
    mergeability proof that lets a standing 100 TB aggregate absorb a
    daily delta with delta-only scan cost."""
    orders = load_table(spark, sf_dir, "orders")
    keys = ["o_orderstatus", "o_orderpriority"]
    cut = F.lit("1999-01-01").cast("timestamp")
    base = S.agg_state(orders.where(F.col("o_orderdate") < cut),
                       keys, "o_totalprice")
    delta = S.agg_state(orders.where(F.col("o_orderdate") >= cut),
                        keys, "o_totalprice")
    return S.finalize(S.merge_states(base, delta, keys), keys)


# ---------------------------------------------------------------------------
# Embedding centroid outliers (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "embedding_centroid_outliers",
    """
    WITH e AS (
      SELECT vec_id, label,
             unnest(embedding::DOUBLE[]) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings),
    cent AS (SELECT label, pos,
                    floor(avg(v) * 1000000 + 0.5) / 1000000 AS c
             FROM e GROUP BY label, pos),
    d AS (SELECT e.vec_id, e.label,
                 floor(sqrt(sum((e.v - cent.c) * (e.v - cent.c)))
                       * 10000 + 0.5) / 10000 AS dist
          FROM e JOIN cent USING (label, pos)
          GROUP BY e.vec_id, e.label)
    SELECT vec_id, label, dist,
           row_number() OVER (PARTITION BY label
                              ORDER BY dist DESC, vec_id)::BIGINT AS rk
    FROM d
    QUALIFY rk <= 5
    """,
)
def embedding_centroid_outliers(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: top-5 vectors farthest from their
    class centroid (operators/profiling.py centroid_outliers).
    Centroids are computed relationally (shuffle carries label×dim
    partial aggregates, never vectors) and rounded before the distance
    HOF; distances are rounded before ranking, so both engines rank
    identically despite different summation orders."""
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_outliers(emb, top_n=5)


# ---------------------------------------------------------------------------
# Curation text cleanup (operators/text.py clean_text)
# ---------------------------------------------------------------------------

@query(
    "clean_text_roundtrip",
    r"""
    WITH noisy AS (
      SELECT doc_id,
             text || chr(9) || 'wow!!!!!' || chr(1) || '   done...........'
                  || chr(11) || '  ' AS t
      FROM documents),
    cleaned AS (
      -- models ALL of clean_text's squeezes (! ? . , ; :) in the same
      -- order, so a regenerated fixture containing e.g. ',,,' still
      -- hashes identically (round-3 ADVICE, text.py:485)
      SELECT doc_id, t,
        trim(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
            '!{3,}', '!', 'g'), '\?{3,}', '?', 'g'),
            '\.{3,}', '.', 'g'), ',{3,}', ',', 'g'),
            ';{3,}', ';', 'g'), ':{3,}', ':', 'g'),
          '\s+', ' ', 'g')) AS c
      FROM noisy)
    SELECT doc_id, sha256(c) AS clean_sha,
           (length(t) - length(c))::BIGINT AS removed
    FROM cleaned
    """,
)
def clean_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation text cleanup (operators/text.py clean_text) over a
    corpus with deterministically injected noise: control characters,
    punctuation runs, whitespace runs, trailing blanks.  The cleaned
    text is sha-hash-compared byte-for-byte, so both engines are held
    to the exact same normalization semantics (the reason every
    pattern is RE2-safe)."""
    from sync_cosmos_db_spark.operators.text import clean_text

    docs = load_table(spark, sf_dir, "documents")
    noisy = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit("\twow!!!!!\x01   done...........\x0b  "))
        .alias("t"))
    return noisy.select(
        "doc_id",
        F.sha2(clean_text("t"), 256).alias("clean_sha"),
        (F.length("t") - F.length(clean_text("t")))
        .cast("long").alias("removed"))


# ---------------------------------------------------------------------------
# URL canonicalization (operators/url.py)
# ---------------------------------------------------------------------------

@query(
    "url_canonical_groups",
    """
    WITH urls AS (
      SELECT doc_id,
        CASE doc_id % 4
          WHEN 0 THEN 'https://www.site' || (doc_id % 5)
                      || '.com/p/' || (doc_id % 10) || '?a=1&b=2'
          WHEN 1 THEN 'HTTPS://WWW.SITE' || (doc_id % 5)
                      || '.COM:443/p/' || (doc_id % 10) || '?b=2&a=1#frag'
          WHEN 2 THEN 'https://www.site' || (doc_id % 5)
                      || '.com:443/p/' || (doc_id % 10) || '?a=1&b=2#x'
          ELSE 'not a url ' || doc_id
        END AS url
      FROM documents),
    expected AS (
      -- the INDEPENDENT expectation: canonical form derived from the
      -- synthetic arithmetic, not by re-running any URL parser
      SELECT doc_id,
        CASE WHEN doc_id % 4 = 3 THEN 'not a url ' || doc_id
             ELSE 'https://www.site' || (doc_id % 5) || '.com/p/'
                  || (doc_id % 10) || '?a=1&b=2' END AS canon,
        CASE WHEN doc_id % 4 = 3 THEN ''
             ELSE 'site' || (doc_id % 5) || '.com' END AS domain
      FROM urls)
    SELECT canon, domain, count(*)::BIGINT AS n_variants,
           count(DISTINCT doc_id)::BIGINT AS n_docs
    FROM expected GROUP BY canon, domain
    """,
)
def url_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/url.py): host/scheme case,
    explicit default ports, fragments, and query-parameter order all
    collapse to one canonical form; non-URLs pass through trimmed.
    The oracle computes the EXPECTED canonical directly from the
    synthetic derivation arithmetic — an independent expectation, so a
    bug in the regexp chain can't cancel out of both sides."""
    from sync_cosmos_db_spark.operators.url import (canonicalize_url,
                                                    registrable_domain)

    docs = load_table(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 5).cast("string")
    m = (F.col("doc_id") % 10).cast("string")
    v = F.col("doc_id") % 4
    url = (F.when(v == 0, F.concat(F.lit("https://www.site"), k,
                                   F.lit(".com/p/"), m, F.lit("?a=1&b=2")))
           .when(v == 1, F.concat(F.lit("HTTPS://WWW.SITE"), k,
                                  F.lit(".COM:443/p/"), m,
                                  F.lit("?b=2&a=1#frag")))
           .when(v == 2, F.concat(F.lit("https://www.site"), k,
                                  F.lit(".com:443/p/"), m,
                                  F.lit("?a=1&b=2#x")))
           .otherwise(F.concat(F.lit("not a url "),
                               F.col("doc_id").cast("string"))))
    urls = docs.select("doc_id", url.alias("url"))
    return (urls.select(
        "doc_id",
        canonicalize_url("url").alias("canon"),
        F.when(v == 3, F.lit(""))
        .otherwise(registrable_domain("url")).alias("domain"))
        .groupBy("canon", "domain")
        .agg(F.count("*").cast("long").alias("n_variants"),
             F.count_distinct("doc_id").cast("long").alias("n_docs")))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (operators/sketches.py)
# ---------------------------------------------------------------------------

@query(
    "heavy_hitter_terms",
    """
    WITH toks AS (SELECT unnest(string_split_regex(text, '\\s+')) AS item
                  FROM documents),
    n AS (SELECT count(*) AS total FROM toks)
    SELECT item, count(*)::BIGINT AS cnt
    FROM toks CROSS JOIN n
    GROUP BY item, n.total
    HAVING count(*) * 30 > n.total
    """,
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters (terms with count > n/30) via the
    Misra-Gries sketch-then-verify pipeline (operators/sketches.py,
    k=29 — chosen so the bar lands mid-distribution for this corpus:
    16 of 31 vocabulary terms qualify, a discriminating non-empty
    result rather than a vacuous all-or-nothing one): bounded-memory per-partition summaries (mapInPandas) feed a
    candidate superset — guaranteed to contain every true heavy hitter
    under any partitioning — and an exact recount of only the
    candidates applies the integer threshold.  The oracle is the plain
    full groupBy + HAVING, so hash equality proves the sketch's
    containment guarantee end-to-end."""
    from sync_cosmos_db_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("item"))
    return heavy_hitters(toks, "item", k=29)


# ---------------------------------------------------------------------------
# Time-hierarchy rollup (A9 SQL frontend / A2 GROUPING SETS)
# ---------------------------------------------------------------------------

@query(
    "rollup_time_hierarchy",
    """
    SELECT year(o_orderdate)::BIGINT AS y,
           month(o_orderdate)::BIGINT AS mo,
           count(*)::BIGINT AS n,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT) / 100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((year(o_orderdate)),
                            (year(o_orderdate), month(o_orderdate)))
    """,
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate shape: yearly and monthly order revenue in
    ONE scan via GROUPING SETS (the time-hierarchy twin of agg_cube /
    agg_rollup).  Spark expands grouping sets in a single Expand +
    aggregate — one pass over the fact table feeds every granularity,
    the same plan a hypertable rollup maintains incrementally."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_th")
    return spark.sql("""
        SELECT year(o_orderdate) AS y,
               month(o_orderdate) AS mo,
               count(*) AS n,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 / CAST(100.0 AS DOUBLE) AS revenue
        FROM __orders_th
        GROUP BY GROUPING SETS ((year(o_orderdate)),
                                (year(o_orderdate), month(o_orderdate)))
    """).select(F.col("y").cast("long"), F.col("mo").cast("long"),
                F.col("n").cast("long"), "revenue")


# ---------------------------------------------------------------------------
# Data-quality expectations (operators/expectations.py)
# ---------------------------------------------------------------------------

@query(
    "expectations_orders",
    """
    WITH n AS (SELECT count(*) AS t FROM orders),
    v AS (
      SELECT 'custkey_not_null' AS rule,
             count(*) FILTER (WHERE o_custkey IS NULL) AS nv FROM orders
      UNION ALL
      SELECT 'price_positive',
             count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
      UNION ALL
      SELECT 'status_in_domain',
             count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
      FROM orders
      UNION ALL
      SELECT 'priority_format',
             count(*) FILTER (WHERE NOT regexp_matches(o_orderpriority,
                                                       '^[1-5]-'))
      FROM orders
      UNION ALL
      SELECT 'date_in_range',
             count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01'
                              OR o_orderdate >= TIMESTAMP '2010-01-01')
      FROM orders)
    SELECT rule, nv::BIGINT AS n_violations, n.t::BIGINT AS n_rows,
           floor((1.0 - nv::DOUBLE / n.t) * 1000000 + 0.5) / 1000000
             AS pass_rate
    FROM v CROSS JOIN n
    """,
)
def expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (operators/expectations.py)
    over orders: five invariants (null key, non-positive price, status
    domain, priority format, date range) evaluated in ONE scan — each
    rule is a conditional sum inside a single aggregate, so rule count
    doesn't multiply passes.  The oracle recomputes each violation
    count independently."""
    from sync_cosmos_db_spark.operators.expectations import check_rules

    orders = load_table(spark, sf_dir, "orders")
    rules = {
        "custkey_not_null": F.col("o_custkey").isNull(),
        "price_positive": F.col("o_totalprice") <= 0,
        "status_in_domain": ~F.col("o_orderstatus").isin("O", "F", "P"),
        "priority_format": ~F.col("o_orderpriority").rlike("^[1-5]-"),
        "date_in_range":
            (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate")
               >= F.lit("2010-01-01").cast("timestamp")),
    }
    return check_rules(orders, rules)


@query(
    "referential_orphans",
    """
    WITH fact AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 10000000
                  ELSE o_custkey END AS fk
      FROM orders)
    SELECT count(*)::BIGINT AS n_orphans,
           min(o_orderkey)::BIGINT AS first_bad,
           max(o_orderkey)::BIGINT AS last_bad
    FROM fact
    WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = fact.fk)
    """,
)
def referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity expectation: orders rows whose (planted,
    1-in-97) customer key has no match in the dimension, found with a
    broadcast LEFT ANTI join — dimension keys ship to executors, the
    fact table never shuffles (operators/expectations.py
    referential_violations)."""
    from sync_cosmos_db_spark.operators.expectations import (
        referential_violations)

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    fact = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0,
               F.col("o_custkey") + 10_000_000)
        .otherwise(F.col("o_custkey")).alias("fk"))
    bad = referential_violations(fact, "fk", cust, "c_custkey")
    return bad.agg(F.count("*").cast("long").alias("n_orphans"),
                   F.min("o_orderkey").cast("long").alias("first_bad"),
                   F.max("o_orderkey").cast("long").alias("last_bad"))


# ---------------------------------------------------------------------------
# Unpivot / melt (A2 adjunct)
# ---------------------------------------------------------------------------

@query(
    "unpivot_customer_metrics",
    """
    SELECT c_custkey, 'acctbal' AS metric,
           floor(c_acctbal * 100 + 0.5) / 100 AS value
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey', c_nationkey::DOUBLE FROM customer
    """,
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of per-customer metrics via the in-row
    ``stack`` generator — the inverse of ``agg_pivot_*``.  No shuffle:
    each input row expands to k output rows inside the scan projection,
    which is the only shape that survives a 100 TB melt (a join-based
    melt would shuffle the fact k times)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr("""stack(2,
            'acctbal', floor(c_acctbal * 100 + 0.5) / 100,
            'nationkey', cast(c_nationkey AS double))
            AS (metric, value)"""))


# ---------------------------------------------------------------------------
# Triangle counting (operators/graph.py)
# ---------------------------------------------------------------------------

@query(
    "triangle_count_docs",
    """
    WITH raw AS (
      SELECT doc_id AS s, (doc_id * 7 + 3) % 500 AS d FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 1) % 500 FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % 500 FROM documents),
    e AS (SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi
          FROM raw WHERE s <> d)
    SELECT count(*)::BIGINT AS n_triangles
    FROM e e1 JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
              JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
    """,
)
def triangle_count_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count (operators/graph.py triangle_count) over a
    synthetic doc-graph (ring chords guarantee a known-dense triangle
    population).  Spark enumerates wedges from the canonical low-node
    orientation and probes closing edges — the compact-forward bound
    that keeps hub wedges from exploding; the oracle counts the same
    triangles with an independent 3-way self-join formulation."""
    from sync_cosmos_db_spark.operators.graph import triangle_count

    docs = load_table(spark, sf_dir, "documents")
    raw = (docs.select(F.col("doc_id").alias("src"),
                       ((F.col("doc_id") * 7 + 3) % 500).alias("dst"))
           .unionByName(docs.select(
               F.col("doc_id").alias("src"),
               ((F.col("doc_id") + 1) % 500).alias("dst")))
           .unionByName(docs.select(
               F.col("doc_id").alias("src"),
               ((F.col("doc_id") + 2) % 500).alias("dst"))))
    return triangle_count(raw)


# ---------------------------------------------------------------------------
# Spatial grid radius join (operators/spatial.py)
# ---------------------------------------------------------------------------

@query(
    "spatial_radius_pairs",
    """
    WITH pts AS (
      SELECT c_custkey AS pid,
             (c_custkey % 97)::DOUBLE + (c_custkey % 13)::DOUBLE / 26.0
               AS x,
             (c_custkey % 89)::DOUBLE + (c_custkey % 7)::DOUBLE / 14.0
               AS y
      FROM customer)
    SELECT a.pid AS a_id, b.pid AS b_id,
           floor(sqrt((a.x - b.x) * (a.x - b.x)
                      + (a.y - b.y) * (a.y - b.y)) * 10000 + 0.5) / 10000
             AS dist
    FROM pts a JOIN pts b ON a.pid < b.pid
    WHERE sqrt((a.x - b.x) * (a.x - b.x)
               + (a.y - b.y) * (a.y - b.y)) <= 0.5
    """,
)
def spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed radius self-join (operators/spatial.py): all
    customer-point pairs within r=0.5 on a synthetic plane.  Spark
    equi-joins on 3×3-replicated grid cells with the exact Euclidean
    predicate as a residual filter — no theta-join, no cross product;
    the oracle is the UNBLOCKED n² form, so hash equality doubles as a
    proof that the grid decomposition loses no pairs."""
    from sync_cosmos_db_spark.operators.spatial import radius_join

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("pid"),
        ((F.col("c_custkey") % 97).cast("double")
         + (F.col("c_custkey") % 13).cast("double") / 26.0).alias("x"),
        ((F.col("c_custkey") % 89).cast("double")
         + (F.col("c_custkey") % 7).cast("double") / 14.0).alias("y"))
    a = pts.select(F.col("pid").alias("a_id"), F.col("x").alias("ax"),
                   F.col("y").alias("ay"))
    b = pts.select(F.col("pid").alias("b_id"), F.col("x").alias("bx"),
                   F.col("y").alias("by"))
    joined = radius_join(a, b, 0.5, "ax", "ay", "bx", "by")
    return (joined.where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id",
                    (F.floor(F.col("dist") * 10000 + F.lit(0.5)) / 10000)
                    .alias("dist")))


# ---------------------------------------------------------------------------
# SQL-surface completion: remaining window / aggregate / array functions
# ---------------------------------------------------------------------------

@query(
    "window_rank_distributions",
    """
    SELECT o_orderkey,
           o_orderstatus,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000
             AS pct_rank,
           floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cume,
           floor(nth_value(o_totalprice, 3) OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 100 + 0.5) / 100 AS third_lowest
    FROM orders
    WHERE o_orderkey % 20 = 0
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 completion: percent_rank, cume_dist, nth_value — the rank-
    distribution window functions not yet covered by window_* queries.
    Orders are made unique-sortable (price, key) so both engines rank
    identically; ratios are pre-rounded."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 20 == 0)
    w = (W.partitionBy("o_orderstatus")
         .orderBy("o_totalprice", "o_orderkey"))
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    p = 10 ** 6
    return orders.select(
        "o_orderkey", "o_orderstatus",
        (F.floor(F.percent_rank().over(w) * p + F.lit(0.5)) / p)
        .alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * p + F.lit(0.5)) / p)
        .alias("cume"),
        (F.floor(F.nth_value("o_totalprice", 3).over(wf) * 100
                 + F.lit(0.5)) / 100).alias("third_lowest"))


@query(
    "agg_median_mode",
    """
    SELECT o_orderstatus,
           floor(median(o_totalprice) * 10000 + 0.5) / 10000 AS med_price,
           min(o_orderpriority ORDER BY o_orderpriority) FILTER (
             WHERE o_orderpriority IN (
               SELECT o_orderpriority FROM orders o2
               WHERE o2.o_orderstatus = orders.o_orderstatus
               GROUP BY o_orderpriority
               HAVING count(*) = (
                 SELECT max(c) FROM (
                   SELECT count(*) AS c FROM orders o3
                   WHERE o3.o_orderstatus = orders.o_orderstatus
                   GROUP BY o_orderpriority))))
             AS mode_priority
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 completion: exact MEDIAN and (deterministic smallest-value)
    MODE per group.  Spark's mode() breaks frequency ties arbitrarily,
    so the mode is computed relationally — frequency ranking with a
    (count DESC, value ASC) order — which pins tie-breaks identically
    in both engines; the DuckDB twin derives the same winner through
    correlated subqueries."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderstatus").agg(
        (F.floor(F.median("o_totalprice") * 10000 + F.lit(0.5)) / 10000)
        .alias("med_price"))
    freq = (orders.groupBy("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("c")))
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("c"), F.asc("o_orderpriority"))
    mode = (freq.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("mode_priority")))
    return med.join(mode, "o_orderstatus")


@query(
    "array_set_ops_users",
    """
    WITH early AS (
      SELECT user_id, list_sort(list(DISTINCT event_type)) AS a
      FROM events WHERE year(ts) % 2 = 0 GROUP BY user_id),
    late AS (
      SELECT user_id, list_sort(list(DISTINCT event_type)) AS b
      FROM events WHERE year(ts) % 2 = 1 GROUP BY user_id)
    SELECT e.user_id,
           len(e.a)::BIGINT AS n_early,
           len(l.b)::BIGINT AS n_late,
           len(list_intersect(e.a, l.b))::BIGINT AS n_common,
           len(list_distinct(list_concat(e.a, l.b)))::BIGINT AS n_union
    FROM early e JOIN late l USING (user_id)
    """,
)
def array_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 completion: array_intersect / array_union / array_distinct
    over per-user event-type sets from two time slices.  Set sizes
    (order-free) are compared rather than raw arrays, since engines
    order set-function output differently."""
    events = load_table(spark, sf_dir, "events")
    early = (events.where(F.year("ts") % 2 == 0)
             .groupBy("user_id")
             .agg(F.array_sort(F.collect_set("event_type")).alias("a")))
    late = (events.where(F.year("ts") % 2 == 1)
            .groupBy("user_id")
            .agg(F.array_sort(F.collect_set("event_type")).alias("b")))
    return (early.join(late, "user_id")
            .select("user_id",
                    F.size("a").cast("long").alias("n_early"),
                    F.size("b").cast("long").alias("n_late"),
                    F.size(F.array_intersect("a", "b")).cast("long")
                    .alias("n_common"),
                    F.size(F.array_distinct(F.concat("a", "b")))
                    .cast("long").alias("n_union")))


@query(
    "stringagg_nation_segments",
    """
    SELECT c_nationkey::BIGINT AS nation,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def stringagg_nation_segments(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """A2/A6 completion: ordered string aggregation (LISTAGG shape) —
    per-nation sorted distinct market segments joined with commas.
    Built as array_join(array_sort(collect_set(...))) so the element
    order is pinned (collect order is nondeterministic; the sort is
    what makes the string hash-comparable)."""
    cust = load_table(spark, sf_dir, "customer")
    return (cust.groupBy(F.col("c_nationkey").cast("long").alias("nation"))
            .agg(F.array_join(F.array_sort(F.collect_set("c_mktsegment")),
                              ",").alias("segments")))


# ---------------------------------------------------------------------------
# Schema evolution (mergeSchema read across drifted writes)
# ---------------------------------------------------------------------------

@query(
    "schema_evolution_counts",
    """
    WITH v1 AS (SELECT doc_id, lang, NULL::BIGINT AS n_chars
                FROM documents WHERE doc_id % 2 = 0),
    v2 AS (SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 1),
    unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT lang, count(*)::BIGINT AS n_docs,
           count(n_chars)::BIGINT AS n_with_chars,
           sum(coalesce(n_chars, 0))::BIGINT AS total_chars
    FROM unioned GROUP BY lang
    """,
)
def schema_evolution_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift tolerance, the data-lake reality the reference's
    schemaless scan sidesteps: two parquet writes of the same logical
    table with different column sets (an old writer without n_chars,
    a new one with it) are read back in ONE scan via mergeSchema;
    missing columns surface as NULLs, never errors.  Footer-only
    schema union — no data rewrite — which is why it stays viable on
    a 100 TB table with years of writer drift.  The oracle rebuilds
    the same union with explicit NULLs."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="schema_evo_")
    try:
        (docs.where(F.col("doc_id") % 2 == 0)
         .select("doc_id", "lang")
         .write.mode("overwrite").parquet(f"{d}/part=v1"))
        (docs.where(F.col("doc_id") % 2 == 1)
         .select("doc_id", "lang", "n_chars")
         .write.mode("overwrite").parquet(f"{d}/part=v2"))
        merged = (spark.read.option("mergeSchema", "true")
                  .parquet(f"{d}/part=v1", f"{d}/part=v2"))
        out = (merged.groupBy("lang")
               .agg(F.count("*").cast("long").alias("n_docs"),
                    F.count("n_chars").cast("long").alias("n_with_chars"),
                    F.sum(F.coalesce(F.col("n_chars"), F.lit(0)))
                    .cast("long").alias("total_chars")))
        out = out.localCheckpoint()  # materialize before tmpdir cleanup
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# RANGE-frame windows (A3 completion: value-based frames)
# ---------------------------------------------------------------------------

@query(
    "window_range_frame_revenue",
    """
    SELECT o_orderkey,
           o_orderstatus,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT) OVER (
             PARTITION BY o_orderstatus
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 7 PRECEDING AND CURRENT ROW
           ) / 100.0 AS rev_7d
    FROM orders WHERE o_orderkey % 5 = 0
    """,
)
def window_range_frame_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """A3 completion: VALUE-based (RANGE) window frames — trailing
    7-day revenue per order, where the frame is defined by day
    distance, not row count (rows sharing a day all join the frame;
    sparse days shrink it).  Spark evaluates this as one partition-
    keyed sort with a sliding accumulator — same single-exchange shape
    as any other window; the 2dp pre-round absorbs accumulation-order
    float drift between engines."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 5 == 0)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (W.partitionBy("o_orderstatus").orderBy(day.cast("long"))
         .rangeBetween(-7, 0))
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return orders.select(
        "o_orderkey", "o_orderstatus",
        (F.sum(cents).over(w) / 100.0).alias("rev_7d"))


# ---------------------------------------------------------------------------
# End-to-end curation pipeline composition
# ---------------------------------------------------------------------------

def _planted_dup_corpus(docs: DataFrame, exact_mod: int = 10,
                        near_mod: int = 7) -> DataFrame:
    """Corpus with planted duplicates via ONE explode pass over
    ``docs`` (round 16, the graph.symmetrize lesson): the previous
    3-branch union executed the documents scan once PER BRANCH per
    consumption.  Per input doc: itself, an exact byte copy when
    ``doc_id % exact_mod = 0`` (id + 200000), and a near copy with one
    appended token when ``doc_id % near_mod = 0`` (id + 100000).
    Row order differs from the union form but every consumer is an
    aggregate/join, so outputs are identical."""
    v0 = F.struct(F.col("doc_id").alias("doc_id"),
                  F.col("text").alias("text"))
    v1 = F.when(F.col("doc_id") % exact_mod == 0,
                F.struct((F.col("doc_id") + 200000).alias("doc_id"),
                         F.col("text").alias("text")))
    v2 = F.when(F.col("doc_id") % near_mod == 0,
                F.struct((F.col("doc_id") + 100000).alias("doc_id"),
                         F.concat(F.col("text"), F.lit(" extra"))
                         .alias("text")))
    return (docs.select(F.explode(F.array_compact(F.array(v0, v1, v2)))
                        .alias("v"))
            .select("v.doc_id", "v.text"))


def _curation_pipeline_agg(corpus: DataFrame) -> DataFrame:
    """The four-stage curation composition (exact dedup → unigram-
    Jaccard pairs ≥ 0.5 → connected components → canonical keep) over
    an injectable ``corpus (doc_id, text)`` — shared by
    ``curation_pipeline_stats`` and its sampled twin, and accumulator-
    testable with a tagged source (tests/test_single_pass.py).

    ONE pass over the corpus source (round 16): the raw count, exact
    dedup and survivor semi-join each consumed the corpus plan afresh
    (3 passes — 9 executions of the documents scan through the old
    3-branch union construction).  The corpus is cached for exactly
    the stage-1 window and released once survivors (an eager
    checkpoint) is materialized."""
    from sync_cosmos_db_spark.operators.dedup import (
        connected_components, exact_dedup, jaccard_pairs)

    corpus = corpus.persist()
    try:
        n_raw = corpus.count()
        kept = exact_dedup(corpus, ["text"], "doc_id")  # (doc_id, n_copies)
        # localCheckpoint: survivors feeds three consumers and —
        # through the pair graph — the ITERATIVE component loop, which
        # would otherwise re-execute the whole upstream lineage every
        # round
        survivors = scoped_local_checkpoint(
            corpus.join(kept.select("doc_id"), "doc_id", "left_semi"))
    finally:
        corpus.unpersist()
    n_exact = survivors.count()

    pairs = scoped_local_checkpoint(
        jaccard_pairs(survivors, "doc_id", "text", threshold=0.5, n=1))
    # comp feeds THREE consumers (count, cluster election, the final
    # anti-join); connected_components returns an eagerly
    # scope-checkpointed frame since c3db0f9 (dedup.py docstring), so
    # no caller-side persistence is needed — the r14 caller-side
    # scoped_local_checkpoint wrapper double-materialized the labels
    # (round 15, ADVICE r14).
    comp = connected_components(pairs)  # (node, component)
    n_in_clusters = comp.count()
    clusters = comp.groupBy("component").agg(F.min("node").alias("kept"))
    n_clusters = clusters.count()

    final = (survivors.join(comp.withColumnRenamed("node", "doc_id"),
                            "doc_id", "left_anti").select("doc_id")
             .unionByName(clusters.select(F.col("kept").alias("doc_id"))))
    agg = final.agg(F.count("*").cast("long").alias("n_final"),
                    F.sum("doc_id").cast("long").alias("final_id_sum"))
    return agg.select(
        F.lit(n_raw).cast("long").alias("n_raw"),
        F.lit(n_exact).cast("long").alias("n_after_exact"),
        F.lit(n_in_clusters).cast("long").alias("n_in_near_clusters"),
        F.lit(n_clusters).cast("long").alias("n_clusters"),
        "n_final", "final_id_sum")


@query(
    "curation_pipeline_stats",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL               -- exact byte copies (1 in 10)
      SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL               -- near copies: one appended token (1 in 7)
      SELECT doc_id + 100000, text || ' extra' FROM documents
      WHERE doc_id % 7 = 0),
    -- stage 1: exact dedup on content, keep min id
    hashed AS (SELECT doc_id, text, sha256(text) AS dg FROM corpus),
    keepers AS (SELECT min(doc_id) AS doc_id, dg
                FROM hashed GROUP BY dg),
    survivors AS (SELECT k.doc_id, h.text
                  FROM keepers k JOIN hashed h ON h.doc_id = k.doc_id),
    -- stage 2: exact unigram-shingle Jaccard pairs >= 0.5
    toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                    AS tok FROM survivors),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM toks a JOIN toks b USING (tok)
              WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5),
    -- stage 3: connected components (recursive closure over pairs)
    nodes AS (SELECT DISTINCT id_a AS id FROM pairs
              UNION SELECT DISTINCT id_b FROM pairs),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    labels AS (
      SELECT id, id AS lbl FROM nodes
      UNION ALL
      (WITH RECURSIVE walk(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.s, w.lbl FROM edges e JOIN walk w ON w.id = e.d
           WHERE w.lbl < e.s)
       SELECT id, lbl FROM walk)),
    comp AS (SELECT id, min(lbl) AS root FROM labels GROUP BY id),
    -- stage 4: one canonical doc per near-dup cluster + untouched docs
    cluster_keep AS (SELECT min(id) AS kept FROM comp GROUP BY root),
    final AS (
      SELECT doc_id FROM survivors
      WHERE doc_id NOT IN (SELECT id FROM comp)
      UNION ALL SELECT kept FROM cluster_keep)
    SELECT (SELECT count(*) FROM corpus)::BIGINT AS n_raw,
           (SELECT count(*) FROM survivors)::BIGINT AS n_after_exact,
           (SELECT count(*) FROM comp)::BIGINT AS n_in_near_clusters,
           (SELECT count(*) FROM cluster_keep)::BIGINT AS n_clusters,
           (SELECT count(*) FROM final)::BIGINT AS n_final,
           (SELECT sum(doc_id) FROM final)::BIGINT AS final_id_sum
    """,
)
def curation_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline COMPOSITION: raw corpus (with
    planted exact and near duplicates) → exact content dedup
    (operators/dedup.exact_dedup) → exact unigram-Jaccard near-dup
    pairs ≥ 0.5 (jaccard_pairs) → connected components
    (connected_components) → keep one canonical doc per cluster.
    Every stage's cardinality plus the exact kept-id sum is
    hash-checked, so the stages are proven to compose — the oracle
    replays the whole chain in SQL including a recursive-CTE closure.
    Corpus construction and the pipeline body live in
    ``_planted_dup_corpus`` / ``_curation_pipeline_agg`` (round 16) so
    the single-pass contract is accumulator-testable with an injected
    tagged source.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _curation_pipeline_agg(_planted_dup_corpus(docs))
