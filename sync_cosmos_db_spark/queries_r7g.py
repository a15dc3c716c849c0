"""Round-7 operator families (sixth batch) X191-X194: Kaplan–Meier
survival with right-censoring, ABC (Pareto) classification on a
two-phase distributed cumsum, lexical-diversity profile (TTR / hapax
/ Yule's K), and HITS hubs & authorities — the survival curve X174's
lifecycle bands approximate, the which-keys-carry-80% cut beside
X139's Gini, the spectrum summary beside X86's vocab growth, and the
bipartite mutual-reinforcement ranking beside X33's PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X191 — Kaplan–Meier survival curve
# ---------------------------------------------------------------------------

@query(
    "km_survival_users",
    """
    WITH pu AS (
      SELECT user_id, min(ts)::DATE AS f, max(ts)::DATE AS l
      FROM events GROUP BY 1),
    hw AS (SELECT max(ts)::DATE AS hwm FROM events),
    lab AS (
      SELECT date_diff('day', f, l) AS t_days,
             CASE WHEN date_diff('day', l, hwm) < 30
                  THEN 1 ELSE 0 END AS cens
      FROM pu, hw),
    day AS (SELECT t_days, sum(1 - cens)::BIGINT AS deaths,
                   sum(cens)::BIGINT AS censored
            FROM lab GROUP BY 1),
    r AS (
      SELECT t_days, deaths, censored,
             (sum(deaths + censored) OVER ()
              - coalesce(sum(deaths + censored) OVER (
                  ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0))::BIGINT AS at_risk
      FROM day),
    s AS (
      SELECT t_days, at_risk, deaths, censored,
             sum(CASE WHEN deaths < at_risk
                      THEN ln(1 - deaths::DOUBLE / at_risk)
                      ELSE 0 END)
               OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS lnsum,
             sum(CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS zeros
      FROM r)
    SELECT t_days, at_risk, deaths, censored,
           CASE WHEN zeros > 0 THEN 0.0
                ELSE floor(exp(lnsum) * 1000000 + 0.5) / 1000000
           END AS survival
    FROM s
    """,
)
def km_survival_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X191 — Kaplan–Meier survival over user event-span lifetimes
    (``behavioral.km_survival``): users whose last event is within
    30 days of the corpus high-water mark are right-censored.  One
    user-keyed aggregate + broadcast 1-row high-water mark, then two
    cumulative windows over the O(days) collapsed survival table."""
    from sync_cosmos_db_spark.operators.behavioral import km_survival

    ev = load_table(spark, sf_dir, "events")
    return km_survival(ev, "user_id", "ts", censor_days=30)


# ---------------------------------------------------------------------------
# X192 — ABC (Pareto) classification
# ---------------------------------------------------------------------------

@query(
    "abc_parts_revenue",
    """
    WITH pr AS (
      SELECT l_partkey AS k,
             floor(sum(l_extendedprice) * 100 + 0.5)::BIGINT AS c
      FROM lineitem GROUP BY 1),
    t AS (SELECT sum(c)::BIGINT AS total FROM pr),
    cum AS (
      SELECT k, c,
             sum(c) OVER (ORDER BY c DESC, k
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)::BIGINT AS cum
      FROM pr),
    cls AS (SELECT c,
                   CASE WHEN cum * 100 <= 80 * total THEN 'A'
                        WHEN cum * 100 <= 95 * total THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM cum, t)
    SELECT abc_class, count(*)::BIGINT AS n_keys,
           sum(c) / 100.0 AS value_sum,
           floor(sum(c)::DOUBLE / total * 1000000 + 0.5) / 1000000
             AS value_share
    FROM cls, t GROUP BY abc_class, total
    """,
)
def abc_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X192 — ABC classification of parts by lineitem revenue
    (``profiling.abc_classification``): per-part revenue snaps to
    integer cents BEFORE the scan, the global descending cumsum runs
    on the two-phase distributed index (the X151 lesson applied at
    birth), and the A/80 / B/95 boundaries compare integers — no
    float can flip a part's class between engines."""
    from sync_cosmos_db_spark.operators.profiling import (
        abc_classification,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pr = (li.groupBy(F.col("l_partkey").alias("k"))
          .agg(F.sum("l_extendedprice").alias("v")))
    return abc_classification(pr, "k", "v")


# ---------------------------------------------------------------------------
# X193 — lexical-diversity profile
# ---------------------------------------------------------------------------

@query(
    "lexical_profile_sources",
    """
    WITH toks AS (
      SELECT source AS g,
             unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents),
    c AS (SELECT g, tok, count(*)::BIGINT AS c FROM toks
          WHERE tok <> '' GROUP BY 1, 2),
    a AS (SELECT g, sum(c)::BIGINT AS n_tokens,
                 count(*)::BIGINT AS vocab,
                 sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
                   AS v1,
                 sum(c * c)::BIGINT AS c2
          FROM c GROUP BY 1)
    SELECT g AS source, n_tokens, vocab,
           floor(vocab::DOUBLE / n_tokens * 1000000 + 0.5) / 1000000
             AS ttr,
           floor(v1::DOUBLE / vocab * 1000000 + 0.5) / 1000000
             AS hapax_share,
           floor(10000.0 * (c2 - n_tokens) / n_tokens / n_tokens
                 * 1000000 + 0.5) / 1000000 AS yule_k
    FROM a
    """,
)
def lexical_profile_sources(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X193 — per-source lexical diversity
    (``text.lexical_profile``): TTR, hapax share, Yule's K from one
    (source, token) count aggregate + one source reduce; every
    sufficient statistic is an integer so the engines agree
    exactly."""
    from sync_cosmos_db_spark.operators.text import lexical_profile

    docs = load_table(spark, sf_dir, "documents")
    return lexical_profile(docs, "source", "text")


# ---------------------------------------------------------------------------
# X194 — HITS hubs & authorities
# ---------------------------------------------------------------------------

@query(
    "hits_customer_supplier",
    """
    WITH e AS (
      SELECT o.o_custkey AS s, l.l_suppkey AS d,
             count(*)::DOUBLE AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    a0 AS (SELECT DISTINCT d AS node, 1.0 AS a FROM e),
    h1 AS (SELECT e.s AS node, sum(e.w * a0.a) AS h
           FROM e JOIN a0 ON a0.node = e.d GROUP BY 1),
    a1 AS (SELECT e.d AS node, sum(e.w * h1.h) AS a
           FROM e JOIN h1 ON h1.node = e.s GROUP BY 1),
    h2 AS (SELECT e.s AS node, sum(e.w * a1.a) AS h
           FROM e JOIN a1 ON a1.node = e.d GROUP BY 1),
    a2 AS (SELECT e.d AS node, sum(e.w * h2.h) AS a
           FROM e JOIN h2 ON h2.node = e.s GROUP BY 1),
    h3 AS (SELECT e.s AS node, sum(e.w * a2.a) AS h
           FROM e JOIN a2 ON a2.node = e.d GROUP BY 1),
    a3 AS (SELECT e.d AS node, sum(e.w * h3.h) AS a
           FROM e JOIN h3 ON h3.node = e.s GROUP BY 1),
    ht AS (SELECT sum(h) AS t FROM h3),
    at AS (SELECT sum(a) AS t FROM a3)
    SELECT 'hub' AS kind, node,
           floor(h / t * 1000000000 + 0.5) / 1000000000 AS score
    FROM h3, ht
    UNION ALL
    SELECT 'authority' AS kind, node,
           floor(a / t * 1000000000 + 0.5) / 1000000000 AS score
    FROM a3, at
    """,
)
def hits_customer_supplier(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X194 — HITS on the directed customer→supplier trade graph
    (``graph.hits_scores``, 3 iterations): hub customers buy from
    authoritative suppliers and vice versa.  Two edge-keyed
    join+aggregate passes per iteration (the X33 discipline);
    normalization deferred to one final broadcast 1-row total.
    Every intermediate score is integer-valued (weights are counts,
    a₀ = 1), so both engines' sums are exact at sweep scale."""
    from sync_cosmos_db_spark.operators.graph import hits_scores

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    edges = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .groupBy(F.col("o_custkey").alias("src"),
                      F.col("l_suppkey").alias("dst"))
             .agg(F.count("*").alias("w")))
    return hits_scores(edges, "src", "dst", "w", iters=3)
