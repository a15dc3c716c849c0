"""Round-6 operator families (second batch) X121, X133, X135-X142:
changepoint scan, magic-byte sniffing, autocorrelation, Mann-Whitney
rank-sum, weighted median, quantile alignment, Gini concentration,
source KL divergence, recursive-CTE reachability, inter-arrival
burstiness.

Each query drives the real operator end-to-end on the harness tables
and carries a DuckDB oracle that recomputes the result independently.
The recursive-CTE query (X141) runs the SAME SQL text on both engines
— Spark 4's native ``WITH RECURSIVE`` support is itself the feature
under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X121 — mean-shift changepoint scan
# ---------------------------------------------------------------------------

@query(
    "changepoint_daily_revenue",
    """
    WITH s AS (
      SELECT o_orderdate::DATE AS day,
             floor(sum(o_totalprice) * 10000 + 0.5) / 10000 AS v
      FROM orders GROUP BY 1),
    b AS (SELECT day, v, row_number() OVER (ORDER BY day) AS i,
                 sum(v) OVER (ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM s),
    t AS (SELECT max(i) AS n, sum(v) AS st FROM b),
    sc AS (SELECT day AS split_day, i::BIGINT AS n_before,
                  (t.n - i)::BIGINT AS n_after,
                  floor(cum / i * 10000 + 0.5) / 10000 AS mean_before,
                  floor((t.st - cum) / (t.n - i) * 10000 + 0.5) / 10000
                    AS mean_after,
                  floor(abs(cum / i - (t.st - cum) / (t.n - i)) * 10000
                        + 0.5) / 10000 AS gap
           FROM b, t WHERE i < t.n)
    SELECT split_day, n_before, n_after, mean_before, mean_after, gap
    FROM sc
    QUALIFY row_number() OVER (ORDER BY gap DESC, split_day) <= 5
    """,
)
def changepoint_daily_revenue(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X121 — mean-shift changepoint scan
    (``profiling.changepoint_scan``) over daily order revenue: the
    binary-segmentation first step that localizes regime changes
    (an ingest cliff, a price re-denomination).  The raw table
    collapses to one row per day BEFORE the scan, so the ordered
    window runs on a period-sized series at any corpus scale."""
    from sync_cosmos_db_spark.operators.profiling import changepoint_scan

    orders = load_table(spark, sf_dir, "orders")
    series = (orders
              .groupBy(F.to_date(F.col("o_orderdate")).alias("day"))
              .agg(F.sum("o_totalprice").alias("rev")))
    return changepoint_scan(series, "day", "rev", top_k=5)


# ---------------------------------------------------------------------------
# X133 — binary container sniffing from magic bytes
# ---------------------------------------------------------------------------

@query(
    "binary_sniff_documents",
    """
    WITH b AS (
      SELECT CASE
               WHEN doc_id % 4 = 0
                 THEN unhex('89504E470D0A1A0A') || encode(text)
               WHEN doc_id % 4 = 1
                 THEN unhex('52494646') || unhex('00000000')
                      || unhex('57415645') || encode(text)
               WHEN doc_id % 4 = 2
                 THEN unhex('FFD8FF') || encode(text)
               ELSE encode(text)
             END AS bin
      FROM documents),
    s AS (
      SELECT CASE
               WHEN substr(hex(bin), 1, 16) = '89504E470D0A1A0A'
                 THEN 'png'
               WHEN substr(hex(bin), 1, 6) = 'FFD8FF' THEN 'jpeg'
               WHEN substr(hex(bin), 1, 8) = '52494646'
                    AND substr(hex(bin), 17, 8) = '57415645'
                 THEN 'wav'
               ELSE 'unknown'
             END AS kind,
             octet_length(bin) AS nb
      FROM b)
    SELECT kind, count(*)::BIGINT AS n, sum(nb)::BIGINT AS total_bytes
    FROM s GROUP BY 1
    """,
)
def binary_sniff_documents(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X133 — container-format sniffing
    (``multimodal.sniff_binary_type``): route an opaque binary column
    to the right decoder by magic bytes (PNG / JPEG / RIFF+WAVE),
    never by file extension.  The corpus is built deterministically
    in-query (doc_id % 4 selects the wrapper).  Pure in-row JVM
    ``substring``+``hex`` — zero shuffle before the ≤4-row
    aggregate."""
    from sync_cosmos_db_spark.operators.multimodal import (
        sniff_binary_type,
    )

    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    b = (F.when(F.col("doc_id") % 4 == 0,
                F.concat(F.unhex(F.lit("89504E470D0A1A0A")), payload))
         .when(F.col("doc_id") % 4 == 1,
               F.concat(F.unhex(F.lit("52494646")),
                        F.unhex(F.lit("00000000")),
                        F.unhex(F.lit("57415645")), payload))
         .when(F.col("doc_id") % 4 == 2,
               F.concat(F.unhex(F.lit("FFD8FF")), payload))
         .otherwise(payload))
    return (docs.select(sniff_binary_type(b).alias("kind"),
                        F.length(b).alias("nb"))
            .groupBy("kind")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("nb").cast("long").alias("total_bytes")))


# ---------------------------------------------------------------------------
# X135 — lag-k autocorrelation of the daily event series
# ---------------------------------------------------------------------------

@query(
    "acf_daily_events",
    """
    WITH s AS (SELECT date_trunc('day', ts) AS day,
                      count(*)::DOUBLE AS v
               FROM events GROUP BY 1),
    m AS (SELECT floor(avg(v) * 1000000 + 0.5) / 1000000 AS xbar
          FROM s),
    b AS (SELECT day, v - (SELECT xbar FROM m) AS d FROM s),
    i AS (SELECT row_number() OVER (ORDER BY day) AS i, d FROM b),
    den AS (SELECT sum(d * d) AS den FROM i),
    pairs AS (SELECT t.k AS lag, a.d AS da, c.d AS dk
              FROM generate_series(1, 7) t(k)
              CROSS JOIN i a
              JOIN i c ON c.i = a.i + t.k)
    SELECT lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
           floor(sum(da * dk) / (SELECT den FROM den) * 1000000 + 0.5)
             / 1000000 AS acf_value
    FROM pairs GROUP BY 1
    """,
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X135 — autocorrelation (``profiling.acf``) of daily event
    counts at lags 1..7: the seasonality / memory diagnostic that
    decides lag features and forecast horizon.  The raw stream
    collapses to one row per day first; all 7 lags ride ONE ordered
    window sort, then a single unpivot → lag-keyed reduce."""
    from sync_cosmos_db_spark.operators.profiling import acf

    ev = load_table(spark, sf_dir, "events")
    series = (ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
              .agg(F.count("*").cast("double").alias("n")))
    return acf(series, "day", "n", max_lag=7)


# ---------------------------------------------------------------------------
# X136 — Mann-Whitney U rank-sum test
# ---------------------------------------------------------------------------

@query(
    "ranksum_building_machinery",
    """
    WITH two AS (
      SELECT c.c_mktsegment AS g, o.o_totalprice::DOUBLE AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
    vc AS (SELECT v, count(*)::DOUBLE AS t,
                  sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
                    ::DOUBLE AS ta
           FROM two GROUP BY 1),
    r AS (SELECT *, sum(t) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
          FROM vc),
    a AS (SELECT sum(ta) AS na, sum(t - ta) AS nb,
                 sum((cum - (t - 1) / 2) * ta) AS ra,
                 sum(t * t * t - t) AS ties
          FROM r)
    SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
           floor((ra - na * (na + 1) / 2) * 1000000 + 0.5) / 1000000
             AS u_a,
           floor(na * nb / 2 * 1000000 + 0.5) / 1000000 AS mean_u,
           floor((ra - na * (na + 1) / 2 - na * nb / 2)
                 / sqrt(na * nb / 12
                        * ((na + nb + 1)
                           - ties / ((na + nb) * (na + nb - 1))))
                 * 1000000 + 0.5) / 1000000 AS z
    FROM a
    """,
)
def ranksum_building_machinery(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X136 — Mann-Whitney U (``profiling.rank_sum_test``) between
    BUILDING and MACHINERY order values: the distribution-free
    location test that survives heavy tails.  Midranks come from a
    value-keyed pre-reduce + ONE cumulative window over DISTINCT
    values — the per-row global sort a naive ranking would do never
    happens."""
    from sync_cosmos_db_spark.operators.profiling import rank_sum_test

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust),
                    orders["o_custkey"] == cust["c_custkey"])
    return rank_sum_test(j, "c_mktsegment", "o_totalprice",
                         "BUILDING", "MACHINERY")


# ---------------------------------------------------------------------------
# X137 — weighted median
# ---------------------------------------------------------------------------

@query(
    "weighted_median_lineitem",
    """
    WITH g AS (
      SELECT l_returnflag AS grp, l_extendedprice::DOUBLE AS v,
             count(*)::BIGINT AS c, sum(l_quantity)::DOUBLE AS wv
      FROM lineitem GROUP BY 1, 2),
    cumt AS (SELECT grp, v, wv,
                    sum(wv) OVER (PARTITION BY grp ORDER BY v
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cw
             FROM g),
    tot AS (SELECT grp, sum(c) AS n, sum(wv) AS tw FROM g GROUP BY 1)
    SELECT t.grp AS l_returnflag, t.n::BIGINT AS n,
           floor(t.tw * 10000 + 0.5) / 10000 AS total_w,
           floor(min(c2.v) * 10000 + 0.5) / 10000 AS wmedian
    FROM tot t JOIN cumt c2 ON c2.grp = t.grp AND c2.cw >= t.tw / 2
    GROUP BY 1, 2, 3
    """,
)
def weighted_median_lineitem(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X137 — quantity-weighted median extended price per return flag
    (``profiling.weighted_median``): the volume-weighted "typical
    price" an unweighted median gets wrong when line sizes vary.
    Ties collapse in a value-keyed pre-reduce, so the group-keyed
    cumulative window sees one row per distinct value and intra-tie
    order cannot matter."""
    from sync_cosmos_db_spark.operators.profiling import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    return weighted_median(li, "l_returnflag", "l_extendedprice",
                           "l_quantity")


# ---------------------------------------------------------------------------
# X138 — per-source vs global quantile alignment
# ---------------------------------------------------------------------------

@query(
    "quantile_align_doc_lengths",
    """
    WITH pg AS (SELECT source AS grp,
                       quantile_cont(n_chars::DOUBLE,
                                     [0.1, 0.2, 0.3, 0.4, 0.5,
                                      0.6, 0.7, 0.8, 0.9]) AS qs
                FROM documents GROUP BY 1),
    gl AS (SELECT quantile_cont(n_chars::DOUBLE,
                                [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS gqs
           FROM documents),
    e AS (SELECT grp, generate_subscripts(qs, 1) AS pos,
                 unnest(qs) AS gq
          FROM pg)
    SELECT e.grp AS source,
           ([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
              ::DOUBLE[])[e.pos] AS prob,
           floor(e.gq * 10000 + 0.5) / 10000 AS group_q,
           floor(gl.gqs[e.pos] * 10000 + 0.5) / 10000 AS global_q,
           floor((e.gq - gl.gqs[e.pos]) * 10000 + 0.5) / 10000
             AS shift
    FROM e, gl
    """,
)
def quantile_align_doc_lengths(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X138 — per-source vs global decile alignment of document
    lengths (``profiling.quantile_align``): the quantile-
    normalization / drift table (which source's length distribution
    is skewed, and by how much at each decile).  Exact interpolated
    ``percentile`` per group — memory O(distinct lengths), not
    O(rows); a 1-row global broadcast supplies the reference."""
    from sync_cosmos_db_spark.operators.profiling import quantile_align

    docs = load_table(spark, sf_dir, "documents")
    return quantile_align(docs, "source", "n_chars")


# ---------------------------------------------------------------------------
# X139 — Gini revenue concentration
# ---------------------------------------------------------------------------

@query(
    "gini_nation_revenue",
    """
    WITH rev AS (SELECT o_custkey,
                        floor(sum(o_totalprice) * 10000 + 0.5) / 10000
                          AS v
                 FROM orders GROUP BY 1),
    j AS (SELECT c.c_nationkey AS grp, rev.v
          FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey),
    r AS (SELECT grp, v,
                 row_number() OVER (PARTITION BY grp ORDER BY v) AS i
          FROM j)
    SELECT grp AS c_nationkey, count(*)::BIGINT AS n,
           floor(sum(v) * 1000000 + 0.5) / 1000000 AS total,
           floor((2 * sum(i * v) / (count(*) * sum(v))
                  - (count(*) + 1.0) / count(*)) * 1000000 + 0.5)
             / 1000000 AS gini
    FROM r GROUP BY 1
    """,
)
def gini_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X139 — Gini coefficient (``profiling.gini``) of per-customer
    revenue inside each nation: the concentration audit (is one
    customer most of a nation's book?).  Per-customer revenue is
    rounded BEFORE ranking on both engines; Σ i·x is tie-order
    invariant, so the group-keyed sort needs no tiebreak for
    determinism."""
    from sync_cosmos_db_spark.operators.profiling import gini

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    p = 10 ** 4
    rev = (orders.groupBy("o_custkey")
           .agg((F.floor(F.sum("o_totalprice") * p + F.lit(0.5)) / p)
                .alias("v")))
    j = rev.join(F.broadcast(cust),
                 rev["o_custkey"] == cust["c_custkey"])
    return gini(j, "c_nationkey", "v")


# ---------------------------------------------------------------------------
# X140 — per-source token-distribution KL divergence
# ---------------------------------------------------------------------------

@query(
    "source_kl_documents",
    """
    WITH gt AS (SELECT source AS g,
                       unnest(string_split_regex(text, '\\s+')) AS tok
                FROM documents),
    c1 AS (SELECT g, tok, count(*)::DOUBLE AS cgt
           FROM gt GROUP BY 1, 2),
    gtot AS (SELECT g, sum(cgt) AS tg FROM c1 GROUP BY 1),
    tokc AS (SELECT tok, sum(cgt) AS ct FROM c1 GROUP BY 1),
    tot AS (SELECT sum(ct) AS t FROM tokc)
    SELECT c1.g AS source, max(gtot.tg)::BIGINT AS n_tokens,
           floor(sum((cgt / tg) * ln((cgt / tg)
                                     / (ct / (SELECT t FROM tot))))
                 * 1000000 + 0.5) / 1000000 AS kl
    FROM c1
    JOIN tokc USING (tok)
    JOIN gtot USING (g)
    GROUP BY 1
    """,
)
def source_kl_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X140 — KL(source ‖ corpus) over unigram token distributions
    (``text.source_kl``): vocab Jaccard (X122) says whether the words
    overlap; KL says whether their FREQUENCIES do — the
    mixture-design complement.  One (group, token) count, a
    token-keyed join to global counts derived from the same partials
    (no second scan), a 1-row total broadcast."""
    from sync_cosmos_db_spark.operators.text import source_kl

    docs = load_table(spark, sf_dir, "documents")
    return source_kl(docs, "source", "text")


# ---------------------------------------------------------------------------
# X141 — recursive-CTE reachability (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------

_REACH_SQL = """
WITH RECURSIVE edges AS (
  SELECT CAST(n_nationkey AS BIGINT) AS src,
         CAST((n_nationkey * 3 + 1) % 25 AS BIGINT) AS dst
  FROM {nation}
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT),
         CAST((n_nationkey + 7) % 25 AS BIGINT)
  FROM {nation}),
reach AS (
  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS hops
  UNION ALL
  SELECT e.dst, r.hops + CAST(1 AS BIGINT)
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hops < 6)
SELECT node, MIN(hops) AS min_hops, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM reach GROUP BY node
"""


@query("recursive_reach_nations", _REACH_SQL.format(nation="nation"))
def recursive_reach_nations(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X141 — bounded-depth reachability via Spark 4's native
    ``WITH RECURSIVE`` (A9 SQL-frontend parity: the IDENTICAL SQL
    text runs on both engines): min-hops and path counts from node 0
    over a deterministic out-degree-2 graph on the nation keys,
    recursion capped at 6 hops.  The declarative twin of the
    DataFrame BFS (X90) — X90 remains the at-scale form (explicit
    per-round persist + dedup keeps the frontier linear; naive
    UNION ALL recursion enumerates paths, fine only under a hop cap
    on a bounded graph like this catalog-sized one)."""
    load_table(spark, sf_dir, "nation") \
        .createOrReplaceTempView("nation_x141")
    return spark.sql(_REACH_SQL.format(nation="nation_x141"))


# ---------------------------------------------------------------------------
# X142 — inter-arrival burstiness
# ---------------------------------------------------------------------------

@query(
    "burstiness_user_events",
    """
    WITH g AS (
      SELECT user_id,
             epoch(ts) - lag(epoch(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events),
    f AS (SELECT user_id, gap FROM g WHERE gap IS NOT NULL),
    m AS (SELECT user_id, count(*)::BIGINT AS n_gaps,
                 floor(avg(gap) * 100 + 0.5) / 100 AS mu
          FROM f GROUP BY 1),
    s AS (SELECT f.user_id, m.n_gaps, m.mu,
                 floor(sqrt(sum((f.gap - m.mu) * (f.gap - m.mu))
                            / (m.n_gaps - 1)) * 100 + 0.5) / 100 AS sd
          FROM f JOIN m USING (user_id)
          WHERE m.n_gaps >= 2
          GROUP BY 1, 2, 3)
    SELECT user_id, n_gaps, mu AS mean_gap, sd AS std_gap,
           CASE WHEN sd + mu <> 0
                THEN floor((sd - mu) / (sd + mu) * 1000000 + 0.5)
                     / 1000000
           END AS b
    FROM s
    """,
)
def burstiness_user_events(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X142 — inter-arrival burstiness per user
    (``behavioral.burstiness``): B = (σ−μ)/(σ+μ) over consecutive
    event gaps — −1 metronome, ≈0 Poisson, →1 bursty; the
    bot-vs-human / retry-storm signature.  One user-keyed lag window
    + a two-pass moment reduce; μ̂ is rounded before the variance
    pass and σ from the explicit Σ(d−μ̂)² formula on both engines."""
    from sync_cosmos_db_spark.operators.behavioral import burstiness

    ev = load_table(spark, sf_dir, "events")
    return burstiness(ev, "user_id", "ts", "event_id")
