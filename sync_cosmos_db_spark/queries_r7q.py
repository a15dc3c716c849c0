"""Round-7 operator families (sixteenth batch) X231-X234: numeric
WOE over equi-depth deciles, HHI concentration index, sweep-line
peak concurrency, and rolling robust z anomaly tagging — X175's
categorical encoder extended to numerics through X199's exact bins,
the antitrust/risk concentration number beside X139's Gini, the
how-many-at-once capacity metric without an interval self-join, and
the outlier-immune sibling of X72's control limits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X231 — numeric WOE over equi-depth deciles
# ---------------------------------------------------------------------------

@query(
    "woe_price_deciles",
    """
    WITH idx AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey)
               AS gi,
             count(*) OVER () AS n
      FROM orders),
    b AS (SELECT (gi - 1) * 10 // n AS category, y FROM idx),
    per_cat AS (SELECT category, count(*)::BIGINT AS n,
                       sum(y)::BIGINT AS n_good
                FROM b GROUP BY 1),
    wc AS (SELECT *, (n - n_good)::BIGINT AS n_bad FROM per_cat),
    tot AS (SELECT sum(n_good) AS gt, sum(n_bad) AS bt FROM wc),
    j AS (SELECT wc.*, (n_good + 0.5) / (gt + 1.0) AS gs,
                 (n_bad + 0.5) / (bt + 1.0) AS bs
          FROM wc, tot)
    SELECT category, n, n_good, n_bad,
           floor(ln(gs / bs) * 1000000 + 0.5) / 1000000 AS woe,
           floor((gs - bs) * ln(gs / bs) * 1000000 + 0.5) / 1000000
             AS iv_contrib
    FROM j
    """,
)
def woe_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X231 — numeric weight-of-evidence: order price cut into EXACT
    equi-depth deciles (the X199 two-phase rank, no quantile
    estimates) and fed through X175's Laplace-smoothed WOE — the
    monotonic-binning credit-scoring move for continuous features,
    built by composing two proven operators."""
    from sync_cosmos_db_spark.operators.curation import (
        global_sort_index,
    )
    from sync_cosmos_db_spark.operators.profiling import woe_encoding

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    idx = global_sort_index(
        orders.select(F.col("o_totalprice").alias("v"),
                      F.col("o_orderkey").alias("tb"),
                      (F.col("o_orderstatus") == "F").cast("long")
                      .alias("y")),
        "v", "tb", out_col="__gi")
    binned = idx.withColumn(
        "category", F.expr(f"(__gi - 1) * 10 div {int(n)}"))
    return woe_encoding(binned, "category", F.col("y"))


# ---------------------------------------------------------------------------
# X232 — HHI concentration
# ---------------------------------------------------------------------------

@query(
    "hhi_segment_customers",
    """
    WITH cr AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey AS cust,
             floor(sum(o.o_totalprice) * 100 + 0.5)::BIGINT AS c
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    t AS (SELECT segment, sum(c)::BIGINT AS tot,
                 count(*)::BIGINT AS n_cust
          FROM cr GROUP BY 1)
    SELECT cr.segment, t.n_cust,
           floor(sum((cr.c::DOUBLE / t.tot) * (cr.c::DOUBLE / t.tot))
                 * 10000 * 10000 + 0.5) / 10000 AS hhi_points
    FROM cr JOIN t USING (segment)
    GROUP BY 1, 2
    """,
)
def hhi_segment_customers(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X232 — Herfindahl–Hirschman concentration of customer revenue
    per market segment (0–10000 points): Σ share² on integer-cents
    shares — the dependence-risk number beside X139's inequality
    Gini (a segment can be equal-but-concentrated or skewed-but-
    diffuse; the two indices disagree exactly when it matters)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cr = (orders.join(cust, orders.o_custkey == cust.c_custkey)
          .groupBy(F.col("c_mktsegment").alias("segment"),
                   F.col("o_custkey").alias("cust"))
          .agg(F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
               .cast("long").alias("c")))
    t = cr.groupBy("segment").agg(
        F.sum("c").alias("tot"),
        F.count("*").cast("long").alias("n_cust"))
    share = F.col("c") / F.col("tot")
    return (cr.join(t, "segment")
            .groupBy("segment", "n_cust")
            .agg((F.floor(F.sum(share * share) * 10000 * 10000
                          + F.lit(0.5)) / 10000).alias("hhi_points")))


# ---------------------------------------------------------------------------
# X233 — sweep-line peak concurrency
# ---------------------------------------------------------------------------

@query(
    "peak_concurrency_daily",
    """
    WITH spans AS (
      SELECT ts::DATE AS day, user_id,
             min(epoch_us(ts)) AS s, max(epoch_us(ts)) + 1 AS e
      FROM events GROUP BY 1, 2),
    pts AS (
      SELECT day, s AS t, 1 AS delta FROM spans
      UNION ALL
      SELECT day, e, -1 FROM spans),
    run AS (
      SELECT day,
             sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS c
      FROM pts)
    SELECT r.day, sp.n_sessions, r.peak_concurrency
    FROM (SELECT day, max(c)::BIGINT AS peak_concurrency
          FROM run GROUP BY 1) r
    JOIN (SELECT day, count(*)::BIGINT AS n_sessions
          FROM spans GROUP BY 1) sp USING (day)
    """,
)
def peak_concurrency_daily(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X233 — daily peak concurrent user spans
    (``behavioral.peak_concurrency``): ±1 endpoint sweep on one
    day-partitioned sort window — no interval self-join, ends
    before starts at microsecond ties."""
    from sync_cosmos_db_spark.operators.behavioral import (
        peak_concurrency,
    )

    ev = load_table(spark, sf_dir, "events")
    return peak_concurrency(ev)


# ---------------------------------------------------------------------------
# X234 — rolling robust z
# ---------------------------------------------------------------------------

@query(
    "rolling_robust_z_revenue",
    """
    WITH daily AS (
      SELECT o_orderpriority AS prio, o_orderdate::DATE AS d,
             floor(sum(o_totalprice) * 100 + 0.5)::BIGINT AS y
      FROM orders GROUP BY 1, 2),
    x AS (SELECT prio, d,
                 date_diff('day', DATE '1992-01-01', d) AS xd, y
          FROM daily),
    w AS (SELECT prio, d, y,
                 count(*) OVER win AS n,
                 quantile_cont(y, 0.5) OVER win AS med,
                 quantile_cont(y, 0.25) OVER win AS p25,
                 quantile_cont(y, 0.75) OVER win AS p75
          FROM x
          WINDOW win AS (PARTITION BY prio ORDER BY xd
                         RANGE BETWEEN 27 PRECEDING
                         AND CURRENT ROW))
    SELECT prio, d, y,
           CASE WHEN n >= 10 AND p75 - p25 > 0
                THEN floor((y - med) / ((p75 - p25) / 1.349)
                           * 10000 + 0.5) / 10000
           END AS robust_z,
           CASE WHEN n >= 10 AND p75 - p25 > 0
                THEN abs((y - med) / ((p75 - p25) / 1.349)) > 3
           END AS is_anomaly
    FROM w
    """,
)
def rolling_robust_z_revenue(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X234 — rolling robust z of daily revenue cents per priority
    (``temporal.rolling_robust_z``): 28-day RANGE frame, median/IQR
    scale, NULL under 10 observations or zero IQR."""
    from sync_cosmos_db_spark.operators.temporal import (
        rolling_robust_z,
    )

    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("d"))
        .agg(F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
             .cast("long").alias("y")))
    return rolling_robust_z(daily, "prio", "d", "y",
                            window_days=28, min_obs=10)
