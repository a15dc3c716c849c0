"""Round-7 operator families (twelfth batch) X215-X218: conversion
latency profile, monthly ratio-to-moving-average seasonal index,
one-sample exponential KS fit, and top-N + OTHER rollup — how long
conversion takes (X155 counts who), annual seasonality (X157 covers
weekly), is-it-Poisson as a distance (X206 as a ratio), and the
reporting idiom that keeps dashboards bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X215 — conversion latency
# ---------------------------------------------------------------------------

@query(
    "conversion_latency_events",
    """
    WITH f AS (SELECT user_id, min(epoch_us(ts)) AS c
               FROM events WHERE event_type = 'click' GROUP BY 1),
    conv AS (
      SELECT e.user_id, min(epoch_us(e.ts) - f.c) AS gap
      FROM events e JOIN f USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= f.c
      GROUP BY 1),
    b AS (SELECT f.user_id, conv.gap
          FROM f LEFT JOIN conv USING (user_id))
    SELECT count(*)::BIGINT AS n_users,
           count(gap)::BIGINT AS n_converters,
           floor(count(gap)::DOUBLE / count(*) * 10000 + 0.5)
             / 10000 AS conv_rate,
           floor(quantile_cont(gap, 0.5) / 1000000.0
                 * 10000 + 0.5) / 10000 AS p50_s,
           floor(quantile_cont(gap, 0.9) / 1000000.0
                 * 10000 + 0.5) / 10000 AS p90_s
    FROM b
    """,
)
def conversion_latency_events(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X215 — first-click→first-purchase latency profile
    (``behavioral.conversion_latency``): conversion rate plus exact
    p50/p90 delay seconds over converters."""
    from sync_cosmos_db_spark.operators.behavioral import (
        conversion_latency,
    )

    ev = load_table(spark, sf_dir, "events")
    return conversion_latency(ev)


# ---------------------------------------------------------------------------
# X216 — monthly seasonal index
# ---------------------------------------------------------------------------

@query(
    "seasonal_index_order_revenue",
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mo,
             floor(sum(o_totalprice) * 100 + 0.5) / 100 AS v
      FROM orders GROUP BY 1),
    ma AS (
      SELECT mo, v,
             count(*) OVER w AS n,
             floor(avg(v) OVER w * 100 + 0.5) / 100 AS ma
      FROM m
      WINDOW w AS (ORDER BY mo
                   ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)),
    r AS (SELECT date_part('month', mo)::BIGINT AS month_of_year,
                 v / ma AS ratio
          FROM ma WHERE n = 12),
    idx AS (SELECT month_of_year, count(*)::BIGINT AS n_obs,
                   avg(ratio) AS i
            FROM r GROUP BY 1)
    SELECT month_of_year, n_obs,
           floor(i / avg(i) OVER () * 10000 + 0.5) / 10000
             AS seasonal_index
    FROM idx
    """,
)
def seasonal_index_order_revenue(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X216 — multiplicative monthly seasonal index of order revenue
    (``temporal.seasonal_index_monthly``): centered 12-month MA
    (full windows only, cents-snapped BEFORE the ratio), month-of-
    year mean ratios normalized to mean 1."""
    from sync_cosmos_db_spark.operators.temporal import (
        seasonal_index_monthly,
    )

    orders = load_table(spark, sf_dir, "orders")
    return seasonal_index_monthly(orders, "o_orderdate",
                                  "o_totalprice")


# ---------------------------------------------------------------------------
# X217 — exponential-fit KS
# ---------------------------------------------------------------------------

@query(
    "exp_fit_ks_event_types",
    """
    WITH t AS (SELECT event_type AS g, epoch_us(ts) AS t
               FROM events),
    gp AS (SELECT g, t,
                  t - lag(t) OVER (PARTITION BY g ORDER BY t)
                    AS gap
           FROM t),
    gaps AS (SELECT g, t, gap FROM gp WHERE gap IS NOT NULL),
    st AS (SELECT g, count(*)::BIGINT AS n, avg(gap) AS mean
           FROM gaps GROUP BY 1),
    d AS (
      SELECT gaps.g, st.n, st.mean,
             row_number() OVER (PARTITION BY gaps.g
                                ORDER BY gap, t) AS r,
             1 - exp(-(1.0 / st.mean) * gap) AS cdf
      FROM gaps JOIN st ON st.g = gaps.g),
    dd AS (SELECT g, n, mean,
                  greatest(abs(r::DOUBLE / n - cdf),
                           abs((r - 1)::DOUBLE / n - cdf)) AS dv
           FROM d)
    SELECT g AS event_type, n AS n_gaps,
           floor(mean / 1000000.0 * 1000000 + 0.5) / 1000000
             AS mean_gap_s,
           floor(max(dv) * 1000000 + 0.5) / 1000000 AS ks_d
    FROM dd GROUP BY 1, 2, 3
    """,
)
def exp_fit_ks_event_types(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X217 — KS distance of per-type inter-arrival gaps against a
    fitted exponential (``profiling.exp_fit_ks``): gaps, CDF ranks
    and D on one group-keyed partitioning."""
    from sync_cosmos_db_spark.operators.profiling import exp_fit_ks

    ev = load_table(spark, sf_dir, "events")
    return exp_fit_ks(ev, "event_type", "ts")


# ---------------------------------------------------------------------------
# X218 — top-N + OTHER rollup
# ---------------------------------------------------------------------------

@query(
    "topn_other_suppliers_by_nation",
    """
    WITH sr AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey AS sk,
             floor(sum(l.l_extendedprice) * 100 + 0.5) / 100 AS rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    rk AS (SELECT nation, sk, rev,
                  row_number() OVER (PARTITION BY nation
                                     ORDER BY rev DESC, sk) AS rn
           FROM sr)
    SELECT nation,
           CASE WHEN rn <= 3 THEN sk::VARCHAR ELSE 'OTHER' END
             AS supplier,
           count(*)::BIGINT AS n_suppliers,
           floor(sum(rev) * 100 + 0.5) / 100 AS revenue
    FROM rk GROUP BY 1, 2
    """,
)
def topn_other_suppliers_by_nation(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """X218 — top-3 suppliers per nation with the tail rolled into
    one OTHER row: per-supplier revenue is cents-snapped BEFORE the
    rank (the determinism discipline), one nation-keyed rank
    window, one aggregate — the reporting idiom that keeps a
    dashboard's cardinality bounded no matter the corpus."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    sr = (li.join(sup, li.l_suppkey == sup.s_suppkey)
          .groupBy(F.col("s_nationkey").alias("nation"),
                   F.col("l_suppkey").alias("sk"))
          .agg((F.floor(F.sum("l_extendedprice") * 100 + F.lit(0.5))
                / 100).alias("rev")))
    rn = F.row_number().over(
        W.partitionBy("nation").orderBy(F.col("rev").desc(), "sk"))
    lab = F.when(F.col("rn") <= 3,
                 F.col("sk").cast("string")).otherwise("OTHER")
    return (sr.withColumn("rn", rn)
            .groupBy("nation", lab.alias("supplier"))
            .agg(F.count("*").cast("long").alias("n_suppliers"),
                 (F.floor(F.sum("rev") * 100 + F.lit(0.5)) / 100)
                 .alias("revenue")))
