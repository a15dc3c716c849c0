"""Round-7 operator families (fifteenth batch) X227-X230: LTV
buildup curve, univariate feature screen, zone-map skip-rate audit,
and SLO error-budget burn rate — what users are worth by age (X187
tracks who returns), first-pass feature triage via per-feature AUC,
pricing a sort rewrite before paying for it, and the Google-SRE
multiwindow alert rule as a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X227 — LTV buildup curve
# ---------------------------------------------------------------------------

@query(
    "ltv_curve_users",
    """
    WITH f AS (SELECT user_id, min(ts)::DATE AS fd
               FROM events GROUP BY 1),
    sz AS (SELECT count(*)::DOUBLE AS size FROM f),
    rev AS (
      SELECT date_diff('day', f.fd, e.ts::DATE) AS t_days,
             floor(sum(e.value) * 10000 + 0.5) / 10000 AS rev_day
      FROM events e JOIN f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1)
    SELECT t_days, rev_day,
           floor(sum(rev_day) OVER (ORDER BY t_days
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) / size * 10000 + 0.5) / 10000
             AS cum_rev_per_user
    FROM rev, sz
    """,
)
def ltv_curve_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X227 — cumulative purchase revenue per user by day-of-life
    (``behavioral.ltv_curve``): daily revenue rounded BEFORE the
    running sum so both engines accumulate identical doubles."""
    from sync_cosmos_db_spark.operators.behavioral import ltv_curve

    ev = load_table(spark, sf_dir, "events")
    return ltv_curve(ev)


# ---------------------------------------------------------------------------
# X228 — univariate feature screen
# ---------------------------------------------------------------------------

@query(
    "feature_screen_orders",
    """
    WITH feats AS (
      SELECT o_totalprice::DOUBLE AS f_price,
             date_diff('day', DATE '1992-01-01',
                       o_orderdate::DATE)::DOUBLE AS f_day,
             (translate(substr(sha256(o_orderkey::VARCHAR || ':fs'),
                               1, 6), 'abcdef', '012345')::BIGINT
              % 1000 / 1000.0) AS f_noise,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    u AS (
      SELECT 'f_price' AS feature, f_price AS s, y FROM feats
      UNION ALL
      SELECT 'f_day', f_day, y FROM feats
      UNION ALL
      SELECT 'f_noise', f_noise, y FROM feats),
    g AS (SELECT feature, s, count(*)::BIGINT AS n,
                 sum(y)::BIGINT AS np
          FROM u GROUP BY 1, 2),
    o AS (SELECT feature, s, n, np,
                 coalesce(sum(n) OVER (PARTITION BY feature
                          ORDER BY s ROWS BETWEEN UNBOUNDED
                          PRECEDING AND 1 PRECEDING), 0) AS off
          FROM g),
    agg AS (SELECT feature,
                   sum(np * (off + (n + 1) / 2.0)) AS rank_pos,
                   sum(np)::BIGINT AS n_pos,
                   sum(n - np)::BIGINT AS n_neg
            FROM o GROUP BY 1)
    SELECT feature, n_pos, n_neg,
           floor((rank_pos - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos::DOUBLE * n_neg) * 1000000 + 0.5)
             / 1000000 AS auc
    FROM agg
    """,
)
def feature_screen_orders(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X228 — univariate AUC screen of three candidate features for
    the finalized-order flag (``profiling.feature_screen_auc``):
    order date discriminates strongly (old orders finalize), price
    weakly, and the sha2-noise feature pins to ≈ 0.5 — the triage
    table, one X179 pass per feature."""
    from sync_cosmos_db_spark.operators.profiling import (
        feature_screen_auc,
    )

    orders = load_table(spark, sf_dir, "orders")
    noise = (F.pmod(
        F.translate(F.substring(
            F.sha2(F.concat(F.col("o_orderkey").cast("string"),
                            F.lit(":fs")), 256), 1, 6),
            "abcdef", "012345").cast("bigint"), F.lit(1000)) / 1000.0)
    feats = {
        "f_price": F.col("o_totalprice").cast("double"),
        "f_day": F.datediff(F.to_date("o_orderdate"),
                            F.to_date(F.lit("1992-01-01")))
        .cast("double"),
        "f_noise": noise,
    }
    y = (F.col("o_orderstatus") == "F").cast("long")
    return feature_screen_auc(orders, y, feats)


# ---------------------------------------------------------------------------
# X229 — zone-map skip-rate audit
# ---------------------------------------------------------------------------

@query(
    "zone_map_audit_lineitem",
    """
    WITH d AS (
      SELECT date_diff('day', DATE '1992-01-01', l_shipdate::DATE)
               ::DOUBLE AS ship_day,
             (l_orderkey * 8 + l_linenumber)::BIGINT AS lid
      FROM lineitem),
    s_idx AS (SELECT ship_day, lid,
                     row_number() OVER (ORDER BY ship_day, lid)
                       AS gi
              FROM d),
    a_idx AS (SELECT ship_day, lid,
                     row_number() OVER (ORDER BY lid, ship_day)
                       AS gi
              FROM d),
    s_grp AS (SELECT (gi - 1) // 1000 AS grp, min(ship_day) AS lo,
                     max(ship_day) AS hi
              FROM s_idx GROUP BY 1),
    a_grp AS (SELECT (gi - 1) // 1000 AS grp, min(ship_day) AS lo,
                     max(ship_day) AS hi
              FROM a_idx GROUP BY 1),
    probes AS (SELECT 2000.0::DOUBLE AS plo, 2030.0::DOUBLE AS phi
               UNION ALL
               SELECT 1000.0::DOUBLE, 1365.0::DOUBLE),
    ev AS (
      SELECT 'sorted' AS layout, p.plo, p.phi,
             count(*)::BIGINT AS n_groups,
             sum(CASE WHEN hi < p.plo OR lo > p.phi
                      THEN 1 ELSE 0 END)::BIGINT AS n_skipped
      FROM s_grp, probes p GROUP BY 1, 2, 3
      UNION ALL
      SELECT 'arrival', p.plo, p.phi, count(*)::BIGINT,
             sum(CASE WHEN hi < p.plo OR lo > p.phi
                      THEN 1 ELSE 0 END)::BIGINT
      FROM a_grp, probes p GROUP BY 1, 2, 3)
    SELECT layout, plo AS probe_lo, phi AS probe_hi, n_groups,
           n_skipped,
           floor(n_skipped::DOUBLE / n_groups * 10000 + 0.5)
             / 10000 AS skip_rate
    FROM ev
    """,
)
def zone_map_audit_lineitem(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X229 — zone-map skip rates for ship-day range probes under a
    shipdate-sorted layout vs arrival (line-id) order
    (``sinks.zone_map_skip_audit``): the sorted layout skips almost
    every 1000-row group outside the probe range; arrival order
    skips almost none — the measured case for paying the X78 sort
    job."""
    from sync_cosmos_db_spark.sinks import zone_map_skip_audit

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.datediff(F.to_date("l_shipdate"),
                   F.to_date(F.lit("1992-01-01"))).cast("double")
        .alias("ship_day"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
        .cast("long").alias("lid"))
    return zone_map_skip_audit(
        d, "ship_day", "ship_day", "lid",
        [(2000.0, 2030.0), (1000.0, 1365.0)], rows_per_group=1000)


# ---------------------------------------------------------------------------
# X230 — SLO burn rate
# ---------------------------------------------------------------------------

@query(
    "slo_burn_rate_events",
    """
    WITH b AS (
      SELECT epoch_us(ts) // 600000000 AS bkt,
             count(*)::BIGINT AS n,
             sum(CASE WHEN event_type = 'error'
                      THEN 1 ELSE 0 END)::BIGINT AS nerr
      FROM events GROUP BY 1),
    w AS (
      SELECT bkt, n, nerr,
             sum(nerr) OVER w1 AS e1, sum(n) OVER w1 AS t1,
             sum(nerr) OVER w6 AS e6, sum(n) OVER w6 AS t6
      FROM b
      WINDOW w1 AS (ORDER BY bkt RANGE BETWEEN 5 PRECEDING
                    AND CURRENT ROW),
             w6 AS (ORDER BY bkt RANGE BETWEEN 35 PRECEDING
                    AND CURRENT ROW))
    SELECT bkt, n, nerr,
           floor(e1::DOUBLE / t1 / 0.25 * 10000 + 0.5) / 10000
             AS burn_1h,
           floor(e6::DOUBLE / t6 / 0.25 * 10000 + 0.5) / 10000
             AS burn_6h,
           (e1::DOUBLE / t1 / 0.25 > 1.2
            AND e6::DOUBLE / t6 / 0.25 > 1.0) AS alert
    FROM w
    """,
)
def slo_burn_rate_events(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """X230 — multiwindow SLO error-budget burn (Google SRE rule):
    error share per 10-minute bucket over trailing 1 h and 6 h
    RANGE frames (gap-correct on the integer bucket index), burn =
    rate / 25% budget, alert when the fast window exceeds 1.2× AND
    the slow window 1.0× — flapping-proof by construction.  The
    windows run over the O(buckets) collapsed table; the alert
    compares ratios of exact integers in both engines."""
    ev = load_table(spark, sf_dir, "events")
    b = (ev.groupBy(F.expr("unix_micros(ts) div 600000000")
                    .alias("bkt"))
         .agg(F.count("*").cast("long").alias("n"),
              F.sum(F.when(F.col("event_type") == "error", 1)
                    .otherwise(0)).cast("long").alias("nerr")))
    w1 = W.orderBy("bkt").rangeBetween(-5, 0)
    w6 = W.orderBy("bkt").rangeBetween(-35, 0)
    d = (b.withColumn("e1", F.sum("nerr").over(w1))
         .withColumn("t1", F.sum("n").over(w1))
         .withColumn("e6", F.sum("nerr").over(w6))
         .withColumn("t6", F.sum("n").over(w6)))
    r1 = F.col("e1") / F.col("t1") / 0.25
    r6 = F.col("e6") / F.col("t6") / 0.25
    return d.select(
        "bkt", "n", "nerr",
        (F.floor(r1 * 10000 + F.lit(0.5)) / 10000).alias("burn_1h"),
        (F.floor(r6 * 10000 + F.lit(0.5)) / 10000).alias("burn_6h"),
        ((r1 > 1.2) & (r6 > 1.0)).alias("alert"))
