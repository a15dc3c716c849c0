"""Round-7 operator families (twentieth batch) X247-X250: sticky
rollout-ramp audit, nearest-centroid embedding eval, calendar
lag-features builder, and fold-temporal-independence audit — the
percentage-rollout verifier, the do-embeddings-separate-labels
five-minute check, the forecasting design matrix, and the
is-my-splitter-accidentally-temporal QC that closes the loop on
X66's k-fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X247 — sticky rollout ramp audit
# ---------------------------------------------------------------------------

@query(
    "ramp_audit_events",
    """
    WITH plan AS (
      SELECT d.day::DATE AS day,
             CASE WHEN d.day::DATE < DATE '2024-01-11' THEN 5
                  WHEN d.day::DATE < DATE '2024-01-21' THEN 25
                  ELSE 50 END AS planned_pct
      FROM (SELECT DISTINCT ts::DATE AS day FROM events) d),
    act AS (
      SELECT DISTINCT ts::DATE AS day, user_id,
             translate(substr(sha256(user_id::VARCHAR || ':ramp'),
                              1, 3), 'abcdef', '012345')::BIGINT
               % 100 AS bucket
      FROM events),
    j AS (SELECT a.day, p.planned_pct, a.bucket
          FROM act a JOIN plan p USING (day))
    SELECT day, planned_pct::BIGINT AS planned_pct,
           count(*)::BIGINT AS n_active,
           sum(CASE WHEN bucket < planned_pct
                    THEN 1 ELSE 0 END)::BIGINT AS n_treated,
           floor(sum(CASE WHEN bucket < planned_pct
                          THEN 1 ELSE 0 END)::DOUBLE / count(*)
                 * 10000 + 0.5) / 10000 AS observed_share,
           CASE WHEN abs(sum(CASE WHEN bucket < planned_pct
                                  THEN 1 ELSE 0 END)::DOUBLE
                         / count(*) - planned_pct / 100.0) <= 0.05
                THEN 'PASS' ELSE 'WARN' END AS verdict
    FROM j GROUP BY day, planned_pct
    """,
)
def ramp_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X247 — sticky percentage-rollout audit: users enter treatment
    when their sha2 bucket falls under the day's planned percentage
    (5% → 25% → 50% over January) — a MONOTONE plan makes bucketing
    sticky by construction (nobody exits) — and each day's observed
    treated share among active users is verified against plan
    within ±5 pts.  The verifier every gradual rollout needs and
    almost nobody writes."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    planned = (F.when(day < F.lit("2024-01-11"), 5)
               .when(day < F.lit("2024-01-21"), 25).otherwise(50))
    bucket = F.pmod(
        F.translate(F.substring(F.sha2(F.concat(
            F.col("user_id").cast("string"), F.lit(":ramp")), 256),
            1, 3), "abcdef", "012345").cast("bigint"), F.lit(100))
    act = (ev.select(day.alias("day"), "user_id",
                     planned.cast("long").alias("planned_pct"),
                     bucket.alias("bucket"))
           .distinct())
    treated = (F.col("bucket") < F.col("planned_pct")).cast("long")
    share = F.sum(treated) / F.count("*")
    return (act.groupBy("day", "planned_pct")
            .agg(F.count("*").cast("long").alias("n_active"),
                 F.sum(treated).cast("long").alias("n_treated"),
                 (F.floor(share * 10000 + F.lit(0.5)) / 10000)
                 .alias("observed_share"),
                 F.when(F.abs(share - F.col("planned_pct") / 100.0)
                        <= 0.05, "PASS").otherwise("WARN")
                 .alias("verdict")))


# ---------------------------------------------------------------------------
# X248 — nearest-centroid eval
# ---------------------------------------------------------------------------

@query(
    "nearest_centroid_eval_embeddings",
    """
    WITH ex AS (
      SELECT vec_id AS vid, label AS tl,
             unnest(generate_series(0, len(embedding) - 1)) AS dim,
             unnest(embedding) AS x
      FROM embeddings),
    cent AS (SELECT tl AS cl, dim, avg(x::DOUBLE) AS c
             FROM ex GROUP BY 1, 2),
    d2 AS (SELECT ex.vid, ex.tl, cent.cl,
                  sum((ex.x - cent.c) * (ex.x - cent.c)) AS d2
           FROM ex JOIN cent USING (dim) GROUP BY 1, 2, 3),
    pick AS (SELECT vid, tl, cl,
                    row_number() OVER (PARTITION BY vid
                                       ORDER BY d2, cl) AS rn
             FROM d2)
    SELECT tl AS true_label, cl AS pred_label,
           count(*)::BIGINT AS n
    FROM pick WHERE rn = 1 GROUP BY 1, 2
    """,
)
def nearest_centroid_eval_embeddings(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """X248 — nearest-centroid confusion matrix over the labeled
    embeddings (``similarity.nearest_centroid_eval``): per-label
    mean centroids, squared-L2 assignment, (distance, label)
    struct-min election."""
    from sync_cosmos_db_spark.operators.similarity import (
        nearest_centroid_eval,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return nearest_centroid_eval(emb)


# ---------------------------------------------------------------------------
# X249 — calendar lag features
# ---------------------------------------------------------------------------

@query(
    "lag_features_daily_revenue",
    """
    WITH daily AS (
      SELECT o_orderpriority AS prio, o_orderdate::DATE AS d,
             floor(sum(o_totalprice) * 100 + 0.5)::BIGINT AS y
      FROM orders GROUP BY 1, 2)
    SELECT a.prio, a.d, a.y,
           l1.y AS y_lag1, l7.y AS y_lag7,
           a.y - l1.y AS delta1,
           CASE WHEN l7.y > 0
                THEN floor(a.y::DOUBLE / l7.y * 10000 + 0.5) / 10000
           END AS ratio7
    FROM daily a
    LEFT JOIN daily l1 ON l1.prio = a.prio
                      AND l1.d = a.d - INTERVAL 1 DAY
    LEFT JOIN daily l7 ON l7.prio = a.prio
                      AND l7.d = a.d - INTERVAL 7 DAY
    """,
)
def lag_features_daily_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X249 — calendar-correct lag features (t−1, t−7 with deltas
    and week-over-week ratio) for the daily revenue series: two
    (prio, date) self-equi-joins, NOT row-offset lags — a missing
    calendar day yields NULL lags instead of silently reaching
    further back, which is exactly the bug row-lag feature builders
    ship."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("d"))
        .agg(F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
             .cast("long").alias("y")))
    l1 = daily.select(F.col("prio").alias("p1"),
                      F.col("d").alias("d1"),
                      F.col("y").alias("y_lag1"))
    l7 = daily.select(F.col("prio").alias("p7"),
                      F.col("d").alias("d7"),
                      F.col("y").alias("y_lag7"))
    j = (daily
         .join(l1, (F.col("p1") == F.col("prio"))
               & (F.col("d1") == F.date_sub(F.col("d"), 1)), "left")
         .join(l7, (F.col("p7") == F.col("prio"))
               & (F.col("d7") == F.date_sub(F.col("d"), 7)), "left"))
    return j.select(
        "prio", "d", "y", "y_lag1", "y_lag7",
        (F.col("y") - F.col("y_lag1")).alias("delta1"),
        F.when(F.col("y_lag7") > 0,
               F.floor(F.col("y") / F.col("y_lag7") * 10000
                       + F.lit(0.5)) / 10000).alias("ratio7"))


# ---------------------------------------------------------------------------
# X250 — fold-temporal-independence audit
# ---------------------------------------------------------------------------

@query(
    "fold_temporal_audit_orders",
    """
    WITH f AS (
      SELECT translate(substr(sha256(o_orderkey::VARCHAR
               || ':fold'), 1, 3), 'abcdef', '012345')::BIGINT % 5
               AS fold,
             date_trunc('month', o_orderdate) AS m
      FROM orders),
    cells AS (SELECT fold, m, count(*)::DOUBLE AS o
              FROM f GROUP BY 1, 2),
    rt AS (SELECT fold, sum(o) AS rs FROM cells GROUP BY 1),
    ct AS (SELECT m, sum(o) AS cs FROM cells GROUP BY 1),
    n AS (SELECT sum(o) AS n FROM cells),
    chi AS (
      SELECT sum((c.o - rt.rs * ct.cs / n.n)
                 * (c.o - rt.rs * ct.cs / n.n)
                 / (rt.rs * ct.cs / n.n)) AS chi2,
             count(*)::BIGINT AS n_cells
      FROM cells c JOIN rt USING (fold) JOIN ct USING (m), n),
    dims AS (SELECT (SELECT count(*) FROM rt)::BIGINT AS n_folds,
                    (SELECT count(*) FROM ct)::BIGINT AS n_months)
    SELECT n_folds, n_months,
           ((n_folds - 1) * (n_months - 1))::BIGINT AS dof,
           floor(chi2 * 10000 + 0.5) / 10000 AS chi2,
           CASE WHEN chi2 / ((n_folds - 1) * (n_months - 1)) <= 1.5
                THEN 'PASS' ELSE 'WARN' END AS verdict
    FROM chi, dims
    """,
)
def fold_temporal_audit_orders(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X250 — fold×month independence audit of the X66-style sha2
    fold assignment: the chi² of the fold-by-month contingency with
    a chi²/dof ≤ 1.5 PASS bar — a fold scheme that correlates with
    time silently turns cross-validation into extrapolation; the
    hash splitter PASSes by construction, and that is the point of
    auditing it."""
    orders = load_table(spark, sf_dir, "orders")
    fold = F.pmod(
        F.translate(F.substring(F.sha2(F.concat(
            F.col("o_orderkey").cast("string"), F.lit(":fold")),
            256), 1, 3), "abcdef", "012345").cast("bigint"),
        F.lit(5))
    cells = (orders.groupBy(
        fold.alias("fold"),
        F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.count("*").cast("double").alias("o")))
    rt = cells.groupBy("fold").agg(F.sum("o").alias("rs"))
    ct = cells.groupBy("m").agg(F.sum("o").alias("cs"))
    n_row = (cells.agg(F.sum("o").alias("n"))
             .withColumn("__k", F.floor(F.col("n") * 0)))
    j = (cells.join(rt, "fold").join(ct, "m")
         .withColumn("__k", F.floor(F.col("o") * 0))
         .join(F.broadcast(n_row), "__k"))
    e = F.col("rs") * F.col("cs") / F.col("n")
    chi = j.agg(F.sum((F.col("o") - e) * (F.col("o") - e) / e)
                .alias("chi2"))
    n_folds = rt.count()
    n_months = ct.count()
    dof = (n_folds - 1) * (n_months - 1)
    return chi.select(
        F.lit(n_folds).cast("long").alias("n_folds"),
        F.lit(n_months).cast("long").alias("n_months"),
        F.lit(dof).cast("long").alias("dof"),
        (F.floor(F.col("chi2") * 10000 + F.lit(0.5)) / 10000)
        .alias("chi2"),
        F.when(F.col("chi2") / dof <= 1.5, "PASS")
        .otherwise("WARN").alias("verdict"))
