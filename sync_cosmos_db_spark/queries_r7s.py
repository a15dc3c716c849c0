"""Round-7 operator families (eighteenth batch) X239-X242:
diversity-constrained top-k, Wilson lower-bound ranking, activity
streaks, and CUPED-adjusted experiment readout — the feed that can't
be monopolized by one source, ranking-under-uncertainty done right
(sort by the lower bound, not the rate), the engagement metric DAU
can't see, and X107's readout sharpened by a pre-period covariate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X239 — diversity-constrained top-k
# ---------------------------------------------------------------------------

@query(
    "diversified_topk_docs",
    """
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id)
               AS rs
      FROM documents),
    k AS (SELECT doc_id, source, n_chars FROM r WHERE rs <= 3),
    g AS (SELECT *, row_number() OVER (ORDER BY n_chars DESC,
                                       doc_id) AS rank
          FROM k)
    SELECT rank::BIGINT AS rank, doc_id, source, n_chars
    FROM g WHERE rank <= 12
    """,
)
def diversified_topk_docs(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X239 — global top-12 longest documents with AT MOST 3 per
    source: a per-source WindowGroupLimit prunes to ≤3·|sources|
    candidates, then one tiny global rank — the feed-diversity
    constraint a plain top-k (A4) can't express, with the global
    sort touching only the pruned candidates."""
    docs = load_table(spark, sf_dir, "documents")
    rs = F.row_number().over(
        W.partitionBy("source").orderBy(F.col("n_chars").desc(),
                                        "doc_id"))
    k = (docs.withColumn("rs", rs).filter(F.col("rs") <= 3)
         .select("doc_id", "source", "n_chars"))
    g = F.row_number().over(
        W.orderBy(F.col("n_chars").desc(), "doc_id"))
    return (k.withColumn("rank", g.cast("long"))
            .filter(F.col("rank") <= 12)
            .select("rank", "doc_id", "source", "n_chars"))


# ---------------------------------------------------------------------------
# X240 — Wilson lower-bound ranking
# ---------------------------------------------------------------------------

@query(
    "wilson_return_rate_parts",
    """
    WITH pr AS (
      SELECT l_partkey AS part, count(*)::BIGINT AS n,
             sum(CASE WHEN l_returnflag = 'R'
                      THEN 1 ELSE 0 END)::BIGINT AS r
      FROM lineitem GROUP BY 1),
    wl AS (
      SELECT part, n, r,
             floor(((r::DOUBLE / n + 1.9208 / n
                     - 1.96 * sqrt((r::DOUBLE / n)
                                   * (1 - r::DOUBLE / n) / n
                                   + 0.9604 / (n * n)))
                    / (1 + 3.8416 / n)) * 1000000 + 0.5)
               / 1000000 AS wilson_lb
      FROM pr WHERE n >= 5),
    rk AS (SELECT *, row_number() OVER (ORDER BY wilson_lb DESC,
                                        part) AS rank
           FROM wl)
    SELECT rank::BIGINT AS rank, part, n, r, wilson_lb
    FROM rk WHERE rank <= 20
    """,
)
def wilson_return_rate_parts(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X240 — top-20 parts by the Wilson 95% LOWER bound of their
    return rate: a 3/4-returned part ranks below a 40/60 one — the
    rank-by-lower-bound discipline that stops small-n flukes from
    topping the wall of shame (the X111 bootstrap answers the same
    doubt by resampling; Wilson is its closed form)."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = (li.groupBy(F.col("l_partkey").alias("part"))
          .agg(F.count("*").cast("long").alias("n"),
               F.sum((F.col("l_returnflag") == "R").cast("long"))
               .cast("long").alias("r")))
    n, r = F.col("n"), F.col("r")
    phat = r.cast("double") / n
    lb = ((phat + 1.9208 / n
           - 1.96 * F.sqrt(phat * (1 - phat) / n
                           + 0.9604 / (n * n)))
          / (1 + 3.8416 / n))
    wl = (pr.filter(n >= 5)
          .withColumn("wilson_lb",
                      F.floor(lb * 1000000 + F.lit(0.5)) / 1000000))
    rk = F.row_number().over(
        W.orderBy(F.col("wilson_lb").desc(), "part"))
    return (wl.withColumn("rank", rk.cast("long"))
            .filter(F.col("rank") <= 20)
            .select("rank", "part", "n", "r", "wilson_lb"))


# ---------------------------------------------------------------------------
# X241 — activity streaks
# ---------------------------------------------------------------------------

@query(
    "activity_streaks_users",
    """
    WITH days AS (SELECT DISTINCT user_id AS u, ts::DATE AS d
                  FROM events),
    a AS (SELECT u, d,
                 d - row_number() OVER (PARTITION BY u
                                        ORDER BY d)::INT AS anchor
          FROM days),
    runs AS (SELECT u, anchor, count(*)::BIGINT AS len,
                    max(d) AS e
             FROM a GROUP BY 1, 2),
    fin AS (SELECT u, len AS final_len,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY e DESC) AS rn
            FROM runs),
    agg AS (SELECT u, sum(len)::BIGINT AS n_active_days,
                   count(*)::BIGINT AS n_streaks,
                   max(len)::BIGINT AS longest_streak
            FROM runs GROUP BY 1)
    SELECT agg.u AS user_id, agg.n_active_days, agg.n_streaks,
           agg.longest_streak, fin.final_len::BIGINT AS final_streak
    FROM agg JOIN fin ON fin.u = agg.u AND fin.rn = 1
    """,
)
def activity_streaks_users(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X241 — consecutive-active-day streaks per user
    (``behavioral.activity_streaks``): gaps-and-islands on distinct
    active days, one user-keyed exchange end to end."""
    from sync_cosmos_db_spark.operators.behavioral import (
        activity_streaks,
    )

    ev = load_table(spark, sf_dir, "events")
    return activity_streaks(ev)


# ---------------------------------------------------------------------------
# X242 — CUPED experiment readout
# ---------------------------------------------------------------------------

@query(
    "cuped_experiment_users",
    """
    WITH pu AS (
      SELECT user_id,
             CASE WHEN translate(substr(sha256(user_id::VARCHAR
                    || ':exp'), 1, 3), 'abcdef', '012345')::BIGINT
                    % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
             sum(CASE WHEN event_type = 'purchase'
                       AND ts::DATE < DATE '2024-01-16'
                      THEN value ELSE 0 END) AS x,
             sum(CASE WHEN event_type = 'purchase'
                       AND ts::DATE >= DATE '2024-01-16'
                      THEN value ELSE 0 END) AS y
      FROM events GROUP BY 1, 2),
    g AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM pu),
    t AS (SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx)
                   AS theta,
                 sx / n AS xbar
          FROM g),
    adj AS (SELECT pu.arm, pu.y,
                   pu.y - t.theta * (pu.x - t.xbar) AS ya
            FROM pu, t)
    SELECT arm, count(*)::BIGINT AS n,
           floor(avg(y) * 10000 + 0.5) / 10000 AS mean_y,
           floor(avg(ya) * 10000 + 0.5) / 10000 AS mean_y_adj,
           floor((1.0 - var_samp(ya) / var_samp(y))
                 * 10000 + 0.5) / 10000 AS var_reduction
    FROM adj GROUP BY 1
    """,
)
def cuped_experiment_users(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X242 — CUPED-adjusted readout (``profiling.cuped_readout``)
    of a sha2-assigned 50/50 experiment on second-half-of-January
    purchase value, with first-half value as the pre-period
    covariate: per-arm raw vs adjusted means and the achieved
    variance reduction."""
    from sync_cosmos_db_spark.operators.profiling import cuped_readout

    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.pmod(F.translate(F.substring(F.sha2(F.concat(
            F.col("user_id").cast("string"), F.lit(":exp")), 256),
            1, 3), "abcdef", "012345").cast("bigint"),
            F.lit(100)) < 50, "A").otherwise("B")
    cut = F.to_date(F.lit("2024-01-16"))
    is_p = F.col("event_type") == "purchase"
    pu = (ev.groupBy("user_id", arm.alias("arm"))
          .agg(F.sum(F.when(is_p & (F.to_date("ts") < cut),
                            F.col("value")).otherwise(0.0))
               .alias("x"),
               F.sum(F.when(is_p & (F.to_date("ts") >= cut),
                            F.col("value")).otherwise(0.0))
               .alias("y")))
    return cuped_readout(pu, "arm", "y", "x")
