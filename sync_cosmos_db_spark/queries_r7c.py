"""Round-7 operator families (second batch) X178-X181: Cohen's kappa
inter-annotator agreement, exact distributed ROC-AUC, Hill tail-index
estimator, and the seasonal-naive forecast error baseline (MASE) —
the model/label EVALUATION corner of the pipeline toolkit (calibration
X147 and rank-sum X136 existed; discrimination, label QC, tail
behavior, and forecast baselines did not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X178 — Cohen's kappa
# ---------------------------------------------------------------------------

@query(
    "cohens_kappa_events",
    """
    WITH lab AS (
      SELECT event_type AS a,
             CASE WHEN translate(substr(sha256(event_id::VARCHAR
                                               || ':anno'), 1, 6),
                                 'abcdef', '012345')::BIGINT % 10 = 0
                  THEN 'view' ELSE event_type END AS b
      FROM events),
    conf AS (SELECT a, b, count(*)::BIGINT AS c FROM lab GROUP BY 1, 2),
    tot AS (SELECT sum(c) AS n,
                   sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree
            FROM conf),
    ma AS (SELECT a, sum(c) AS na FROM conf GROUP BY 1),
    mb AS (SELECT b AS a, sum(c) AS nb FROM conf GROUP BY 1),
    pe AS (SELECT sum(na::DOUBLE * nb) AS pe_num
           FROM ma JOIN mb USING (a))
    SELECT n::BIGINT AS n,
           floor(agree / n * 1000000 + 0.5) / 1000000 AS p_o,
           floor(pe_num / (n::DOUBLE * n) * 1000000 + 0.5) / 1000000
             AS p_e,
           floor((agree / n - pe_num / (n::DOUBLE * n))
                 / (1 - pe_num / (n::DOUBLE * n)) * 1000000 + 0.5)
             / 1000000 AS kappa
    FROM tot, pe
    """,
)
def cohens_kappa_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X178 — Cohen's kappa (``profiling.cohens_kappa``) between the
    event-type column and a deterministically perturbed second
    "annotator" (every 10th event by sha2 bucket relabeled 'view' —
    the same cross-engine hash_bucket trick every split uses, so both
    engines build the identical noisy labeler): the chance-corrected
    agreement gate a labeling pipeline runs before trusting
    annotations.  |labels|²-sized aggregates only."""
    from sync_cosmos_db_spark.operators.curation import hash_bucket
    from sync_cosmos_db_spark.operators.profiling import cohens_kappa

    ev = load_table(spark, sf_dir, "events")
    lab = ev.select(
        F.col("event_type").alias("a"),
        F.when(hash_bucket("event_id", 10, "anno") == 0, "view")
        .otherwise(F.col("event_type")).alias("b"))
    return cohens_kappa(lab, "a", "b")


# ---------------------------------------------------------------------------
# X179 — ROC-AUC
# ---------------------------------------------------------------------------

@query(
    "roc_auc_orders",
    """
    WITH sc AS (
      SELECT o_totalprice::DOUBLE AS s,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    g AS (SELECT s, count(*)::BIGINT AS n, sum(y)::BIGINT AS np
          FROM sc GROUP BY 1),
    o AS (SELECT s, n, np,
                 coalesce(sum(n) OVER (ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS off
          FROM g),
    agg AS (SELECT sum(np * (off + (n + 1) / 2.0)) AS rank_pos,
                   sum(np)::BIGINT AS n_pos,
                   sum(n - np)::BIGINT AS n_neg
            FROM o)
    SELECT n_pos, n_neg,
           floor((rank_pos - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos::DOUBLE * n_neg) * 1000000 + 0.5) / 1000000
             AS auc
    FROM agg
    """,
)
def roc_auc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X179 — exact ROC-AUC (``profiling.roc_auc``) of order price as
    a score for the finalized flag: the Mann-Whitney rank formula
    with midrank ties, ranks produced by the X11 two-phase
    distributed scan (NO single-partition window — the X151 lesson
    applied at birth; the oracle's global cumulative window is the
    luxury only the 15k-row sf0.01 table affords)."""
    from sync_cosmos_db_spark.operators.profiling import roc_auc

    orders = load_table(spark, sf_dir, "orders")
    return roc_auc(orders, "o_totalprice",
                   (F.col("o_orderstatus") == "F").cast("long"))


# ---------------------------------------------------------------------------
# X180 — Hill tail index
# ---------------------------------------------------------------------------

@query(
    "hill_tail_orders",
    """
    WITH d AS (SELECT o_orderpriority AS g, o_totalprice::DOUBLE AS v
               FROM orders WHERE o_totalprice > 0),
    top AS (SELECT g, v,
                   row_number() OVER (PARTITION BY g ORDER BY v DESC)
                     AS rn
            FROM d),
    k1 AS (SELECT g, v AS x_k1 FROM top WHERE rn = 101)
    SELECT t.g AS o_orderpriority, count(*)::BIGINT AS k_used,
           max(k1.x_k1) AS x_k1,
           floor(1.0 / avg(ln(t.v / k1.x_k1)) * 10000 + 0.5) / 10000
             AS alpha
    FROM top t JOIN k1 ON k1.g = t.g
    WHERE t.rn <= 100
    GROUP BY 1
    """,
)
def hill_tail_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X180 — Hill tail-index estimator
    (``profiling.hill_tail_index``, k=100) of order totals per
    priority class: alpha near or below 2 flags infinite-variance
    heavy tails (means and shuffle-size estimates stop behaving) —
    the rank-domain sibling of the X168 Zipf slope.  Per-group
    descending rank capped by WindowGroupLimit at k+1 rows, then one
    conditional aggregate."""
    from sync_cosmos_db_spark.operators.profiling import hill_tail_index

    orders = load_table(spark, sf_dir, "orders")
    return hill_tail_index(orders, "o_orderpriority", "o_totalprice",
                           k=100)


# ---------------------------------------------------------------------------
# X181 — seasonal-naive forecast baseline (MASE)
# ---------------------------------------------------------------------------

@query(
    "mase_daily_revenue",
    """
    WITH daily AS (
      SELECT o_orderdate AS d, sum(o_totalprice) AS r
      FROM orders GROUP BY 1),
    e AS (SELECT abs(r - lag(r, 1) OVER (ORDER BY d)) AS e1,
                 abs(r - lag(r, 7) OVER (ORDER BY d)) AS es
          FROM daily)
    SELECT count(*)::BIGINT AS n_days,
           floor(avg(e1) * 10000 + 0.5) / 10000 AS mae_naive,
           floor(avg(es) * 10000 + 0.5) / 10000 AS mae_seasonal,
           floor(avg(es) / avg(e1) * 10000 + 0.5) / 10000
             AS mase_ratio
    FROM e
    """,
)
def mase_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X181 — seasonal-naive forecast error baseline
    (``temporal.mase_profile``, season=7) on daily order revenue:
    MAE of the lag-1 naive vs the lag-7 seasonal naive and their
    ratio — the scale-free bar any forecast must beat.  The corpus
    collapses to O(days) rows before any window (the X121/X135
    period-collapse shape); the single tiny-series sort is on the
    collapsed table, never the fact table."""
    from sync_cosmos_db_spark.operators.temporal import mase_profile

    orders = load_table(spark, sf_dir, "orders")
    return mase_profile(orders, "o_orderdate", "o_totalprice",
                        season=7)
