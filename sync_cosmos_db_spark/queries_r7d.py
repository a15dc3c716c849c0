"""Round-7 operator families (third batch) X182-X184: NDCG@k + MRR,
average precision, and the Murphy Brier decomposition — completing
the evaluation corner begun by X178-X181 (ranking metrics for the
retrieval stack, the priced summary of the X147 reliability diagram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X182 — NDCG@k + MRR
# ---------------------------------------------------------------------------

@query(
    "ndcg_mrr_customers",
    """
    WITH d AS (
      SELECT c_nationkey AS g, c_acctbal AS s, c_custkey AS i,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END
               AS r
      FROM customer),
    ranked AS (
      SELECT g, r,
             row_number() OVER (PARTITION BY g ORDER BY s DESC, i)
               AS rn,
             row_number() OVER (PARTITION BY g ORDER BY r DESC, i)
               AS ri
      FROM d),
    agg AS (
      SELECT g, count(*)::BIGINT AS n_items,
             sum(CASE WHEN r > 0 THEN 1 ELSE 0 END)::BIGINT AS n_rel,
             sum(CASE WHEN rn <= 10 THEN r / log2(rn + 1)
                      ELSE 0 END) AS dcg,
             sum(CASE WHEN ri <= 10 THEN r / log2(ri + 1)
                      ELSE 0 END) AS idcg,
             min(CASE WHEN r > 0 THEN rn END) AS fr
      FROM ranked GROUP BY 1)
    SELECT g AS c_nationkey, n_items, n_rel,
           floor(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END
                 * 1000000 + 0.5) / 1000000 AS ndcg_k,
           floor(coalesce(1.0 / fr, 0) * 1000000 + 0.5) / 1000000
             AS rr
    FROM agg
    """,
)
def ndcg_mrr_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X182 — NDCG@10 + MRR per nation (``retrieval.ndcg_mrr``):
    customers ranked by account balance, relevance = BUILDING
    segment membership — the ranking-eval readout (does the score
    order surface the relevant items early, and how soon does the
    first one appear).  Two rank windows on one shuffle, one
    aggregate; zero-relevant groups report 0, not an error."""
    from sync_cosmos_db_spark.operators.retrieval import ndcg_mrr

    cust = load_table(spark, sf_dir, "customer")
    return ndcg_mrr(cust, "c_nationkey", "c_acctbal",
                    (F.col("c_mktsegment") == "BUILDING").cast("double"),
                    "c_custkey", k=10)


# ---------------------------------------------------------------------------
# X183 — average precision
# ---------------------------------------------------------------------------

@query(
    "avg_precision_customers",
    """
    WITH d AS (
      SELECT c_nationkey AS g, c_acctbal AS s, c_custkey AS i,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS r
      FROM customer),
    ranked AS (
      SELECT g, r,
             row_number() OVER w AS rn,
             sum(r) OVER (PARTITION BY g ORDER BY s DESC, i
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cp
      FROM d WINDOW w AS (PARTITION BY g ORDER BY s DESC, i)),
    agg AS (
      SELECT g, count(*)::BIGINT AS n_items,
             sum(r)::BIGINT AS n_rel,
             sum(CASE WHEN r > 0 THEN cp::DOUBLE / rn END) AS psum
      FROM ranked GROUP BY 1)
    SELECT g AS c_nationkey, n_items, n_rel,
           floor(CASE WHEN n_rel > 0 THEN psum / n_rel ELSE 0 END
                 * 1000000 + 0.5) / 1000000 AS ap
    FROM agg
    """,
)
def avg_precision_customers(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X183 — average precision per nation
    (``retrieval.average_precision``) on the same
    balance-ranks-BUILDING setup as X182: the PR-curve area at
    observed operating points — prevalence-sensitive where ROC-AUC
    (X179) is prevalence-blind, i.e. the metric that actually moves
    in the rare-positive retrieval regime.  Rank + cumulative
    windows share ONE shuffle."""
    from sync_cosmos_db_spark.operators.retrieval import (
        average_precision,
    )

    cust = load_table(spark, sf_dir, "customer")
    return average_precision(
        cust, "c_nationkey", "c_acctbal",
        (F.col("c_mktsegment") == "BUILDING").cast("long"),
        "c_custkey")


# ---------------------------------------------------------------------------
# X184 — Brier decomposition
# ---------------------------------------------------------------------------

@query(
    "brier_decomposition_events",
    """
    WITH sc AS (
      SELECT translate(substr(sha256(event_id::VARCHAR || ':cal'),
                              1, 6), 'abcdef', '012345')::BIGINT
               % 1000 / 1000.0 AS s,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END
               AS y
      FROM events),
    bins AS (
      SELECT least(floor(s * 10), 9)::BIGINT AS b,
             count(*)::DOUBLE AS nb, avg(s) AS pb, avg(y) AS ob
      FROM sc GROUP BY 1),
    gl AS (SELECT count(*)::DOUBLE AS n, avg(y) AS obar,
                  avg((s - y) * (s - y)) AS brier
           FROM sc)
    SELECT n::BIGINT AS n,
           floor(brier * 1000000 + 0.5) / 1000000 AS brier,
           floor(sum(nb * (pb - ob) * (pb - ob)) / n
                 * 1000000 + 0.5) / 1000000 AS reliability,
           floor(sum(nb * (ob - obar) * (ob - obar)) / n
                 * 1000000 + 0.5) / 1000000 AS resolution,
           floor(obar * (1 - obar) * 1000000 + 0.5) / 1000000
             AS uncertainty
    FROM bins, gl
    GROUP BY n, brier, obar
    """,
)
def brier_decomposition_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X184 — Murphy decomposition of the Brier score
    (``profiling.brier_decomposition``) on the SAME deterministic
    sha2-uniform score and purchase outcome as the X147 reliability
    bins: X147 shows where calibration fails, this prices it into
    reliability − resolution + uncertainty plus the exact Brier.
    One scan → 10-row bin table + broadcast 1-row global."""
    from sync_cosmos_db_spark.operators.profiling import (
        brier_decomposition,
    )

    ev = load_table(spark, sf_dir, "events")
    score = (F.pmod(
        F.translate(F.substring(
            F.sha2(F.concat(F.col("event_id").cast("string"),
                            F.lit(":cal")), 256), 1, 6),
            "abcdef", "012345").cast("bigint"), F.lit(1000)) / 1000.0)
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    d = ev.select(score.alias("s"), y.alias("y"))
    return brier_decomposition(d, "s", "y", n_bins=10)
