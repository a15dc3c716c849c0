"""Round-7 operator families (seventeenth batch) X235-X238:
fulfillment lead-time SLA profile, header/detail reconciliation,
distinctive terms by prior-regularized log-odds, and gold-label
aggregation with an explicit tie policy — the order-to-ship SLA
numbers, the finance-closing cross-table audit beside X76's FD
check, Monroe's fightin'-words beside X140's KL, and the
labeling-ops trust table beside X178's kappa.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X235 — lead-time SLA profile
# ---------------------------------------------------------------------------

@query(
    "lead_time_sla_priority",
    """
    WITH lt AS (
      SELECT o.o_orderpriority AS prio,
             date_diff('day', o.o_orderdate::DATE,
                       l.l_shipdate::DATE) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT prio, count(*)::BIGINT AS n_lines,
           floor(quantile_cont(days, 0.5) * 10000 + 0.5) / 10000
             AS p50_days,
           floor(quantile_cont(days, 0.9) * 10000 + 0.5) / 10000
             AS p90_days,
           floor(sum(CASE WHEN days > 90 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) * 10000 + 0.5) / 10000 AS late_rate
    FROM lt GROUP BY 1
    """,
)
def lead_time_sla_priority(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X235 — order→ship lead time per priority: exact p50/p90 days
    and the >90-day late rate — the fulfillment SLA scorecard, one
    join + one group reduce with exact percentiles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lt = (li.join(orders, li.l_orderkey == orders.o_orderkey)
          .select(F.col("o_orderpriority").alias("prio"),
                  F.datediff(F.to_date("l_shipdate"),
                             F.to_date("o_orderdate"))
                  .cast("long").alias("days")))
    fr = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return (lt.groupBy("prio")
            .agg(F.count("*").cast("long").alias("n_lines"),
                 fr(F.percentile("days", F.lit(0.5)))
                 .alias("p50_days"),
                 fr(F.percentile("days", F.lit(0.9)))
                 .alias("p90_days"),
                 fr(F.sum((F.col("days") > 90).cast("long"))
                    / F.count("*")).alias("late_rate")))


# ---------------------------------------------------------------------------
# X236 — header/detail reconciliation
# ---------------------------------------------------------------------------

@query(
    "reconcile_orders_lineitem",
    """
    WITH d AS (SELECT l_orderkey AS k, sum(l_extendedprice) AS ds
               FROM lineitem GROUP BY 1),
    j AS (SELECT o.o_orderpriority AS prio, o.o_totalprice AS h,
                 d.ds
          FROM orders o LEFT JOIN d ON d.k = o.o_orderkey)
    SELECT prio, count(ds)::BIGINT AS n_matched_rows,
           sum(CASE WHEN ds IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_no_detail,
           sum(CASE WHEN ds IS NOT NULL
                     AND abs(h - ds) / h * 100 <= 1.0
                    THEN 1 ELSE 0 END)::BIGINT AS n_within_tol,
           floor(quantile_cont(h / ds, 0.5) * 10000 + 0.5) / 10000
             AS median_ratio,
           floor(quantile_cont(abs(h - ds) / h * 100, 0.9)
                 * 10000 + 0.5) / 10000 AS p90_abs_pct_err
    FROM j GROUP BY 1
    """,
)
def reconcile_orders_lineitem(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X236 — header/detail reconciliation of order totals vs the
    sum of their lineitem prices
    (``expectations.header_detail_reconciliation``): in THIS
    synthetic corpus the header runs a systematic ~2.7× over the
    detail — exactly the formula-mismatch signature (tax/discount/
    multiplier) the median-ratio column exists to expose."""
    from sync_cosmos_db_spark.operators.expectations import (
        header_detail_reconciliation,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("h"),
        F.col("o_orderpriority").alias("prio"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice")
    return header_detail_reconciliation(
        orders, li, "k", "h", "l_extendedprice", "prio",
        tol_pct=1.0)


# ---------------------------------------------------------------------------
# X237 — distinctive terms
# ---------------------------------------------------------------------------

@query(
    "distinctive_terms_sources",
    """
    WITH toks AS (
      SELECT source AS g,
             unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents),
    counts AS (SELECT g, tok, count(*)::DOUBLE AS c
               FROM toks WHERE tok <> '' GROUP BY 1, 2),
    tt AS (SELECT tok, sum(c) AS ct FROM counts GROUP BY 1),
    gt AS (SELECT g, sum(c) AS ng FROM counts GROUP BY 1),
    n AS (SELECT sum(c) AS n FROM counts),
    j AS (SELECT counts.g, counts.tok, counts.c, tt.ct, gt.ng, n.n
          FROM counts JOIN tt USING (tok) JOIN gt USING (g), n),
    sc AS (SELECT g, tok, c,
                  floor((ln((c + 1.0) / (ng - c + 1.0))
                         - ln((ct - c + 1.0)
                              / (n - ng - (ct - c) + 1.0)))
                        / sqrt(1.0 / (c + 1.0)
                               + 1.0 / (ct - c + 1.0))
                        * 10000 + 0.5) / 10000 AS z
           FROM j),
    rk AS (SELECT *, row_number() OVER (PARTITION BY g
                                        ORDER BY z DESC, tok)
             AS rank
           FROM sc)
    SELECT g AS source, rank::BIGINT AS rank, tok AS token,
           c::BIGINT AS n_in_group, z
    FROM rk WHERE rank <= 5
    """,
)
def distinctive_terms_sources(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X237 — top-5 distinctive terms per source by Dirichlet-prior
    log-odds z (``text.distinctive_terms``): the variance term
    shrinks rare-token flukes that raw KL (X140) and TF-IDF inflate;
    ranking on the ROUNDED z keeps both engines' elections
    identical."""
    from sync_cosmos_db_spark.operators.text import distinctive_terms

    docs = load_table(spark, sf_dir, "documents")
    return distinctive_terms(docs, "source", "text", top_k=5)


# ---------------------------------------------------------------------------
# X238 — gold-label aggregation
# ---------------------------------------------------------------------------

@query(
    "gold_labels_events",
    """
    WITH base AS (
      SELECT event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS y
      FROM events),
    ann AS (
      SELECT event_id, 'a1' AS annotator,
             CASE WHEN translate(substr(sha256(event_id::VARCHAR
                    || ':a1'), 1, 3), 'abcdef', '012345')::BIGINT
                    % 100 < 20 THEN 1 - y ELSE y END AS lab
      FROM base
      UNION ALL
      SELECT event_id, 'a2',
             CASE WHEN translate(substr(sha256(event_id::VARCHAR
                    || ':a2'), 1, 3), 'abcdef', '012345')::BIGINT
                    % 100 < 20 THEN 1 - y ELSE y END
      FROM base
      UNION ALL
      SELECT event_id, 'a3',
             CASE WHEN translate(substr(sha256(event_id::VARCHAR
                    || ':a3'), 1, 3), 'abcdef', '012345')::BIGINT
                    % 100 < 20 THEN 1 - y ELSE y END
      FROM base
      UNION ALL
      SELECT event_id, 'a4',
             CASE WHEN translate(substr(sha256(event_id::VARCHAR
                    || ':a4'), 1, 3), 'abcdef', '012345')::BIGINT
                    % 100 < 20 THEN 1 - y ELSE y END
      FROM base),
    votes AS (SELECT event_id, count(*) AS nv, sum(lab) AS s
              FROM ann GROUP BY 1),
    maj AS (SELECT event_id,
                   CASE WHEN s * 2 > nv THEN 1
                        WHEN s * 2 < nv THEN 0 END AS gold
            FROM votes),
    pa AS (
      SELECT a.annotator,
             count(*)::BIGINT AS n_decided,
             sum(CASE WHEN a.lab = m.gold THEN 1 ELSE 0 END)
               ::BIGINT AS n_agree
      FROM ann a JOIN maj m USING (event_id)
      WHERE m.gold IS NOT NULL GROUP BY 1)
    SELECT annotator, n_decided, n_agree,
           floor(n_agree::DOUBLE / n_decided * 10000 + 0.5) / 10000
             AS agreement_rate
    FROM pa
    UNION ALL
    SELECT '__ties__',
           sum(CASE WHEN gold IS NULL THEN 1 ELSE 0 END)::BIGINT,
           0::BIGINT, NULL::DOUBLE
    FROM maj
    """,
)
def gold_labels_events(spark: SparkSession,
                       sf_dir: str) -> DataFrame:
    """X238 — majority gold labels from four deterministic
    sha2-noised annotators of the purchase flag (20% independent
    flips — the X178 perturbation discipline), with 2-2 ties
    reported as undecided (``curation.aggregate_annotations``): who
    to trust and how much gold survives."""
    from sync_cosmos_db_spark.operators.curation import (
        aggregate_annotations,
    )

    ev = load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    base = ev.select(F.col("event_id").alias("item"), y.alias("y"))

    def annot(k):
        u = F.pmod(
            F.translate(F.substring(F.sha2(F.concat(
                F.col("item").cast("string"), F.lit(f":a{k}")), 256),
                1, 3), "abcdef", "012345").cast("bigint"),
            F.lit(100))
        lab = F.when(u < 20, 1 - F.col("y")).otherwise(F.col("y"))
        return base.select("item", F.lit(f"a{k}").alias("annotator"),
                           lab.alias("lab"))

    ann = annot(1).unionByName(annot(2)) \
        .unionByName(annot(3)).unionByName(annot(4))
    return aggregate_annotations(ann, "item", "annotator", "lab")
