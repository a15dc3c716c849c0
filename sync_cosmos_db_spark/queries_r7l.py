"""Round-7 operator families (eleventh batch) X211-X214: deny-list
filter with per-rule attribution, exact price/volume revenue bridge,
leakage-safe label construction, and decay-weighted engagement —
the blocklist step with its hit-count audit, the two-factor
revenue-delta decomposition, the temporal train-set builder that
makes X128's leakage impossible by construction, and the continuous
recency×frequency score beside X103's RFM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X211 — deny-list filter
# ---------------------------------------------------------------------------

@query(
    "denylist_documents_sources",
    """
    SELECT CASE WHEN source = 'src3' THEN 'exact'
                WHEN substr(source, 1, 4) = 'src1' THEN 'prefix'
                ELSE 'kept' END AS rule_kind,
           CASE WHEN source = 'src3' THEN 'src3'
                WHEN substr(source, 1, 4) = 'src1' THEN 'src1'
                ELSE '-' END AS rule,
           count(*)::BIGINT AS n_rows
    FROM documents GROUP BY 1, 2
    """,
)
def denylist_documents_sources(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X211 — deny-list over document sources
    (``curation.denylist_filter``): exact rule 'src3' plus prefix
    rule 'src1' (which catches src1 AND src10–src19 — exactly the
    over-firing a per-rule hit count exposes); survivors land in
    the kept bucket."""
    from sync_cosmos_db_spark.operators.curation import (
        denylist_filter,
    )

    docs = load_table(spark, sf_dir, "documents")
    return denylist_filter(docs, "source", ["src3"], ["src1"])


# ---------------------------------------------------------------------------
# X212 — price/volume decomposition
# ---------------------------------------------------------------------------

@query(
    "pv_decomposition_priority",
    """
    WITH j AS (
      SELECT o.o_orderpriority AS g,
             CASE WHEN l.l_shipdate >= DATE '1998-01-01'
                  THEN 1 ELSE 0 END AS per,
             l.l_quantity AS q, l.l_extendedprice AS r
      FROM lineitem l JOIN orders o
        ON l.l_orderkey = o.o_orderkey),
    per AS (SELECT g, per,
                   floor(sum(r) * 100 + 0.5) / 100 AS rev,
                   sum(q) AS q
            FROM j GROUP BY 1, 2),
    piv AS (SELECT g,
                   max(CASE WHEN per = 0 THEN rev END) AS r1,
                   max(CASE WHEN per = 0 THEN q END) AS q1,
                   max(CASE WHEN per = 1 THEN rev END) AS r2,
                   max(CASE WHEN per = 1 THEN q END) AS q2
            FROM per GROUP BY 1)
    SELECT g AS prio, r1 AS rev_base, r2 AS rev_curr,
           floor((r2 - r1) * 100 + 0.5) / 100 AS delta,
           floor((q2 - q1) * (r1 / q1) * 100 + 0.5) / 100
             AS volume_effect,
           floor(((r2 / q2) - (r1 / q1)) * q2 * 100 + 0.5) / 100
             AS price_effect
    FROM piv
    """,
)
def pv_decomposition_priority(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X212 — revenue bridge per order priority between pre-1998 and
    1998-onward shipments (``profiling.price_volume_decomposition``):
    volume effect at old prices + price effect at new volume sum to
    the delta by algebraic identity."""
    from sync_cosmos_db_spark.operators.profiling import (
        price_volume_decomposition,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .select(F.col("o_orderpriority").alias("prio"),
                 F.when(F.to_date("l_shipdate")
                        >= F.to_date(F.lit("1998-01-01")), 1)
                 .otherwise(0).alias("per"),
                 "l_quantity", "l_extendedprice"))
    return price_volume_decomposition(
        j, "prio", F.col("per"), "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# X213 — leakage-safe labels
# ---------------------------------------------------------------------------

@query(
    "labels_users_cutoff",
    """
    WITH a AS (
      SELECT user_id,
             sum(CASE WHEN ts::DATE >= DATE '2024-01-21' - 14
                       AND ts::DATE < DATE '2024-01-21'
                      THEN 1 ELSE 0 END)::BIGINT AS n_events_obs,
             sum(CASE WHEN ts::DATE >= DATE '2024-01-21' - 14
                       AND ts::DATE < DATE '2024-01-21'
                       AND event_type = 'purchase'
                      THEN 1 ELSE 0 END)::BIGINT AS n_positive_obs,
             count(DISTINCT CASE
               WHEN ts::DATE >= DATE '2024-01-21' - 14
                AND ts::DATE < DATE '2024-01-21'
               THEN ts::DATE END)::BIGINT AS days_active_obs,
             min(CASE WHEN ts::DATE >= DATE '2024-01-21' - 14
                       AND ts::DATE < DATE '2024-01-21'
                      THEN date_diff('day', ts::DATE,
                                     DATE '2024-01-21') END)
               ::BIGINT AS recency_days,
             max(CASE WHEN ts::DATE >= DATE '2024-01-21'
                       AND ts::DATE < DATE '2024-01-21' + 7
                      THEN 1 ELSE 0 END)::BIGINT AS label
      FROM events GROUP BY 1)
    SELECT * FROM a WHERE n_events_obs > 0
    """,
)
def labels_users_cutoff(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    """X213 — leakage-safe labels at cutoff 2024-01-21
    (``curation.build_labels``): 14-day observation features, 7-day
    outcome label, one conditional-aggregate scan."""
    from sync_cosmos_db_spark.operators.curation import build_labels

    ev = load_table(spark, sf_dir, "events")
    return build_labels(ev, "user_id", "ts", "event_type",
                        "2024-01-21", obs_days=14, out_days=7)


# ---------------------------------------------------------------------------
# X214 — decay-weighted engagement
# ---------------------------------------------------------------------------

@query(
    "decayed_engagement_types",
    """
    WITH hw AS (SELECT max(ts)::DATE AS h FROM events),
    d AS (SELECT event_type,
                 date_diff('day', ts::DATE, h) AS age
          FROM events, hw)
    SELECT event_type, count(*)::BIGINT AS n_events,
           floor(sum(pow(2.0, -age / 7.0)) * 10000 + 0.5) / 10000
             AS decayed_mass,
           floor(sum(pow(2.0, -age / 7.0)) / count(*)
                 * 10000 + 0.5) / 10000 AS mass_share_of_count
    FROM d GROUP BY 1
    """,
)
def decayed_engagement_types(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X214 — 7-day-half-life decayed activity mass per event type
    (``behavioral.decayed_engagement``): broadcast high-water mark,
    in-row ``pow(2, −age/h)`` weights, one group reduce."""
    from sync_cosmos_db_spark.operators.behavioral import (
        decayed_engagement,
    )

    ev = load_table(spark, sf_dir, "events")
    return decayed_engagement(ev, "event_type", "ts",
                              half_life_days=7.0)
