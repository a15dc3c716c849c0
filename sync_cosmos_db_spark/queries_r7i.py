"""Round-7 operator families (eighth batch) X199-X202: exact
equi-depth histogram, star-schema dimension build with deterministic
surrogate keys, group medoid election, and new-vs-returning DAU
decomposition — the order-statistic complement of X87's equi-width
bins, the warehouse load step, the typical-member picker, and the
growth-accounting view behind every DAU chart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X199 — exact equi-depth histogram
# ---------------------------------------------------------------------------

@query(
    "equi_depth_orders_price",
    """
    WITH idx AS (
      SELECT o_totalprice AS v, o_orderkey AS tb,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey)
               AS gi,
             count(*) OVER () AS n
      FROM orders)
    SELECT (gi - 1) * 10 // n AS bucket,
           count(*)::BIGINT AS n_rows, min(v) AS lo, max(v) AS hi
    FROM idx GROUP BY 1
    """,
)
def equi_depth_orders_price(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X199 — 10-bucket exact equi-depth histogram of order prices
    (``profiling.equi_depth_histogram``): global ranks from the X11
    two-phase scan, bucket id by INTEGER division — both engines
    place every row identically; boundaries are true order
    statistics, not `approx_percentile` estimates."""
    from sync_cosmos_db_spark.operators.profiling import (
        equi_depth_histogram,
    )

    orders = load_table(spark, sf_dir, "orders")
    return equi_depth_histogram(
        orders.select(F.col("o_totalprice").alias("v"),
                      F.col("o_orderkey").alias("tb")),
        "v", "tb", k=10)


# ---------------------------------------------------------------------------
# X200 — dimension build with surrogate keys
# ---------------------------------------------------------------------------

@query(
    "dimension_orders_priority_status",
    """
    WITH dim AS (SELECT DISTINCT o_orderpriority AS prio,
                        o_orderstatus AS status FROM orders),
    h AS (SELECT prio, status,
                 prio || chr(31) || status AS nat,
                 translate(substr(sha256(prio || chr(31) || status),
                                  1, 12),
                           'abcdef', '012345')::BIGINT AS hv
          FROM dim),
    sk AS (SELECT prio, status,
                  row_number() OVER (ORDER BY hv, nat) AS sk
           FROM h)
    SELECT s.sk, s.prio, s.status, count(*)::BIGINT AS n_orders
    FROM orders o JOIN sk s ON s.prio = o.o_orderpriority
                           AND s.status = o.o_orderstatus
    GROUP BY 1, 2, 3
    """,
)
def dimension_orders_priority_status(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """X200 — (priority, status) dimension built with deterministic
    dense surrogate keys (``curation.build_dimension``), joined back
    to the fact table for per-member counts.  The demo dimension is
    tiny (≤15 rows, the join broadcasts); the operator's two-phase
    rank is the same plan at billion-row dimension cardinality."""
    from sync_cosmos_db_spark.operators.curation import (
        build_dimension,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"))
    dim = build_dimension(orders, ["prio", "status"])
    return (orders.join(dim, ["prio", "status"])
            .groupBy("sk", "prio", "status")
            .agg(F.count("*").cast("long").alias("n_orders")))


# ---------------------------------------------------------------------------
# X201 — group medoid election
# ---------------------------------------------------------------------------

@query(
    "medoid_lineitem_price",
    """
    WITH d AS (SELECT l_returnflag AS g, l_extendedprice AS v,
                      l_orderkey * 8 + l_linenumber AS lid
               FROM lineitem),
    m AS (SELECT g, count(*)::BIGINT AS n,
                 floor(avg(v) * 100 + 0.5) / 100 AS mean_value
          FROM d GROUP BY 1),
    j AS (SELECT d.g, d.v, d.lid, m.n, m.mean_value,
                 abs(d.v - m.mean_value) AS diff
          FROM d JOIN m USING (g)),
    pick AS (SELECT g, n, mean_value, v, lid,
                    row_number() OVER (PARTITION BY g
                                       ORDER BY diff, lid) AS rn
             FROM j)
    SELECT g, n, mean_value, lid AS rep_id, v AS rep_value
    FROM pick WHERE rn = 1
    """,
)
def medoid_lineitem_price(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X201 — the most-typical lineitem per return flag
    (``profiling.group_medoid``): the row nearest the (grid-rounded)
    group mean price, ties to the lowest synthetic line id.  One
    group aggregate + one group-keyed join + one struct-min
    election."""
    from sync_cosmos_db_spark.operators.profiling import group_medoid

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber"))
        .cast("long").alias("lid"))
    return group_medoid(d, "g", "v", "lid")


# ---------------------------------------------------------------------------
# X202 — new vs returning DAU
# ---------------------------------------------------------------------------

@query(
    "new_returning_daily_events",
    """
    WITH f AS (SELECT user_id, min(ts)::DATE AS fd
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT e.user_id, f.fd, e.ts::DATE AS day
          FROM events e JOIN f USING (user_id))
    SELECT day, count(*)::BIGINT AS dau,
           sum(CASE WHEN day = fd THEN 1 ELSE 0 END)::BIGINT
             AS new_users,
           (count(*) - sum(CASE WHEN day = fd THEN 1 ELSE 0 END))
             ::BIGINT AS returning_users,
           floor(sum(CASE WHEN day = fd THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) * 10000 + 0.5) / 10000 AS pct_new
    FROM a GROUP BY 1
    """,
)
def new_returning_daily_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X202 — daily actives decomposed into new vs returning
    (``behavioral.new_vs_returning``): first-touch aggregate +
    user-keyed join/distinct on one partitioning + day-keyed count
    — X187's cohort triangle viewed as the day-by-day margin."""
    from sync_cosmos_db_spark.operators.behavioral import (
        new_vs_returning,
    )

    ev = load_table(spark, sf_dir, "events")
    return new_vs_returning(ev, "user_id", "ts")
