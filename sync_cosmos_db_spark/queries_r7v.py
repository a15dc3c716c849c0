"""Round-7 operator families (final batch) X251-X254:
duplicate-charge detector, AR aging buckets, MDE/power table, and
backfill manifest — the fraud-ops pair audit, the finance aging
report, the how-big-must-the-experiment-be table that should run
BEFORE X107/X242 read anything out, and X244's completeness audit
turned into an actionable work list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X251 — duplicate-charge detector
# ---------------------------------------------------------------------------

@query(
    "duplicate_charges_orders",
    """
    WITH o AS (
      SELECT o_custkey AS cust,
             floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
             o_orderdate::DATE AS d, o_orderkey AS k
      FROM orders)
    SELECT a.cust, a.cents / 100.0 AS amount,
           a.k AS orderkey_a, b.k AS orderkey_b,
           abs(date_diff('day', a.d, b.d))::BIGINT AS gap_days
    FROM o a JOIN o b
      ON a.cust = b.cust AND a.cents = b.cents AND a.k < b.k
    WHERE abs(date_diff('day', a.d, b.d)) <= 7
    """,
)
def duplicate_charges_orders(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X251 — duplicate-charge candidates: same customer, same
    integer-cents amount, within 7 days, distinct order keys — the
    fraud/billing-ops audit.  The self-join keys on
    (customer, cents), so fan-out is bounded by per-(cust, amount)
    multiplicity — the blocking discipline of X20/X119 applied to a
    transactional audit; cents snap BEFORE the join so float
    amounts can't split a true pair across keys."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_custkey").alias("cust"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"))
    a = o.select(F.col("cust"), F.col("cents"),
                 F.col("d").alias("da"), F.col("k").alias("ka"))
    b = o.select(F.col("cust"), F.col("cents"),
                 F.col("d").alias("db"), F.col("k").alias("kb"))
    gap = F.abs(F.datediff(F.col("da"), F.col("db")))
    return (a.join(b, ["cust", "cents"])
            .filter((F.col("ka") < F.col("kb")) & (gap <= 7))
            .select("cust", (F.col("cents") / 100.0).alias("amount"),
                    F.col("ka").alias("orderkey_a"),
                    F.col("kb").alias("orderkey_b"),
                    gap.cast("long").alias("gap_days")))


# ---------------------------------------------------------------------------
# X252 — AR aging buckets
# ---------------------------------------------------------------------------

@query(
    "ar_aging_open_orders",
    """
    WITH hw AS (SELECT max(o_orderdate)::DATE AS asof FROM orders),
    o AS (SELECT o_orderpriority AS prio,
                 floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
                 date_diff('day', o_orderdate::DATE, hw.asof)
                   AS age
          FROM orders, hw WHERE o_orderstatus = 'O')
    SELECT prio,
           CASE WHEN age <= 30 THEN '0-30'
                WHEN age <= 60 THEN '31-60'
                WHEN age <= 90 THEN '61-90'
                ELSE '90+' END AS bucket,
           count(*)::BIGINT AS n_orders,
           sum(cents) / 100.0 AS open_revenue
    FROM o GROUP BY 1, 2
    """,
)
def ar_aging_open_orders(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """X252 — accounts-receivable aging of OPEN orders as of the
    corpus high-water date: the 0-30/31-60/61-90/90+ buckets every
    finance close runs; integer-cents revenue, broadcast 1-row
    as-of anchor (the X94 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    hw = (orders.agg(F.to_date(F.max("o_orderdate")).alias("asof"))
          .withColumn("__k", F.floor(F.month("asof") * 0)))
    o = (orders.filter(F.col("o_orderstatus") == "O")
         .withColumn("__k", F.floor(F.month("o_orderdate") * 0))
         .join(F.broadcast(hw), "__k"))
    age = F.datediff(F.col("asof"), F.to_date("o_orderdate"))
    bucket = (F.when(age <= 30, "0-30").when(age <= 60, "31-60")
              .when(age <= 90, "61-90").otherwise("90+"))
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) \
        .cast("long")
    return (o.groupBy(F.col("o_orderpriority").alias("prio"),
                      bucket.alias("bucket"))
            .agg(F.count("*").cast("long").alias("n_orders"),
                 (F.sum(cents) / 100.0).alias("open_revenue")))


# ---------------------------------------------------------------------------
# X253 — MDE / power table
# ---------------------------------------------------------------------------

@query(
    "mde_table_events",
    """
    WITH st AS (
      SELECT event_type AS metric, count(*)::BIGINT AS n,
             var_samp(value) AS s2
      FROM events GROUP BY 1),
    grid AS (SELECT unnest(generate_series(1, 4))::BIGINT AS half),
    g AS (SELECT st.metric, st.s2,
                 (st.n * grid.half) // 8 AS n_per_arm
          FROM st, grid)
    SELECT metric, n_per_arm,
           floor((1.96 + 0.84) * sqrt(2 * s2 / n_per_arm)
                 * 10000 + 0.5) / 10000 AS mde_abs
    FROM g
    """,
)
def mde_table_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X253 — minimum-detectable-effect table at 80% power / 5%
    two-sided alpha (z-literals 1.96 + 0.84): for each event type's
    value metric and a grid of per-arm sizes (1/8 … 4/8 of the
    observed population), the absolute effect the experiment could
    detect — the table X107/X242 should consult BEFORE launch;
    variance from the data, arithmetic all closed-form."""
    ev = load_table(spark, sf_dir, "events")
    st = (ev.groupBy(F.col("event_type").alias("metric"))
          .agg(F.count("*").cast("long").alias("n"),
               F.var_samp("value").alias("s2")))
    grid = (spark.range(1, 5)
            .select(F.col("id").alias("half")))
    g = st.crossJoin(F.broadcast(grid)).select(
        "metric", "s2",
        F.expr("n * half div 8").alias("n_per_arm"))
    mde = (1.96 + 0.84) * F.sqrt(2 * F.col("s2")
                                 / F.col("n_per_arm"))
    return g.select("metric", "n_per_arm",
                    (F.floor(mde * 10000 + F.lit(0.5)) / 10000)
                    .alias("mde_abs"))


# ---------------------------------------------------------------------------
# X254 — backfill manifest
# ---------------------------------------------------------------------------

@query(
    "backfill_manifest_priority",
    """
    WITH d AS (SELECT DISTINCT o_orderpriority AS prio,
                      o_orderdate::DATE AS day
               FROM orders),
    b AS (SELECT prio, min(day) AS lo, max(day) AS hi
          FROM d GROUP BY 1),
    spine AS (SELECT prio,
                     unnest(generate_series(lo, hi,
                                            INTERVAL 1 day)) AS t
              FROM b),
    sp AS (SELECT prio, t::DATE AS day FROM spine)
    SELECT sp.prio, sp.day
    FROM sp LEFT JOIN d USING (prio, day)
    WHERE d.day IS NULL
    """,
)
def backfill_manifest_priority(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X254 — the backfill WORK LIST: every (priority, day) cell in
    the key's own calendar span with no data — X244 counts the
    holes, this enumerates them for the scheduler; per-key spine
    from 1-row bounds (the X37 shape), anti-join against observed
    days."""
    orders = load_table(spark, sf_dir, "orders")
    d = (orders.select(F.col("o_orderpriority").alias("prio"),
                       F.to_date("o_orderdate").alias("day"))
         .distinct())
    b = d.groupBy("prio").agg(F.min("day").alias("lo"),
                              F.max("day").alias("hi"))
    spine = b.select(
        "prio",
        F.explode(F.expr("sequence(lo, hi, interval 1 day)"))
        .alias("day"))
    return spine.join(d, ["prio", "day"], "left_anti")
