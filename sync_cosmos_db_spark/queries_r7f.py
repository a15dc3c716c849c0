"""Round-7 operator families (fifth batch) X187-X190: cohort
retention triangle, per-group Spearman rank correlation, precision/
recall threshold sweep, and linear-interpolation gap-fill — the
product-analytics retention matrix, the robust rank-domain sibling of
X29's Pearson correlation, the operating-curve table that makes
X179/X183's single-number metrics deployable, and the
continuous-measure sibling of X37's LOCF fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import fround, query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X187 — cohort retention triangle
# ---------------------------------------------------------------------------

@query(
    "cohort_retention_events",
    """
    WITH f AS (
      SELECT user_id, date_trunc('month', min(ts)) AS cm
      FROM events GROUP BY 1),
    a AS (
      SELECT DISTINCT e.user_id, f.cm,
             date_diff('month', f.cm, date_trunc('month', e.ts)) AS off
      FROM events e JOIN f USING (user_id)),
    t AS (SELECT cm, off, count(*)::BIGINT AS n_active
          FROM a GROUP BY 1, 2),
    s AS (SELECT cm, off, n_active,
                 max(CASE WHEN off = 0 THEN n_active END)
                   OVER (PARTITION BY cm) AS cohort_size
          FROM t)
    SELECT cm::DATE AS cohort_month, off AS month_offset, n_active,
           cohort_size,
           floor(n_active::DOUBLE / cohort_size * 10000 + 0.5) / 10000
             AS retention
    FROM s
    """,
)
def cohort_retention_events(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X187 — cohort retention triangle
    (``behavioral.cohort_retention_monthly``): users cohorted by first-event
    month, per-(cohort, month-offset) distinct-active counts and
    retention share — one user-keyed aggregate, one user-keyed join +
    distinct on the same partitioning, then a window over the tiny
    months×months triangle."""
    from sync_cosmos_db_spark.operators.behavioral import (
        cohort_retention_monthly,
    )

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention_monthly(ev, "user_id", "ts")


# ---------------------------------------------------------------------------
# X188 — Spearman rank correlation
# ---------------------------------------------------------------------------

@query(
    "spearman_lineitem_price_discount",
    """
    WITH r AS (
      SELECT l_returnflag AS g,
             rank() OVER (PARTITION BY l_returnflag
                          ORDER BY l_extendedprice)
               + (count(*) OVER (PARTITION BY l_returnflag,
                                 l_extendedprice) - 1) / 2.0 AS rx,
             rank() OVER (PARTITION BY l_returnflag
                          ORDER BY l_discount)
               + (count(*) OVER (PARTITION BY l_returnflag,
                                 l_discount) - 1) / 2.0 AS ry
      FROM lineitem),
    a AS (SELECT g, count(*)::DOUBLE AS n,
                 sum(rx) AS sx, sum(ry) AS sy,
                 sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
                 sum(rx * ry) AS sxy
          FROM r GROUP BY 1)
    SELECT g, n::BIGINT AS n,
           CASE WHEN sqrt((n * sxx - sx * sx)
                          * (n * syy - sy * sy)) > 0
                THEN floor((n * sxy - sx * sy)
                           / sqrt((n * sxx - sx * sx)
                                  * (n * syy - sy * sy))
                           * 10000 + 0.5) / 10000
           END AS rho
    FROM a
    """,
)
def spearman_lineitem_price_discount(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """X188 — per-returnflag Spearman correlation of extended price
    vs discount (``profiling.spearman_corr``): midrank tie handling
    (discount has only 11 distinct values — the tie math IS the
    test), Pearson closed form on the ranks.  Midranks are integers
    or halves, so the sufficient statistics are exact in doubles at
    sweep scale and both engines agree bit-for-bit."""
    from sync_cosmos_db_spark.operators.profiling import spearman_corr

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(
        li.select(F.col("l_returnflag").alias("g"),
                  "l_extendedprice", "l_discount"),
        "g", "l_extendedprice", "l_discount")


# ---------------------------------------------------------------------------
# X189 — precision/recall threshold sweep
# ---------------------------------------------------------------------------

@query(
    "pr_threshold_sweep_events",
    """
    WITH sc AS (
      SELECT (translate(substr(sha256(event_id::VARCHAR || ':pr'),
                               1, 6), 'abcdef', '012345')::BIGINT
                % 1000 / 1000.0
              + CASE WHEN event_type = 'purchase'
                     THEN 1.0 ELSE 0.0 END) / 2 AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    b AS (SELECT floor(s * 100)::BIGINT AS b,
                 sum(y)::BIGINT AS npos,
                 sum(1 - y)::BIGINT AS nneg
          FROM sc GROUP BY 1),
    g AS (SELECT unnest(generate_series(5, 95, 5))::BIGINT
            AS threshold_pct),
    a AS (SELECT threshold_pct,
                 sum(CASE WHEN b.b >= threshold_pct
                          THEN npos ELSE 0 END)::BIGINT AS tp,
                 sum(CASE WHEN b.b >= threshold_pct
                          THEN nneg ELSE 0 END)::BIGINT AS fp,
                 sum(CASE WHEN b.b < threshold_pct
                          THEN npos ELSE 0 END)::BIGINT AS fn
          FROM b, g GROUP BY 1)
    SELECT threshold_pct, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN floor(tp::DOUBLE / (tp + fp) * 1000000 + 0.5)
                     / 1000000 END AS "precision",
           CASE WHEN tp + fn > 0
                THEN floor(tp::DOUBLE / (tp + fn) * 1000000 + 0.5)
                     / 1000000 END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN floor(2.0 * tp / (2 * tp + fp + fn)
                           * 1000000 + 0.5) / 1000000 END AS f1
    FROM a
    """,
)
def pr_threshold_sweep_events(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X189 — precision/recall/F1 threshold sweep
    (``profiling.pr_threshold_sweep``) on a deterministic
    sha2-uniform score MIXED with the purchase outcome
    (``s = (u + y) / 2`` — positives live in [0.5, 1), negatives in
    [0, 0.5), so the sweep actually sweeps through both separable and
    overlapping regimes across the grid).  One fact-table scan into a
    ≤101-row bin table; the 19-threshold grid joins it on a derived
    constant key (BroadcastHashJoin)."""
    from sync_cosmos_db_spark.operators.profiling import (
        pr_threshold_sweep,
    )

    ev = load_table(spark, sf_dir, "events")
    u = (F.pmod(
        F.translate(F.substring(
            F.sha2(F.concat(F.col("event_id").cast("string"),
                            F.lit(":pr")), 256), 1, 6),
            "abcdef", "012345").cast("bigint"), F.lit(1000)) / 1000.0)
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    d = ev.select(((u + y) / 2).alias("s"), y.cast("int").alias("y"))
    return pr_threshold_sweep(d, "s", "y")


# ---------------------------------------------------------------------------
# X190 — linear-interpolation gap-fill
# ---------------------------------------------------------------------------

@query(
    "interp_daily_order_revenue",
    """
    WITH daily AS (
      SELECT o_orderpriority AS prio, o_orderdate::DATE AS d,
             floor(sum(o_totalprice) * 100 + 0.5) / 100 AS rev
      FROM orders WHERE o_orderkey % 50 = 0 GROUP BY prio, d),
    bounds AS (SELECT prio, min(d) AS lo, max(d) AS hi
               FROM daily GROUP BY prio),
    spine AS (SELECT prio,
                     unnest(generate_series(lo, hi, INTERVAL 1 day))
                       AS ts
              FROM bounds),
    sp AS (SELECT prio, ts::DATE AS d FROM spine),
    f AS (
      SELECT sp.prio, sp.d, daily.rev,
             last_value(daily.rev IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN daily.rev IS NOT NULL
                             THEN sp.d END IGNORE NULLS)
               OVER wb AS pt,
             first_value(daily.rev IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN daily.rev IS NOT NULL
                              THEN sp.d END IGNORE NULLS)
               OVER wf AS nt
      FROM sp LEFT JOIN daily USING (prio, d)
      WINDOW wb AS (PARTITION BY sp.prio ORDER BY sp.d
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW),
             wf AS (PARTITION BY sp.prio ORDER BY sp.d
                    ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING))
    SELECT prio, d, rev,
           floor((CASE WHEN rev IS NOT NULL THEN rev
                       ELSE pv + (nv - pv)
                            * (date_diff('day', pt, d)
                               / date_diff('day', pt, nt)) END)
                 * 10000 + 0.5) / 10000 AS rev_interp
    FROM f
    """,
)
def interp_daily_order_revenue(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X190 — daily revenue of the same sparse 1-in-50 order subset
    as X37, gap-filled with LINEAR interpolation
    (``temporal.gap_fill_interpolate``) instead of LOCF: gap rows get
    ``pv + (nv − pv) · Δdays/span`` between the bracketing observed
    days.  Observed values are rounded BEFORE the fill (the X37
    discipline) and the interpolation weight is a ratio of integer
    day counts, so both engines evaluate the identical IEEE
    expression tree."""
    from sync_cosmos_db_spark.operators.temporal import (
        gap_fill_interpolate,
    )

    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.where(F.col("o_orderkey") % 50 == 0)
             .groupBy(F.col("o_orderpriority").alias("prio"),
                      F.to_date("o_orderdate").alias("d"))
             .agg(fround(F.sum("o_totalprice"), 2).alias("rev")))
    return gap_fill_interpolate(daily, ["prio"], "d", "rev").select(
        "prio", "d", "rev", F.col("rev_interp"))
