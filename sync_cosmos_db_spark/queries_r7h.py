"""Round-7 operator families (seventh batch) X195-X198:
nearest-direction as-of join, trailing-window OLS slope,
missingness-pattern audit, and rendezvous (HRW) shard routing — the
bidirectional sibling of A1's backward as-of, the local-trend sibling
of X29/X92's whole-series fits, the co-missingness view per-column
null rates hide, and the stateless minimal-reshuffle router a 100 TB
ingest tier actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table

_7D_US = 7 * 86400 * 1_000_000


# ---------------------------------------------------------------------------
# X195 — nearest-direction as-of join
# ---------------------------------------------------------------------------

@query(
    "nearest_purchase_per_click",
    """
    WITH r0 AS (
      SELECT user_id, epoch_us(ts) AS rt, max(value) AS rv
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    l AS (SELECT event_id, user_id, epoch_us(ts) AS click_us
          FROM events WHERE event_type = 'click'),
    cand AS (
      SELECT l.event_id, r0.rt, r0.rv,
             abs(l.click_us - r0.rt) AS gap,
             CASE WHEN r0.rt <= l.click_us THEN 0 ELSE 1 END AS dirn
      FROM l JOIN r0 USING (user_id)
      WHERE abs(l.click_us - r0.rt) <= 604800000000),
    pick AS (
      SELECT event_id, rt, rv, gap,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY gap, dirn, rt) AS rn
      FROM cand)
    SELECT l.event_id, l.user_id, l.click_us,
           p.rt AS matched_time, p.rv AS matched_value,
           p.gap AS gap
    FROM l LEFT JOIN pick p
      ON p.event_id = l.event_id AND p.rn = 1
    """,
)
def nearest_purchase_per_click(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X195 — for every click, the nearest purchase by the same user
    within ±7 days, either direction
    (``temporal.nearest_asof_join``): two union-sort as-of passes
    (backward + forward-on-negated-times), never a pairwise
    candidate join — the oracle IS the pairwise join, which is
    exactly what this operator avoids at scale.  Equidistant
    candidates break toward the earlier purchase."""
    from sync_cosmos_db_spark.operators.temporal import (
        nearest_asof_join,
    )

    ev = load_table(spark, sf_dir, "events")
    left = (ev.filter(F.col("event_type") == "click")
            .select("event_id", "user_id",
                    F.unix_micros("ts").alias("click_us")))
    right = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", F.unix_micros("ts").alias("rt"),
                     "value"))
    return nearest_asof_join(left, right, "user_id", "click_us",
                             "rt", "value", _7D_US)


# ---------------------------------------------------------------------------
# X196 — trailing-window OLS slope
# ---------------------------------------------------------------------------

@query(
    "rolling_ols_daily_revenue",
    """
    WITH daily AS (
      SELECT o_orderpriority AS prio, o_orderdate::DATE AS d,
             floor(sum(o_totalprice) * 100 + 0.5)::BIGINT AS y
      FROM orders GROUP BY 1, 2),
    x AS (SELECT prio, d,
                 date_diff('day', DATE '1992-01-01', d) AS xd, y
          FROM daily),
    w AS (SELECT prio, d,
                 count(*) OVER win AS n, sum(xd) OVER win AS sx,
                 sum(y) OVER win AS sy,
                 sum(xd * y) OVER win AS sxy,
                 sum(xd * xd) OVER win AS sxx
          FROM x
          WINDOW win AS (PARTITION BY prio ORDER BY xd
                         RANGE BETWEEN 27 PRECEDING
                         AND CURRENT ROW))
    SELECT prio, d, n::BIGINT AS n_days,
           CASE WHEN n * sxx - sx * sx > 0
                THEN floor((n * sxy - sx * sy)::DOUBLE
                           / (n * sxx - sx * sx) * 10000 + 0.5)
                     / 10000
           END AS slope
    FROM w
    """,
)
def rolling_ols_daily_revenue(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X196 — 28-day trailing OLS slope of daily revenue (in cents/
    day) per order priority (``temporal.rolling_ols_slope``): the
    RANGE frame on the rebased integer day index keeps the window
    calendar-correct across missing days, and integer cents keep
    the five windowed sums exact in both engines."""
    from sync_cosmos_db_spark.operators.temporal import (
        rolling_ols_slope,
    )

    orders = load_table(spark, sf_dir, "orders")
    daily = (orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("d"))
        .agg(F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
             .cast("long").alias("y")))
    return rolling_ols_slope(daily, "prio", "d", "y",
                             window_days=28)


# ---------------------------------------------------------------------------
# X197 — missingness-pattern audit
# ---------------------------------------------------------------------------

@query(
    "missingness_patterns_events",
    """
    WITH u AS (
      SELECT translate(substr(sha256(event_id::VARCHAR || ':m1'),
                              1, 3), 'abcdef', '012345')::BIGINT
               % 1000 / 1000.0 AS u1,
             translate(substr(sha256(event_id::VARCHAR || ':m2'),
                              1, 3), 'abcdef', '012345')::BIGINT
               % 1000 / 1000.0 AS u2,
             translate(substr(sha256(event_id::VARCHAR || ':m3'),
                              1, 3), 'abcdef', '012345')::BIGINT
               % 1000 / 1000.0 AS u3
      FROM events),
    m AS (
      SELECT (CASE WHEN u1 < 0.2 THEN '1' ELSE '0' END)
             || (CASE WHEN (u1 < 0.2 AND u2 < 0.5) OR u2 < 0.05
                      THEN '1' ELSE '0' END)
             || (CASE WHEN u3 < 0.1 THEN '1' ELSE '0' END)
               AS pattern
      FROM u),
    a AS (SELECT pattern, count(*)::BIGINT AS n_rows
          FROM m GROUP BY 1)
    SELECT pattern, n_rows,
           floor(n_rows::DOUBLE / sum(n_rows) OVER ()
                 * 1000000 + 0.5) / 1000000 AS share
    FROM a
    """,
)
def missingness_patterns_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X197 — missingness-pattern audit
    (``expectations.missingness_patterns``) over three event fields
    with DETERMINISTIC sha2-driven masking (the corpus is dense, so
    the mask supplies the nulls — the X184/X185 injection
    discipline): field 2's missingness is deliberately CORRELATED
    with field 1's (missing when u1<0.2 AND u2<0.5, plus a 5%
    independent floor), which is exactly the structure the pattern
    table exposes and per-column rates hide."""
    from sync_cosmos_db_spark.operators.expectations import (
        missingness_patterns,
    )

    ev = load_table(spark, sf_dir, "events")

    def u(salt):
        return (F.pmod(
            F.translate(F.substring(
                F.sha2(F.concat(F.col("event_id").cast("string"),
                                F.lit(salt)), 256), 1, 3),
                "abcdef", "012345").cast("bigint"),
            F.lit(1000)) / 1000.0)

    u1, u2, u3 = u(":m1"), u(":m2"), u(":m3")
    masked = ev.select(
        F.when(u1 < 0.2, F.lit(None)).otherwise(F.col("value"))
        .alias("f1"),
        F.when(((u1 < 0.2) & (u2 < 0.5)) | (u2 < 0.05), F.lit(None))
        .otherwise(F.col("props")).alias("f2"),
        F.when(u3 < 0.1, F.lit(None)).otherwise(F.col("user_id"))
        .alias("f3"))
    return missingness_patterns(masked, ["f1", "f2", "f3"])


# ---------------------------------------------------------------------------
# X198 — rendezvous shard routing
# ---------------------------------------------------------------------------

@query(
    "rendezvous_route_documents",
    """
    WITH g AS (SELECT unnest(generate_series(0, 8))::BIGINT AS shard),
    s AS (SELECT d.doc_id, g.shard,
                 translate(substr(sha256(d.doc_id::VARCHAR || ':'
                                         || g.shard::VARCHAR),
                                  1, 12),
                           'abcdef', '012345')::BIGINT AS sc
          FROM documents d, g),
    r1 AS (SELECT doc_id, shard,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY sc DESC, shard DESC)
                    AS rn
           FROM s WHERE shard < 8),
    r2 AS (SELECT doc_id, shard AS nxt,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY sc DESC, shard DESC)
                    AS rn
           FROM s),
    a AS (SELECT r1.doc_id, r1.shard, r2.nxt
          FROM r1 JOIN r2 USING (doc_id)
          WHERE r1.rn = 1 AND r2.rn = 1)
    SELECT shard, count(*)::BIGINT AS n_rows,
           sum(CASE WHEN nxt = 8 THEN 1 ELSE 0 END)::BIGINT
             AS n_moving,
           floor(sum(CASE WHEN nxt = 8 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) * 1000000 + 0.5) / 1000000
             AS move_share
    FROM a GROUP BY 1
    """,
)
def rendezvous_route_documents(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X198 — rendezvous-hash routing of documents onto 8 shards
    (``skew.rendezvous_route``) plus the add-a-shard reshuffle
    audit: every mover lands on the NEW shard only (~1/9 of the
    corpus), the property that makes HRW the router of choice over
    mod-N.  In-row argmax over (score, shard) structs, one
    shard-keyed aggregate, zero joins."""
    from sync_cosmos_db_spark.operators.skew import rendezvous_route

    docs = load_table(spark, sf_dir, "documents")
    return rendezvous_route(docs, "doc_id", 8)
