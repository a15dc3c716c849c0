"""Round-7 operator families (nineteenth batch) X243-X246:
varint posting-list size estimator, calendar completeness audit,
cumulative gains/lift table, and effective-dated reference
conversion — pricing the X221 index before building it, the
missing-days completeness view X161's profile doesn't cover, the
decile capture chart beside X189's threshold sweep, and the
effective-dated lookup every currency/price-list join needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X243 — varint posting-list estimator
# ---------------------------------------------------------------------------

@query(
    "varint_posting_estimate_docs",
    """
    WITH post AS (
      SELECT DISTINCT tok, doc_id
      FROM (SELECT doc_id,
                   unnest(string_split_regex(text, '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''),
    gaps AS (
      SELECT tok,
             coalesce(doc_id - lag(doc_id) OVER (PARTITION BY tok
                                                 ORDER BY doc_id),
                      doc_id) AS gap
      FROM post),
    bytes AS (
      SELECT tok, count(*)::BIGINT AS n_post,
             sum(CASE WHEN gap < 128 THEN 1
                      WHEN gap < 16384 THEN 2
                      WHEN gap < 2097152 THEN 3
                      ELSE 4 END)::BIGINT AS vb
      FROM gaps GROUP BY 1),
    banded AS (
      SELECT CASE WHEN n_post = 1 THEN 'hapax'
                  WHEN n_post <= 10 THEN 'rare'
                  WHEN n_post <= 100 THEN 'mid'
                  ELSE 'common' END AS band,
             n_post, vb
      FROM bytes)
    SELECT band, count(*)::BIGINT AS n_tokens,
           sum(n_post)::BIGINT AS n_postings,
           sum(vb)::BIGINT AS varint_bytes,
           (sum(n_post) * 8)::BIGINT AS raw_bytes,
           floor(sum(vb)::DOUBLE / (sum(n_post) * 8)
                 * 10000 + 0.5) / 10000 AS size_ratio
    FROM banded GROUP BY 1
    """,
)
def varint_posting_estimate_docs(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X243 — delta+varint size estimate of the doc-id posting lists
    by token-frequency band: sorted-gap deltas cost 1–4 bytes by
    magnitude vs 8 bytes raw — the compression math that prices the
    X221 trigram/posting index before anyone materializes it, all
    integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    post = (docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("tok", "doc_id").distinct())
    w = W.partitionBy("tok").orderBy("doc_id")
    gap = F.coalesce(F.col("doc_id") - F.lag("doc_id").over(w),
                     F.col("doc_id"))
    vb = (F.when(gap < 128, 1).when(gap < 16384, 2)
          .when(gap < 2097152, 3).otherwise(4))
    by_tok = (post.withColumn("__vb", vb)
              .groupBy("tok")
              .agg(F.count("*").cast("long").alias("n_post"),
                   F.sum("__vb").cast("long").alias("vb")))
    band = (F.when(F.col("n_post") == 1, "hapax")
            .when(F.col("n_post") <= 10, "rare")
            .when(F.col("n_post") <= 100, "mid").otherwise("common"))
    return (by_tok.groupBy(band.alias("band"))
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum("n_post").cast("long").alias("n_postings"),
                 F.sum("vb").cast("long").alias("varint_bytes"),
                 (F.sum("n_post") * 8).cast("long").alias("raw_bytes"),
                 (F.floor(F.sum("vb") / (F.sum("n_post") * 8)
                          * 10000 + F.lit(0.5)) / 10000)
                 .alias("size_ratio")))


# ---------------------------------------------------------------------------
# X244 — calendar completeness audit
# ---------------------------------------------------------------------------

@query(
    "calendar_completeness_priority",
    """
    WITH d AS (SELECT DISTINCT o_orderpriority AS prio,
                      o_orderdate::DATE AS day
               FROM orders)
    SELECT prio,
           (date_diff('day', min(day), max(day)) + 1)::BIGINT
             AS span_days,
           count(*)::BIGINT AS present_days,
           (date_diff('day', min(day), max(day)) + 1
            - count(*))::BIGINT AS missing_days,
           floor(count(*)::DOUBLE
                 / (date_diff('day', min(day), max(day)) + 1)
                 * 10000 + 0.5) / 10000 AS completeness
    FROM d GROUP BY 1
    """,
)
def calendar_completeness_priority(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """X244 — calendar completeness per priority: distinct observed
    days vs the key's own [min, max] span — the missing-days view
    that says WHICH keys need the X37/X190 gap-fill before a
    time-series op runs on them; one distinct + one reduce."""
    orders = load_table(spark, sf_dir, "orders")
    d = (orders.select(F.col("o_orderpriority").alias("prio"),
                       F.to_date("o_orderdate").alias("day"))
         .distinct())
    span = F.datediff(F.max("day"), F.min("day")) + 1
    return (d.groupBy("prio")
            .agg(span.cast("long").alias("span_days"),
                 F.count("*").cast("long").alias("present_days"),
                 (span - F.count("*")).cast("long")
                 .alias("missing_days"),
                 (F.floor(F.count("*") / span * 10000 + F.lit(0.5))
                  / 10000).alias("completeness")))


# ---------------------------------------------------------------------------
# X245 — cumulative gains / lift table
# ---------------------------------------------------------------------------

@query(
    "gains_table_orders",
    """
    WITH idx AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
             row_number() OVER (ORDER BY o_totalprice DESC,
                                o_orderkey) AS gi,
             count(*) OVER () AS n
      FROM orders),
    b AS (SELECT (gi - 1) * 10 // n AS decile, y FROM idx),
    per AS (SELECT decile, count(*)::BIGINT AS n_rows,
                   sum(y)::BIGINT AS n_pos
            FROM b GROUP BY 1),
    tot AS (SELECT sum(n_pos)::DOUBLE AS tp,
                   sum(n_rows)::DOUBLE AS tn
            FROM per)
    SELECT decile, n_rows, n_pos,
           floor(n_pos::DOUBLE / n_rows * 10000 + 0.5) / 10000
             AS response_rate,
           floor(sum(n_pos) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) / tp * 10000 + 0.5) / 10000
             AS cum_capture,
           floor((n_pos::DOUBLE / n_rows) / (tp / tn)
                 * 10000 + 0.5) / 10000 AS lift
    FROM per, tot
    """,
)
def gains_table_orders(spark: SparkSession,
                       sf_dir: str) -> DataFrame:
    """X245 — cumulative gains/lift table: orders ranked by price
    (the 'model score'), cut into exact deciles via the X199
    two-phase rank, per-decile response rate / cumulative capture
    of finalized orders / lift vs base — the campaign-targeting
    chart feed beside X189's threshold confusion sweep (capture at
    a CONTACT BUDGET, not a score cut)."""
    from sync_cosmos_db_spark.operators.curation import (
        global_sort_index,
    )

    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    idx = global_sort_index(
        orders.select((-F.col("o_totalprice")).alias("negp"),
                      F.col("o_orderkey").alias("tb"),
                      (F.col("o_orderstatus") == "F").cast("long")
                      .alias("y")),
        "negp", "tb", out_col="__gi")
    per = (idx.withColumn("decile",
                          F.expr(f"(__gi - 1) * 10 div {int(n)}"))
           .groupBy("decile")
           .agg(F.count("*").cast("long").alias("n_rows"),
                F.sum("y").cast("long").alias("n_pos")))
    full = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    run = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    tp = F.sum("n_pos").over(full).cast("double")
    tn = F.sum("n_rows").over(full).cast("double")
    fr = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return per.select(
        "decile", "n_rows", "n_pos",
        fr(F.col("n_pos") / F.col("n_rows")).alias("response_rate"),
        fr(F.sum("n_pos").over(run) / tp).alias("cum_capture"),
        fr((F.col("n_pos") / F.col("n_rows")) / (tp / tn))
        .alias("lift"))


# ---------------------------------------------------------------------------
# X246 — effective-dated reference conversion
# ---------------------------------------------------------------------------

@query(
    "effective_rate_revenue",
    """
    WITH rates AS (
      SELECT DATE '1995-01-01' AS eff, 1.0::DOUBLE AS rate
      UNION ALL SELECT DATE '1996-07-01', 1.1::DOUBLE
      UNION ALL SELECT DATE '1998-01-01', 0.9::DOUBLE
      UNION ALL SELECT DATE '2000-01-01', 1.25::DOUBLE),
    m AS (
      SELECT o.o_orderpriority AS prio, o.o_totalprice, r.eff,
             r.rate,
             row_number() OVER (PARTITION BY o.o_orderkey
                                ORDER BY r.eff DESC) AS rn
      FROM orders o JOIN rates r ON r.eff <= o.o_orderdate::DATE)
    SELECT prio, eff AS rate_from, rate,
           count(*)::BIGINT AS n_orders,
           floor(sum(o_totalprice * rate) * 100 + 0.5) / 100
             AS converted_revenue
    FROM m WHERE rn = 1 GROUP BY 1, 2, 3
    """,
)
def effective_rate_revenue(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X246 — effective-dated reference conversion: order totals
    converted by the rate whose effective-from is the LATEST at or
    before the order date, then revenue per (priority, rate
    period).  The 4-row rate table is INTERVALIZED (each row carries
    its successor's effective-from) and broadcast into a range join
    — for tiny reference data that beats an as-of sort (a constant
    join key would single-partition the fact side); a large rate
    table would use ``temporal.asof_join`` keyed by currency
    instead (stated).  The oracle's per-order row_number pick is
    the quadratic form both shapes avoid."""
    import datetime as dt

    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.col("o_orderpriority").alias("prio"),
        F.datediff(F.to_date("o_orderdate"),
                   F.to_date(F.lit("1970-01-01"))).alias("od"))
    epoch = dt.date(1970, 1, 1)
    raw = [("1995-01-01", 1.0), ("1996-07-01", 1.1),
           ("1998-01-01", 0.9), ("2000-01-01", 1.25)]
    rows = []
    for i, (eff, rate) in enumerate(raw):
        lo = (dt.date.fromisoformat(eff) - epoch).days
        hi = ((dt.date.fromisoformat(raw[i + 1][0]) - epoch).days
              if i + 1 < len(raw) else 10 ** 9)
        rows.append((lo, hi, eff, rate))
    rates = spark.createDataFrame(
        rows, "rd int, rd_next int, eff string, rate double")
    j = orders.join(F.broadcast(rates),
                    (F.col("od") >= F.col("rd"))
                    & (F.col("od") < F.col("rd_next")))
    return (j.groupBy("prio",
                      F.to_date("eff").alias("rate_from"), "rate")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 (F.floor(F.sum(F.col("o_totalprice")
                                * F.col("rate")) * 100 + F.lit(0.5))
                  / 100).alias("converted_revenue")))
