"""Round-6 operator families (third batch) X143-X147: CUSUM drift
detection, maximum drawdown, markdown structure profiling, mutual
information, and calibration reliability bins.

The CUSUM oracle is a DuckDB recursive CTE replaying the identical
sequential fold — the one operator family here that is inherently
order-dependent; both engines execute the same adds/maxes in the same
order over the same rounded inputs, so the states agree bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X143 — two-sided CUSUM drift detector
# ---------------------------------------------------------------------------

@query(
    "cusum_daily_revenue",
    """
    WITH RECURSIVE s AS (
      SELECT o_orderdate::DATE AS day,
             floor(sum(o_totalprice) * 10000 + 0.5)::BIGINT AS vi
      FROM orders GROUP BY 1),
    prm AS (SELECT floor(avg(vi) + 0.5)::BIGINT AS mui,
                   floor(sqrt((sum(vi::DOUBLE * vi::DOUBLE)
                               - count(*) * avg(vi) * avg(vi))
                              / (count(*) - 1)) * 0.5 + 0.5)::BIGINT
                     AS ki,
                   floor(sqrt((sum(vi::DOUBLE * vi::DOUBLE)
                               - count(*) * avg(vi) * avg(vi))
                              / (count(*) - 1)) * 4.0 + 0.5)::BIGINT
                     AS hi
            FROM s),
    i AS (SELECT row_number() OVER (ORDER BY day) AS i, day, vi
          FROM s),
    c AS (
      SELECT i.i, i.day, i.vi,
             greatest(0, i.vi - prm.mui - prm.ki)::BIGINT AS sp,
             greatest(0, prm.mui - i.vi - prm.ki)::BIGINT AS sn
      FROM i, prm WHERE i.i = 1
      UNION ALL
      SELECT i.i, i.day, i.vi,
             greatest(0, c.sp + i.vi - prm.mui - prm.ki)::BIGINT,
             greatest(0, c.sn + prm.mui - i.vi - prm.ki)::BIGINT
      FROM c JOIN i ON i.i = c.i + 1 CROSS JOIN prm)
    SELECT day, vi / 10000.0 AS v,
           sp / 10000.0 AS s_pos, sn / 10000.0 AS s_neg,
           sp > (SELECT hi FROM prm) AS alarm_pos,
           sn > (SELECT hi FROM prm) AS alarm_neg
    FROM c
    """,
)
def cusum_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X143 — two-sided CUSUM (``profiling.cusum``) over daily order
    revenue: the sequential drift detector that accumulates small
    deviations a mean-shift scan (X121) misses.  The Spark side runs
    the distributed prefix-scan closed form (cumsum + running min,
    ONE ordered window); the oracle replays the literal sequential
    recursion as a recursive CTE.  Both compute in INTEGER 10⁻⁴
    units, so the two mechanisms are provably bit-equal — the
    strongest cross-engine evidence shape in the registry: different
    algorithm, same exact arithmetic."""
    from sync_cosmos_db_spark.operators.profiling import cusum

    orders = load_table(spark, sf_dir, "orders")
    series = (orders
              .groupBy(F.to_date(F.col("o_orderdate")).alias("day"))
              .agg(F.sum("o_totalprice").alias("rev")))
    return cusum(series, "day", "rev", k_mult=0.5, h_mult=4.0)


# ---------------------------------------------------------------------------
# X144 — maximum drawdown of excess revenue
# ---------------------------------------------------------------------------

@query(
    "max_drawdown_priority_revenue",
    """
    WITH s AS (
      SELECT o_orderpriority AS g, o_orderdate::DATE AS day,
             floor(sum(o_totalprice) * 10000 + 0.5) / 10000 AS rev
      FROM orders GROUP BY 1, 2),
    m AS (SELECT g, floor(avg(rev) * 10000 + 0.5) / 10000 AS mrev
          FROM s GROUP BY 1),
    x AS (SELECT s.g, s.day, s.rev - m.mrev AS v
          FROM s JOIN m USING (g)),
    c AS (SELECT g, day, v,
                 sum(v) OVER (PARTITION BY g ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
          FROM x),
    d AS (SELECT g, day, v, cum,
                 max(cum) OVER (PARTITION BY g ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - cum AS dd
          FROM c),
    e AS (SELECT *, max(dd) OVER (PARTITION BY g) AS mdd FROM d)
    SELECT g AS o_orderpriority, count(*)::BIGINT AS n_periods,
           floor(sum(v) * 10000 + 0.5) / 10000 AS final_value,
           floor(max(mdd) * 10000 + 0.5) / 10000 AS max_drawdown,
           min(CASE WHEN dd = mdd THEN day END) AS trough_day
    FROM e GROUP BY 1
    """,
)
def max_drawdown_priority_revenue(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """X144 — maximum drawdown (``temporal.max_drawdown``) of daily
    excess revenue (revenue minus the priority's own run-rate) per
    order priority: the deepest cumulative shortfall and the day it
    bottomed — the resilience readout for a revenue stream.  ONE
    group-keyed sort carries the cumulative sum, its running max,
    and the whole-group max; values rounded before the cumulative
    pass on both engines."""
    from sync_cosmos_db_spark.operators.temporal import max_drawdown

    orders = load_table(spark, sf_dir, "orders")
    p = 10 ** 4
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    s = (orders
         .groupBy(F.col("o_orderpriority").alias("g"),
                  F.to_date(F.col("o_orderdate")).alias("day"))
         .agg(fr(F.sum("o_totalprice")).alias("rev")))
    m = s.groupBy("g").agg(fr(F.avg("rev")).alias("mrev"))
    x = (s.join(F.broadcast(m), "g")
         .select(F.col("g").alias("o_orderpriority"), F.col("day"),
                 (F.col("rev") - F.col("mrev")).alias("v")))
    return max_drawdown(x, "o_orderpriority", "day", "v")


# ---------------------------------------------------------------------------
# X145 — markdown structure profile
# ---------------------------------------------------------------------------

@query(
    "markdown_profile_documents",
    """
    WITH fix AS (
      SELECT source, doc_id,
             text
               || CASE WHEN doc_id % 3 = 0
                       THEN chr(10) || '# Title' || chr(10) || '## Sub'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 0
                       THEN chr(10) || '- a' || chr(10) || '- b'
                            || chr(10) || '* c'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN chr(10) || '| x | y |'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN chr(10) || '```' || chr(10) || 'code'
                            || chr(10) || '```'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN chr(10) || '```'
                       ELSE '' END AS txt
      FROM documents),
    d AS (
      SELECT source,
             len(list_filter(string_split(txt, chr(10)),
                             x -> starts_with(x, '#'))) AS nh,
             len(list_filter(string_split(txt, chr(10)),
                             x -> starts_with(x, '- ')
                                  OR starts_with(x, '* '))) AS nl,
             len(list_filter(string_split(txt, chr(10)),
                             x -> starts_with(x, '|'))) AS nt,
             len(list_filter(string_split(txt, chr(10)),
                             x -> starts_with(x, '```'))) AS nf
      FROM fix)
    SELECT source, count(*)::BIGINT AS n_docs,
           floor(avg(CASE WHEN nh > 0 THEN 1.0 ELSE 0.0 END) * 10000
                 + 0.5) / 10000 AS frac_with_header,
           floor(avg(CASE WHEN nl > 0 THEN 1.0 ELSE 0.0 END) * 10000
                 + 0.5) / 10000 AS frac_with_list,
           floor(avg(CASE WHEN nt > 0 THEN 1.0 ELSE 0.0 END) * 10000
                 + 0.5) / 10000 AS frac_with_table,
           floor(avg(CASE WHEN nf > 0 THEN 1.0 ELSE 0.0 END) * 10000
                 + 0.5) / 10000 AS frac_with_code,
           floor(avg(nh) * 10000 + 0.5) / 10000 AS avg_header_lines,
           floor(avg(nl) * 10000 + 0.5) / 10000 AS avg_list_lines,
           sum(CASE WHEN nf % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT
             AS unbalanced_fence_docs
    FROM d GROUP BY 1
    """,
)
def markdown_profile_documents(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X145 — markdown structure profile per source
    (``text.markdown_structure_profile``): headers / lists / tables /
    fenced code and unbalanced fences — the curation signal that
    separates prose from structured docs (code-heavy sources train
    differently; unbalanced fences flag truncation victims).  The
    harness corpus is plain prose, so structures are injected
    deterministically in-query (doc_id mod k), same discipline as
    the X123 PII injection.  Pure in-row array ops, zero shuffle
    before the per-source reduce."""
    from sync_cosmos_db_spark.operators.text import (
        markdown_structure_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("\n# Title\n## Sub")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\n- a\n- b\n* c")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("\n| x | y |")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit("\n```\ncode\n```")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.lit("\n```")).otherwise(F.lit("")))
    fixed = docs.select("source", txt.alias("txt"))
    return markdown_structure_profile(fixed, "source", "txt")


# ---------------------------------------------------------------------------
# X146 — mutual information between categoricals
# ---------------------------------------------------------------------------

@query(
    "mutual_info_priority_status",
    """
    WITH ab AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                       count(*)::DOUBLE AS cab
                FROM orders GROUP BY 1, 2),
    ma AS (SELECT a, sum(cab) AS ca FROM ab GROUP BY 1),
    mb AS (SELECT b, sum(cab) AS cb FROM ab GROUP BY 1),
    tot AS (SELECT sum(cab) AS n FROM ab)
    SELECT max(n)::BIGINT AS n,
           floor(-sum((cab / n) * ln(ca / n)) * 1000000 + 0.5)
             / 1000000 AS h_a,
           floor(-sum((cab / n) * ln(cb / n)) * 1000000 + 0.5)
             / 1000000 AS h_b,
           floor(-sum((cab / n) * ln(cab / n)) * 1000000 + 0.5)
             / 1000000 AS h_ab,
           floor(sum((cab / n) * ln(cab * n / (ca * cb))) * 1000000
                 + 0.5) / 1000000 AS mi
    FROM ab JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
    """,
)
def mutual_info_priority_status(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X146 — mutual information (``profiling.mutual_information``)
    between order priority and status, with marginal and joint
    entropies: the dependence measure that catches what χ² (X73)
    only hypothesis-tests and categorical correlation cannot
    express.  ONE (a, b)-keyed count; marginals derive from the same
    partials; 1-row total broadcast."""
    from sync_cosmos_db_spark.operators.profiling import (
        mutual_information,
    )

    orders = load_table(spark, sf_dir, "orders")
    return mutual_information(orders, "o_orderpriority",
                              "o_orderstatus")


# ---------------------------------------------------------------------------
# X147 — calibration reliability bins
# ---------------------------------------------------------------------------

@query(
    "calibration_bins_events",
    """
    WITH sc AS (
      SELECT translate(substr(sha256(event_id::VARCHAR || ':cal'),
                              1, 6), 'abcdef', '012345')::BIGINT
               % 1000 / 1000.0 AS score,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END
               AS y
      FROM events)
    SELECT least(floor(score * 10), 9)::BIGINT AS bin,
           count(*)::BIGINT AS n,
           floor(avg(score) * 1000000 + 0.5) / 1000000 AS avg_score,
           floor(avg(y) * 1000000 + 0.5) / 1000000 AS pos_rate,
           floor(abs(avg(score) - avg(y)) * 1000000 + 0.5) / 1000000
             AS gap
    FROM sc GROUP BY 1
    """,
)
def calibration_bins_events(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X147 — calibration reliability bins: decile-binned predicted
    score vs realized positive rate — the reliability-diagram table
    behind ECE, the standard eval for any probabilistic classifier
    the pipeline trains.  The score is a deterministic sha2 uniform
    (the harness has no model; the MATH is what's verified), the
    outcome is real (event_type = purchase).  One scan, ten-row
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    score = (F.pmod(
        F.translate(F.substring(
            F.sha2(F.concat(F.col("event_id").cast("string"),
                            F.lit(":cal")), 256), 1, 6),
            "abcdef", "012345").cast("bigint"), F.lit(1000)) / 1000.0)
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    p = 10 ** 6
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    return (ev.select(score.alias("score"), y.alias("y"))
            .groupBy(F.least(F.floor(F.col("score") * 10), F.lit(9))
                     .cast("long").alias("bin"))
            .agg(F.count("*").cast("long").alias("n"),
                 fr(F.avg("score")).alias("avg_score"),
                 fr(F.avg("y")).alias("pos_rate"),
                 fr(F.abs(F.avg("score") - F.avg("y"))).alias("gap")))
