"""Round-5 extension operators, third batch (X97–X100): trailing
windowed percentiles, per-dimension embedding health, join-cardinality
forecasting, and Flesch readability profiling.

No reference counterpart (SURVEY.md §2.3); same contract as every
query module: Spark-first plans, DuckDB-recomputable oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X97 — trailing-window percentile (p95 latency board metric)
# ---------------------------------------------------------------------------

@query(
    "trailing_p95_hourly_value",
    """
    WITH hv AS (SELECT date_trunc('hour', ts) AS h, value FROM events),
    hours AS (SELECT DISTINCT h FROM hv),
    r AS (SELECT hours.h AS hour, hv.value
          FROM hours JOIN hv ON hv.h <= hours.h
                            AND hv.h > hours.h - INTERVAL 6 HOUR)
    SELECT strftime(hour, '%Y-%m-%d %H:00') AS hour,
           count(*)::BIGINT AS n_events,
           floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000 AS p95
    FROM r GROUP BY hour
    """,
)
def trailing_p95_hourly_value(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X97 — trailing-6-hour p95 of event value per hour: the rolling
    tail-latency board metric.  A percentile cannot ride a window
    frame (not frame-mergeable), and the hours×events range join the
    oracle runs is quadratic — the Spark plan instead explodes each
    hour-bucketed value onto the ≤6 future hours it influences (a
    BOUNDED ×6 in-row expansion, the ``ewma_calendar`` shape) and
    runs one hour-keyed exact percentile; at 100 TB the same plan
    takes ``percentile_approx`` (sketch-mergeable partials)."""
    ev = load_table(spark, sf_dir, "events")
    hv = ev.select(F.date_trunc("hour", "ts").alias("h"), "value")
    present = hv.select("h").distinct()
    influenced = hv.select(
        "value",
        F.explode(F.sequence(
            F.col("h"), F.col("h") + F.expr("INTERVAL 5 HOURS"),
            F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    p = 10 ** 4
    return (influenced
            .join(present.select(F.col("h").alias("hour")), "hour", "semi")
            .groupBy("hour")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 (F.floor(F.expr("percentile(value, 0.95)") * p
                          + F.lit(0.5)) / p).alias("p95"))
            .select(F.date_format("hour", "yyyy-MM-dd HH:00")
                    .alias("hour"), "n_events", "p95"))


# ---------------------------------------------------------------------------
# X98 — per-dimension embedding health (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "embedding_dim_health",
    """
    WITH dv AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings),
    st AS (SELECT dim, count(*)::BIGINT AS n, sum(v) AS s,
                  sum(v * v) AS ss
           FROM dv GROUP BY 1),
    m AS (SELECT dim, n,
                 floor(s / n * 1000000 + 0.5) / 1000000 AS mean,
                 floor(sqrt(ss / n - (s / n) * (s / n)) * 1000000 + 0.5)
                   / 1000000 AS std
          FROM st)
    SELECT m.dim, m.n, m.mean, m.std,
           sum(CASE WHEN abs(dv.v - m.mean) > 3.0 * m.std
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
    FROM dv JOIN m USING (dim)
    GROUP BY m.dim, m.n, m.mean, m.std
    """,
)
def embedding_dim_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X98 — per-dimension embedding audit
    (``profiling.embedding_dim_stats``): mean, population std, and
    >3σ outlier count for each of the 64 coordinates — catches dead
    dims (std ≈ 0), saturated dims, and scale drift between encoder
    versions before they poison cosine rankings or IVF training.
    One posexplode → dim-keyed sums → broadcast-back outlier count;
    rounding before the σ comparison keeps the classification
    engine-reproducible."""
    from sync_cosmos_db_spark.operators.profiling import (
        embedding_dim_stats,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb, "embedding")


# ---------------------------------------------------------------------------
# X99 — join-cardinality forecast (shuffle sizing pre-flight)
# ---------------------------------------------------------------------------

@query(
    "join_cardinality_forecast",
    """
    WITH co AS (SELECT o_orderkey AS k, count(*)::BIGINT AS c
                FROM orders GROUP BY 1),
    cl AS (SELECT l_orderkey AS k, count(*)::BIGINT AS c
           FROM lineitem GROUP BY 1),
    j AS (SELECT co.c * cl.c AS contrib
          FROM co JOIN cl USING (k))
    SELECT count(*)::BIGINT AS n_keys_both,
           sum(contrib)::BIGINT AS predicted_rows,
           max(contrib)::BIGINT AS max_key_contribution,
           (SELECT count(*) FROM orders o JOIN lineitem l
             ON l.l_orderkey = o.o_orderkey)::BIGINT AS actual_rows
    FROM j
    """,
)
def join_cardinality_forecast(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X99 — forecast a join's output size BEFORE paying for it:
    Σ_k c_a(k)·c_b(k) over the two per-key count tables predicts the
    inner equi-join cardinality exactly, and max_k c_a·c_b is the
    straggler-partition indicator — the pre-flight that decides
    whether the full join is affordable and whether it needs salting
    (X87's sibling for two-table shuffles).  The two count aggregates
    cost one map-side-combined pass each (key-count rows only); the
    query also runs the actual join here so the oracle PROVES the
    forecast exact — at 100 TB you run only the cheap side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    co = (o.groupBy(F.col("o_orderkey").alias("k"))
          .agg(F.count(F.lit(1)).cast("long").alias("ca")))
    cl = (li.groupBy(F.col("l_orderkey").alias("k"))
          .agg(F.count(F.lit(1)).cast("long").alias("cb")))
    j = co.join(cl, "k").withColumn("contrib", F.col("ca") * F.col("cb"))
    actual = (o.join(li, o.o_orderkey == li.l_orderkey)
              .agg(F.count(F.lit(1)).cast("long").alias("actual_rows")))
    return (j.agg(F.count(F.lit(1)).cast("long").alias("n_keys_both"),
                  F.sum("contrib").cast("long").alias("predicted_rows"),
                  F.max("contrib").cast("long")
                  .alias("max_key_contribution"))
            .crossJoin(F.broadcast(actual)))


# ---------------------------------------------------------------------------
# X100 — Flesch readability profile (operators/text.py)
# ---------------------------------------------------------------------------

@query(
    "flesch_by_source",
    """
    WITH d AS (
      SELECT source,
             206.835
             - 1.015 * (len(string_split_regex(text, '\\s+'))::DOUBLE
                 / greatest(1, len(string_split_regex(text, '[.!?]+'))
                            - 1))
             - 84.6 * ((len(string_split(
                   regexp_replace(lower(text), '[aeiouy]+', '#', 'g'),
                   '#')) - 1)::DOUBLE
                 / len(string_split_regex(text, '\\s+'))) AS fre
      FROM documents)
    SELECT source, count(*)::BIGINT AS n_docs,
           floor(avg(fre) * 10000 + 0.5) / 10000 AS avg_flesch,
           floor(min(fre) * 10000 + 0.5) / 10000 AS min_flesch
    FROM d GROUP BY source
    """,
)
def flesch_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X100 — Flesch reading-ease per source
    (``text.flesch_reading_ease``): vowel-group syllable estimate,
    terminator-run sentence count floored at 1 — the classic
    readability scorer quality pipelines bucket corpora with.  Pure
    single-pass row expressions (zero shuffle before the source
    groupBy); the oracle's ``regexp_replace`` carries the ``'g'``
    flag DuckDB needs where Java replaces globally by default."""
    from sync_cosmos_db_spark.operators.text import flesch_reading_ease

    docs = load_table(spark, sf_dir, "documents")
    p = 10 ** 4
    return (docs.withColumn("fre", flesch_reading_ease("text"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 (F.floor(F.avg("fre") * p + F.lit(0.5)) / p)
                 .alias("avg_flesch"),
                 (F.floor(F.min("fre") * p + F.lit(0.5)) / p)
                 .alias("min_flesch")))
