"""Round-6 operator families (fifth batch) X153-X155: l-diversity
audit, t-closeness (EMD) audit, and time-constrained funnel
conversion — the privacy-release pair that completes the
k-anonymity gate (X104), plus the funnel variant marketing actually
asks for ("converted WITHIN an hour", not "ever").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sync_cosmos_db_spark.cache_scope import scoped_persist
from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X153 — l-diversity audit
# ---------------------------------------------------------------------------

@query(
    "l_diversity_customers",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             count(*)::BIGINT AS grp,
             count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                 WHEN c_acctbal < 5000 THEN 'mid'
                                 ELSE 'high' END)::BIGINT AS n_sensitive
      FROM customer GROUP BY 1, 2)
    SELECT count(*)::BIGINT AS n_groups,
           sum(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END)::BIGINT
             AS n_undiverse_groups,
           sum(CASE WHEN n_sensitive < 3 THEN grp ELSE 0 END)::BIGINT
             AS n_exposed_rows,
           min(n_sensitive) AS min_diversity,
           sum(grp)::BIGINT AS n_rows
    FROM g
    """,
)
def l_diversity_customers(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X153 — l-diversity audit over the (nationkey, mktsegment)
    quasi-identifier with a bucketed account-balance sensitive
    attribute: k-anonymity (X104) counts group SIZES, but a large
    group whose members all share one sensitive value still leaks it
    (homogeneity attack) — l-diversity requires ≥ l distinct
    sensitive values per equivalence class.  One quasi-id-keyed
    count-distinct plus a constant-size re-aggregate — the same
    shuffle shape as X104, auditing the orthogonal failure mode."""
    c = load_table(spark, sf_dir, "customer")
    sens = (F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count(F.lit(1)).cast("long").alias("grp"),
              F.countDistinct(sens).cast("long").alias("n_sensitive")))
    undiv = F.col("n_sensitive") < 3
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(undiv.cast("long")).cast("long")
        .alias("n_undiverse_groups"),
        F.sum(F.when(undiv, F.col("grp")).otherwise(0)).cast("long")
        .alias("n_exposed_rows"),
        F.min("n_sensitive").alias("min_diversity"),
        F.sum("grp").cast("long").alias("n_rows"))


# ---------------------------------------------------------------------------
# X154 — t-closeness (ordered EMD) audit
# ---------------------------------------------------------------------------

@query(
    "t_closeness_customers",
    """
    WITH b AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 0
                  WHEN c_acctbal < 2500 THEN 1
                  WHEN c_acctbal < 5000 THEN 2
                  WHEN c_acctbal < 7500 THEN 3
                  ELSE 4 END AS bucket
      FROM customer),
    cell AS (SELECT c_nationkey, c_mktsegment, bucket,
                    count(*)::DOUBLE AS c
             FROM b GROUP BY 1, 2, 3),
    grid AS (
      SELECT g.c_nationkey, g.c_mktsegment, bk.bucket,
             coalesce(cell.c, 0) AS c, g.n
      FROM (SELECT c_nationkey, c_mktsegment, sum(c) AS n
            FROM cell GROUP BY 1, 2) g
      CROSS JOIN (SELECT DISTINCT bucket FROM b) bk
      LEFT JOIN cell USING (c_nationkey, c_mktsegment, bucket)),
    gl AS (SELECT bucket, sum(c) AS gc FROM cell GROUP BY 1),
    gt AS (SELECT sum(gc) AS t FROM gl),
    dev AS (
      SELECT grid.c_nationkey, grid.c_mktsegment, grid.bucket,
             sum(grid.c / grid.n - gl.gc / (SELECT t FROM gt))
               OVER (PARTITION BY grid.c_nationkey, grid.c_mktsegment
                     ORDER BY grid.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cumdev
      FROM grid JOIN gl USING (bucket)),
    emd AS (
      SELECT c_nationkey, c_mktsegment,
             floor(avg(abs(cumdev)) * 1000000 + 0.5) / 1000000
               AS t_dist
      FROM dev GROUP BY 1, 2)
    SELECT count(*)::BIGINT AS n_groups,
           sum(CASE WHEN t_dist > 0.2 THEN 1 ELSE 0 END)::BIGINT
             AS n_far_groups,
           floor(max(t_dist) * 1000000 + 0.5) / 1000000 AS max_t,
           floor(avg(t_dist) * 1000000 + 0.5) / 1000000 AS mean_t
    FROM emd
    """,
)
def t_closeness_customers(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """X154 — t-closeness audit: per quasi-identifier group, the
    earth-mover's distance between the group's sensitive-attribute
    distribution and the GLOBAL one (for an ordered attribute, EMD =
    mean |cumulative difference| over buckets) — the strictest of
    the release gates: a group can be k-anonymous AND l-diverse yet
    still skew so far from the corpus that membership leaks
    information.  Per-group bucket counts → a dense (group × bucket)
    grid (missing cells zero-filled via a |buckets|-sized cross
    join) → ONE group-keyed cumulative window over the ordered
    buckets → constant-size report."""
    c = load_table(spark, sf_dir, "customer")
    bucket = (F.when(F.col("c_acctbal") < 0, 0)
              .when(F.col("c_acctbal") < 2500, 1)
              .when(F.col("c_acctbal") < 5000, 2)
              .when(F.col("c_acctbal") < 7500, 3)
              .otherwise(4))
    b = c.select("c_nationkey", "c_mktsegment", bucket.alias("bucket"))
    cell = (b.groupBy("c_nationkey", "c_mktsegment", "bucket")
            .agg(F.count("*").cast("double").alias("c")))
    # scope-registered (returned plan reads cell three ways);
    # released by the harness via cache_scope.release_persisted()
    cell = scoped_persist(cell)
    grp = (cell.groupBy("c_nationkey", "c_mktsegment")
           .agg(F.sum("c").alias("n")))
    buckets = b.select("bucket").distinct()
    gl = cell.groupBy("bucket").agg(F.sum("c").alias("gc"))
    gt = gl.agg(F.sum("gc").alias("t"))
    grid = (grp.crossJoin(F.broadcast(buckets))
            .join(cell, ["c_nationkey", "c_mktsegment", "bucket"],
                  "left")
            .withColumn("c", F.coalesce("c", F.lit(0.0)))
            .join(F.broadcast(gl), "bucket")
            .crossJoin(F.broadcast(gt)))
    w = (Window.partitionBy("c_nationkey", "c_mktsegment")
         .orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cumdev = F.sum(F.col("c") / F.col("n")
                   - F.col("gc") / F.col("t")).over(w)
    p = 10 ** 6
    fr = lambda x: F.floor(x * p + F.lit(0.5)) / p  # noqa: E731
    emd = (grid.withColumn("cumdev", cumdev)
           .groupBy("c_nationkey", "c_mktsegment")
           .agg(fr(F.avg(F.abs(F.col("cumdev")))).alias("t_dist")))
    return emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("t_dist") > 0.2).cast("long")).cast("long")
        .alias("n_far_groups"),
        fr(F.max("t_dist")).alias("max_t"),
        fr(F.avg("t_dist")).alias("mean_t"))


# ---------------------------------------------------------------------------
# X155 — time-constrained funnel conversion
# ---------------------------------------------------------------------------

@query(
    "funnel_within_1h_events",
    """
    WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT v.user_id, v.t0, min(e.ts) AS t1
          FROM v JOIN events e
            ON e.user_id = v.user_id
           AND e.event_type = 'click' AND e.ts > v.t0
          GROUP BY 1, 2),
    p AS (SELECT c.user_id, c.t1, min(e.ts) AS t2
          FROM c JOIN events e
            ON e.user_id = c.user_id
           AND e.event_type = 'purchase' AND e.ts > c.t1
          GROUP BY 1, 2)
    SELECT (SELECT count(*) FROM v)::BIGINT AS n_step0,
           (SELECT count(*) FROM c)::BIGINT AS n_step1,
           (SELECT count(*) FROM c
            WHERE epoch(t1) - epoch(t0) <= 3600)::BIGINT
             AS n_step1_within,
           (SELECT count(*) FROM p)::BIGINT AS n_step2,
           (SELECT count(*) FROM p JOIN c USING (user_id, t1)
            WHERE epoch(t2) - epoch(t0) <= 3600)::BIGINT
             AS n_step2_within
    """,
)
def funnel_within_1h_events(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X155 — time-constrained funnel: view → click → purchase where
    the WHOLE funnel completes within one hour of the first view —
    the conversion-SLA readout (an unbounded funnel, X26, calls a
    purchase three weeks later a conversion; campaigns do not).
    Reuses ``behavioral.funnel_times`` (k user-keyed min-aggregates,
    state one row per surviving user) and applies the window
    predicate on the timestamp table — the constraint costs zero
    extra shuffles."""
    from sync_cosmos_db_spark.operators.behavioral import funnel_times

    ev = load_table(spark, sf_dir, "events")
    t = funnel_times(ev, ["view", "click", "purchase"])
    el1 = F.col("t1").cast("double") - F.col("t0").cast("double")
    el2 = F.col("t2").cast("double") - F.col("t0").cast("double")
    return t.agg(
        F.count("t0").cast("long").alias("n_step0"),
        F.count("t1").cast("long").alias("n_step1"),
        F.sum(F.when(el1 <= 3600, 1).otherwise(0)).cast("long")
        .alias("n_step1_within"),
        F.count("t2").cast("long").alias("n_step2"),
        F.sum(F.when(el2 <= 3600, 1).otherwise(0)).cast("long")
        .alias("n_step2_within"))


# ---------------------------------------------------------------------------
# X156 — streaming CDC compaction + snapshot merge
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
    WITH snap AS (SELECT o_orderkey AS k, o_totalprice AS p,
                         o_orderstatus AS s FROM orders),
    ch AS (
      SELECT k, p * 1.1 AS p, s, 1 AS seq, 'U' AS op
      FROM snap WHERE k % 7 = 0
      UNION ALL
      SELECT k, p + 55.5, s, 3, 'U' FROM snap WHERE k % 7 = 0
      UNION ALL
      SELECT k, p, s, 2, 'D' FROM snap WHERE k % 11 = 0
      UNION ALL
      SELECT -k, p / 2, 'N', 1, 'U' FROM snap WHERE k % 13 = 0),
    latest AS (
      SELECT *, row_number() OVER (PARTITION BY k
                                   ORDER BY seq DESC, op ASC) AS rn
      FROM ch),
    l AS (SELECT * FROM latest WHERE rn = 1)
    SELECT coalesce(l.k, snap.k) AS o_orderkey,
           floor((CASE WHEN l.k IS NOT NULL THEN l.p ELSE snap.p END)
                 * 100 + 0.5) / 100 AS o_totalprice,
           CASE WHEN l.k IS NOT NULL THEN l.s ELSE snap.s END
             AS o_orderstatus
    FROM snap FULL JOIN l ON snap.k = l.k
    WHERE l.op IS NULL OR l.op <> 'D'
    """


def build_cdc_changes(snap: DataFrame) -> DataFrame:
    """The deterministic I/U/D change log both X156 forms replay (and
    X53's oracle describes): mod-7 keys get two competing upserts at
    seq 1 and 3, mod-11 keys a tombstone at seq 2, mod-13 keys an
    insert under a fresh negative key."""
    k, p, s = (F.col("o_orderkey"), F.col("o_totalprice"),
               F.col("o_orderstatus"))

    def ev(df, key, price, status, seq, op):
        return df.select(key.alias("o_orderkey"),
                         price.alias("o_totalprice"),
                         status.alias("o_orderstatus"),
                         F.lit(seq).cast("long").alias("seq"),
                         F.lit(op).alias("op"))

    base7 = snap.filter(k % 7 == 0)
    return (
        ev(base7, k, p * 1.1, s, 1, "U")
        .unionAll(ev(base7, k, p + 55.5, s, 3, "U"))
        .unionAll(ev(snap.filter(k % 11 == 0), k, p, s, 2, "D"))
        .unionAll(ev(snap.filter(k % 13 == 0), -k, p / 2, F.lit("N"),
                     1, "U")))


@query("stream_cdc_apply_orders", _CDC_ORACLE)
def stream_cdc_apply_orders(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X156 — STREAMING change-feed compaction
    (``streaming.stateful.changelog_compact_stream``) + snapshot
    merge: the same deterministic I/U/D log as X53 replayed through a
    REAL multi-batch availableNow file stream (maxFilesPerTrigger=1
    over 4 files, so conflicting events for one key genuinely arrive
    in different micro-batches and the winner must survive in the
    state store), then merged into the snapshot.  The oracle is
    X53's batch SQL verbatim — the streaming compaction must leave
    the table bit-identical to the batch replay.  This is the
    continuous-consumer architecture for a Cosmos change feed: the
    stream maintains a keys-sized compacted log; the periodic merge
    never re-reads the feed."""
    import tempfile
    import uuid

    from pyspark.sql import Window

    from sync_cosmos_db_spark.operators.cdc import apply_changelog
    from sync_cosmos_db_spark.streaming.stateful import (
        changelog_compact_stream,
    )
    from sync_cosmos_db_spark.streaming.windows import run_stream_to_memory

    snap = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    changes = build_cdc_changes(snap)
    tmp = tempfile.mkdtemp(prefix="cdc_stream_")
    changes.repartition(4).write.mode("overwrite").parquet(tmp)
    stream = (spark.readStream
              .schema(changes.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(tmp))
    compact = changelog_compact_stream(stream)
    emitted = run_stream_to_memory(
        spark, compact, f"cdc_mem_{uuid.uuid4().hex[:8]}", mode="update")
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(), F.col("op").asc())
    latest = (emitted.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))
    out = apply_changelog(snap, latest, ["o_orderkey"], "seq")
    return out.select("o_orderkey",
                      (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                       / 100).alias("o_totalprice"),
                      "o_orderstatus")
