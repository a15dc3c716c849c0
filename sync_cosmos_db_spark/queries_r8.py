"""Round-8 registrations — scale twins mandated by the round-7 verdict.

Registered LAST (after every r7 module) so the 61-query driver-sweep
backlog drains in registration order before these enter the window
(round-7 verdict item 1: no new families ahead of the backlog; item 2
explicitly requests this one scale twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table

# ---------------------------------------------------------------------------
# X160 scale form — foreachBatch rate limiter (round-7 verdict item 2)
# ---------------------------------------------------------------------------

_RL_ORACLE = """
    WITH rn AS (
      SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT
               AS window_start,
             row_number() OVER (
               PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts)
               ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT window_start, count(*)::BIGINT AS n_events,
           sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END)::BIGINT
             AS n_admitted,
           sum(CASE WHEN rn > 5 THEN 1 ELSE 0 END)::BIGINT
             AS n_dropped
    FROM rn GROUP BY 1
"""


@query("stream_rate_limit_hourly_batchmerge", _RL_ORACLE)
def stream_rate_limit_hourly_batchmerge(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """X160 SCALE form (round-7 verdict item 2) — the foreachBatch
    batch-merge rate limiter (``streaming.stateful.
    run_rate_limit_batchmerge``): each micro-batch collapses to one
    row per (user, hour) JVM-side and merges against a keys-sized
    admitted-counter table — zero per-key Python dispatch, unlike the
    ``applyInPandasWithState`` live form it twins
    (``stream_rate_limit_hourly``, same 4-batch event-time-ordered
    replay, same X131 batch row_number oracle)."""
    import os
    import tempfile

    from sync_cosmos_db_spark.streaming.stateful import (
        run_rate_limit_batchmerge,
    )

    ev = load_table(spark, sf_dir, "events")
    sliced = ev.withColumn(
        "slice", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    tmp = tempfile.mkdtemp(prefix="rl_bm_stream_")
    for i in range(1, 5):
        (sliced.filter(F.col("slice") == i).drop("slice")
         .coalesce(1).write.mode("append").parquet(tmp))
        # strictly increasing mtimes: the file source replays slices in
        # event-time order regardless of write latency.  Only files NOT
        # yet stamped (real 2020s mtime ≫ the forced 1e9 range) get
        # slice i's stamp — re-stamping everything each iteration would
        # leave all files sharing the LAST stamp (advisor r8 finding).
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                full = os.path.join(tmp, f)
                cur = os.stat(full)
                if cur.st_mtime > 1_100_000_000:
                    os.utime(full, (cur.st_atime, 1_000_000_000 + i * 1000))
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(tmp))
    state_dir = tempfile.mkdtemp(prefix="rl_bm_state_")
    return run_rate_limit_batchmerge(stream, state_dir, limit=5)


# ---------------------------------------------------------------------------
# X2 — SimHash containment twin (round-7 verdict item 3): the last
# rows-only dedup family without a hash-checked invariant twin
# (MinHash has dedup_lsh_containment, embedding LSH has
# dedup_embedding_lsh_containment; SimHash had only pytest recall).
# ---------------------------------------------------------------------------

_EXACT_DUP_PAIRS_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
)
SELECT 0 AS n_violations, count(*)::BIGINT AS n_exact_dup_pairs
FROM corpus a JOIN corpus b
  ON a.text = b.text AND a.doc_id < b.doc_id
"""


@query("dedup_simhash_containment", _EXACT_DUP_PAIRS_ORACLE)
def dedup_simhash_containment(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X2 SimHash invariant, hash-checkable: identical text yields an
    identical 64-bit fingerprint, which lands in the same prefix block
    with Hamming distance 0 — so EVERY same-text pair must appear in
    ``simhash_dup_pairs``'s output (``exact_dup_pairs ⊆ simhash_pairs``).
    Returns the violation count (same-text pairs the SimHash pipeline
    missed — must be 0) plus the exact-dup pair count, which DuckDB
    recomputes independently from the mirrored corpus CTE.

    The exact side shuffles 64-hex digests (sha2), never full text; the
    containment check is one equi-join + one aggregate."""
    from sync_cosmos_db_spark.operators import dedup as D
    from sync_cosmos_db_spark.queries_llm import _corpus_with_exact_dups

    corpus = _corpus_with_exact_dups(spark, sf_dir).select("doc_id", "text")
    sims = D.simhash_dup_pairs(corpus, id_col="doc_id", text_col="text",
                               max_hamming=3)
    h = corpus.select("doc_id", F.sha2(F.col("text"), 256).alias("__h"))
    exact = (h.alias("a").join(
        h.alias("b"),
        (F.col("a.__h") == F.col("b.__h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b")))
    found = sims.select("id_a", "id_b").withColumn("__s", F.lit(1))
    j = exact.join(found, ["id_a", "id_b"], "left_outer")
    return j.agg(
        F.sum(F.when(F.col("__s").isNull(), 1).otherwise(0))
        .cast("int").alias("n_violations"),
        F.count(F.lit(1)).cast("long").alias("n_exact_dup_pairs"))
