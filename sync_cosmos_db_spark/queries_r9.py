"""Round-9 registrations — pipeline-selection operators (X255-X258).

Registered LAST (after queries_r8) so the 15-query driver-sweep
backlog (13 carried + the two r9 invariant twins) drains in
registration order before these enter the window; 15 + 4 = 19 of the
50 window slots, so every never-swept query still gets a driver
CORRECTNESS row this round (round-8 verdict item 1's intent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table

# ---------------------------------------------------------------------------
# X255 — greedy token-budget corpus selection
# ---------------------------------------------------------------------------

_BUDGET = 30_000

_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         floor(len(list_distinct(string_split(text, ' ')))::DOUBLE
               / len(string_split(text, ' ')) * 1e6 + 0.5) / 1e6 AS score
  FROM documents),
r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
      FROM t),
c AS (SELECT *, coalesce(sum(n_tokens) OVER (
        ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        0) AS tokens_before
      FROM r)
SELECT doc_id, n_tokens::BIGINT AS n_tokens, score,
       tokens_before::BIGINT AS tokens_before
FROM c WHERE tokens_before < {_BUDGET}
"""


@query("token_budget_select_documents", _BUDGET_ORACLE)
def token_budget_select_documents(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """X255 — fill a fixed token budget with the best documents:
    lexical-diversity score (distinct/total tokens, floor-rounded
    1e-6), global (score DESC, doc_id) rank via the two-phase
    distributed index, running token total via the two-phase prefix
    scan — NO single-partition window (``curation.
    token_budget_select``); the oracle replays the same greedy prefix
    with plain SQL windows."""
    from sync_cosmos_db_spark.operators.curation import token_budget_select

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.floor(F.size(F.array_distinct(toks)).cast("double")
                 / F.size(toks) * 1e6 + F.lit(0.5)) / 1e6).alias("score"))
    return token_budget_select(scored, "doc_id", "score", "n_tokens",
                               budget=_BUDGET)


# ---------------------------------------------------------------------------
# X256 — curriculum ordering with source interleaving
# ---------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents),
s AS (SELECT source AS src,
             row_number() OVER (ORDER BY source) AS source_rank,
             count(*) OVER () AS n_sources
      FROM (SELECT DISTINCT source FROM t)),
r AS (SELECT doc_id, t.source, n_tokens,
             row_number() OVER (PARTITION BY t.source
                                ORDER BY n_tokens, doc_id)
               AS rank_in_source,
             source_rank, n_sources
      FROM t JOIN s ON s.src = t.source)
SELECT doc_id, source, rank_in_source::BIGINT AS rank_in_source,
       ((rank_in_source - 1) * n_sources + source_rank)::BIGINT
         AS position
FROM r
"""


@query("curriculum_interleave_documents", _CURRICULUM_ORACLE)
def curriculum_interleave_documents(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """X256 — length-based curriculum order with round-robin source
    interleaving: rank docs within each source easiest-first
    (n_tokens ASC), then place rank r of source s at global position
    ``(r-1)·|sources| + source_rank`` — the closed form avoids the
    single-partition global window entirely (the X151 lesson): one
    source-keyed rank window + a broadcast |sources|-row dim join.
    Positions are unique by construction; gaps appear once a source
    exhausts (the consumer reads in position order)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source",
                    F.size(F.split(F.col("text"), " ")).cast("long")
                    .alias("n_tokens"))
    sources = (t.select("source").distinct()
               .withColumn("source_rank",
                           F.row_number().over(W.orderBy("source"))
                           .cast("long")))
    n_src = sources.agg(F.count(F.lit(1)).alias("n_sources"))
    rk = F.row_number().over(
        W.partitionBy("source").orderBy("n_tokens", "doc_id")).cast("long")
    return (t.withColumn("rank_in_source", rk)
            .join(F.broadcast(sources), "source")
            .crossJoin(F.broadcast(n_src))
            .select("doc_id", "source", "rank_in_source",
                    ((F.col("rank_in_source") - 1) * F.col("n_sources")
                     + F.col("source_rank")).alias("position")))


# ---------------------------------------------------------------------------
# X257 — temperature-scaled mixture weights
# ---------------------------------------------------------------------------

_TEMP_ORACLE = """
WITH c AS (SELECT lang AS "group", count(*)::DOUBLE AS n
           FROM documents GROUP BY lang),
p AS (SELECT "group", n,
             floor(pow(n, 0.7) * 1e8 + 0.5) / 1e8 AS pn FROM c),
s AS (SELECT sum(pn) AS tot FROM p)
SELECT "group", n::BIGINT AS n,
       floor(pn / tot * 1e6 + 0.5) / 1e6 AS weight,
       floor(pn / tot * 1000000.0 / n * 1e4 + 0.5) / 1e4 AS epochs
FROM p, s ORDER BY "group"
"""


@query("mixture_temperature_weights", _TEMP_ORACLE)
def mixture_temperature_weights(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X257 — τ=0.7 temperature sampling weights per language plus the
    implied replay epochs at a 1M-token target (``curation.
    temperature_mixture_weights``): the standard multilingual
    rebalancing rule, one group count + a broadcast total; ``pow``
    floor-rounded at 1e-8 before the normalizing sum on both engines
    (libm vs JDK last-ulp discipline)."""
    from sync_cosmos_db_spark.operators.curation import (
        temperature_mixture_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (temperature_mixture_weights(docs, "lang", tau=0.7,
                                        token_target=1_000_000.0)
            .orderBy("group"))


# ---------------------------------------------------------------------------
# X258 — MinHash estimator calibration (the estimator-accuracy twin:
# the containment twins pin the LSH pipeline; this pins the SIGNATURE
# math itself against exact Jaccard)
# ---------------------------------------------------------------------------

_CALIB_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE doc_id % 7 = 0),
tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
        FROM corpus),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM corpus a JOIN corpus b ON b.doc_id = a.doc_id + 100000
  WHERE a.doc_id % 7 = 0 AND a.doc_id < 100000
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM corpus a JOIN corpus b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 20 = 0 AND a.doc_id < 100000)
SELECT id_a, id_b,
       floor(len(list_intersect(ta.tk, tb.tk))::DOUBLE
             / (len(ta.tk) + len(tb.tk)
                - len(list_intersect(ta.tk, tb.tk)))
             * 1e6 + 0.5) / 1e6 AS exact_j,
       0 AS n_violations
FROM pairs
JOIN tok ta ON ta.doc_id = id_a
JOIN tok tb ON tb.doc_id = id_b
"""


@query("minhash_estimate_calibration", _CALIB_ORACLE)
def minhash_estimate_calibration(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X258 — MinHash accuracy invariant, hash-checkable: over a
    deterministic arithmetic pair set (every doc_id%7 twin at J=1 plus
    every (doc_id%20, doc_id+1) adjacent pair at organic J), the
    64-hash signature agreement estimate must sit within ±0.30 of the
    exact unigram Jaccard (≈5σ at k=64; the sketch is deterministic
    for fixed data, so the bound is repeatable, not flaky).  Spark
    emits the exact Jaccard and the violation count (must be 0); the
    oracle recomputes the exact side independently with DuckDB list
    algebra.  One signature aggregate over the corpus + two id-keyed
    joins — never an all-pairs scan."""
    from sync_cosmos_db_spark.operators.dedup import (
        hashed_shingles,
        minhash_signatures,
    )
    from sync_cosmos_db_spark.queries_llm import _corpus_with_exact_dups

    k = 64
    corpus = _corpus_with_exact_dups(spark, sf_dir).select("doc_id", "text")
    shingled = corpus.select(
        "doc_id", hashed_shingles("text", 1).alias("__sh"),
        F.array_distinct(F.split(F.col("text"), " ")).alias("__tk"))
    sigs = minhash_signatures(shingled, "doc_id", "__sh", num_hashes=k)
    both = (shingled.select("doc_id", "__tk")
            .join(sigs, "doc_id"))
    a = both.select(F.col("doc_id").alias("id_a"),
                    F.col("__tk").alias("__tka"),
                    F.col("__sig").alias("__siga"))
    b = both.select(F.col("doc_id").alias("id_b"),
                    F.col("__tk").alias("__tkb"),
                    F.col("__sig").alias("__sigb"))
    twins = (a.filter((F.col("id_a") % 7 == 0) & (F.col("id_a") < 100000))
             .join(b, F.col("id_b") == F.col("id_a") + 100000))
    adj = (a.filter((F.col("id_a") % 20 == 0) & (F.col("id_a") < 100000))
           .join(b, F.col("id_b") == F.col("id_a") + 1))
    pairs = twins.unionByName(adj)
    inter = F.size(F.array_intersect("__tka", "__tkb")).cast("double")
    union = (F.size("__tka") + F.size("__tkb")
             - F.size(F.array_intersect("__tka", "__tkb")))
    exact_j = F.floor(inter / union * 1e6 + F.lit(0.5)) / 1e6
    est = (F.aggregate(
        F.zip_with("__siga", "__sigb",
                   lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, x: acc + x).cast("double") / k)
    return (pairs
            .withColumn("exact_j", exact_j)
            .withColumn("__est", est)
            .select("id_a", "id_b", "exact_j",
                    F.when(F.abs(F.col("__est") - F.col("exact_j"))
                           > 0.30, 1).otherwise(0).cast("int")
                    .alias("n_violations")))
