"""Round-6 operator families (final batch) X164-X165: field-level
survivorship merge and the one-row corpus datacard."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X164 — field-level survivorship merge (latest non-null per column)
# ---------------------------------------------------------------------------

@query(
    "field_survivorship_documents",
    """
    WITH v AS (
      SELECT doc_id, 0 AS ver, text, lang,
             NULL::VARCHAR AS source FROM documents
      UNION ALL
      SELECT doc_id, 1, NULL, CASE WHEN doc_id % 2 = 0
                                   THEN 'xx' ELSE NULL END,
             source
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, 2, text || ' v2', NULL, NULL
      FROM documents WHERE doc_id % 5 = 0),
    m AS (
      SELECT doc_id,
             max(CASE WHEN text IS NOT NULL THEN
                   struct_pack(ver := ver, val := text) END) AS mt,
             max(CASE WHEN lang IS NOT NULL THEN
                   struct_pack(ver := ver, val := lang) END) AS ml,
             max(CASE WHEN source IS NOT NULL THEN
                   struct_pack(ver := ver, val := source) END) AS ms
      FROM v GROUP BY 1)
    SELECT doc_id, mt.val AS text, ml.val AS lang,
           ms.val AS source
    FROM m
    """,
)
def field_survivorship_documents(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X164 — field-level survivorship merge: collapse versioned
    partial records to one golden row per key where EACH COLUMN
    independently takes its latest non-null value — the MDM merge
    rule X91's whole-row election cannot express (a v1 record that
    updates only `source` must not erase v0's `text`).  The
    deterministic version stack here: v0 full rows, v1 partial
    (source + even-key lang), v2 text-only.  ONE key-keyed aggregate
    with a per-column max over (version, value) structs — null
    values excluded per column, so a later null never wins; no
    window, no self-join."""
    docs = load_table(spark, sf_dir, "documents")
    v0 = docs.select("doc_id", F.lit(0).alias("ver"), "text", "lang",
                     F.lit(None).cast("string").alias("source"))
    v1 = (docs.filter(F.col("doc_id") % 3 == 0)
          .select("doc_id", F.lit(1).alias("ver"),
                  F.lit(None).cast("string").alias("text"),
                  F.when(F.col("doc_id") % 2 == 0, "xx")
                  .otherwise(F.lit(None)).alias("lang"),
                  "source"))
    v2 = (docs.filter(F.col("doc_id") % 5 == 0)
          .select("doc_id", F.lit(2).alias("ver"),
                  F.concat(F.col("text"), F.lit(" v2")).alias("text"),
                  F.lit(None).cast("string").alias("lang"),
                  F.lit(None).cast("string").alias("source")))
    v = v0.unionByName(v1).unionByName(v2)

    def latest(col):
        return F.max(F.when(F.col(col).isNotNull(),
                            F.struct(F.col("ver"), F.col(col)
                                     .alias("val"))))["val"]

    return (v.groupBy("doc_id")
            .agg(latest("text").alias("text"),
                 latest("lang").alias("lang"),
                 latest("source").alias("source")))


# ---------------------------------------------------------------------------
# X165 — one-row corpus datacard
# ---------------------------------------------------------------------------

@query(
    "corpus_datacard_documents",
    """
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(string_split_regex(text, '\\s+')) AS n_tok
      FROM documents),
    dup AS (SELECT count(*) - count(DISTINCT text) AS n_dups,
                   count(*) AS n FROM base),
    agg AS (
      SELECT count(*)::BIGINT AS n_docs,
             sum(n_tok)::BIGINT AS n_tokens,
             count(DISTINCT lang)::BIGINT AS n_langs,
             count(DISTINCT source)::BIGINT AS n_sources,
             floor(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
                   * 10000 + 0.5) / 10000 AS frac_en,
             floor(avg(n_chars) * 100 + 0.5) / 100 AS mean_chars,
             floor(quantile_cont(n_tok::DOUBLE, 0.5) * 100 + 0.5)
               / 100 AS median_tokens
      FROM base)
    SELECT agg.*,
           dup.n_dups::BIGINT AS n_exact_dups,
           floor(dup.n_dups * 1.0 / dup.n * 10000 + 0.5) / 10000
             AS dup_rate
    FROM agg, dup
    """,
)
def corpus_datacard_documents(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X165 — one-row corpus datacard: docs / tokens / languages /
    sources, English share, length profile, and exact-duplicate rate
    — the summary block of a dataset card, assembled from the same
    primitives the dedicated operators use (X1 exact dedup's
    text-identity, X6's token counts), in two aggregates joined as
    1-row broadcasts.  This is the first thing a dataset release
    ships and the nightly tripwire for silent corpus drift (diff
    against yesterday's card via X28)."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.withColumn(
        "n_tok", F.size(F.split(F.col("text"), r"\s+")))
    p4, p2 = 10 ** 4, 10 ** 2
    fr4 = lambda c: F.floor(c * p4 + F.lit(0.5)) / p4  # noqa: E731
    fr2 = lambda c: F.floor(c * p2 + F.lit(0.5)) / p2  # noqa: E731
    agg = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        fr4(F.avg((F.col("lang") == "en").cast("double")))
        .alias("frac_en"),
        fr2(F.avg("n_chars")).alias("mean_chars"),
        fr2(F.expr("percentile(n_tok, 0.5)")).alias("median_tokens"))
    dup = base.agg(
        (F.count("*") - F.countDistinct("text")).cast("long")
        .alias("n_exact_dups"),
        F.count("*").alias("__n"))
    return (agg.crossJoin(F.broadcast(dup))
            .withColumn("dup_rate",
                        fr4(F.col("n_exact_dups") / F.col("__n")))
            .drop("__n"))
