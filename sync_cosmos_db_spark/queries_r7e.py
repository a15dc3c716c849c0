"""Round-7 operator families (fourth batch) X185-X186: accent-fold
normalization audit (the linkage-blocking companion of the X167 NFC
audit) and position-based (U-shaped) multi-touch attribution (the
multi-touch companion of X84's last-touch model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X185 — accent-fold audit
# ---------------------------------------------------------------------------

@query(
    "accent_fold_documents",
    """
    WITH aug AS (
      SELECT source,
             text || CASE WHEN doc_id % 5 = 0
                          THEN ' caf' || chr(233) || ' na' || chr(239)
                               || 've ' || chr(197) || 'ngstr'
                               || chr(246) || 'm'
                          ELSE '' END
                  || CASE WHEN doc_id % 9 = 0
                          THEN ' e' || chr(769) || chr(770)
                          ELSE '' END AS text
      FROM documents),
    d AS (SELECT source, text, strip_accents(text) AS folded FROM aug)
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN folded <> text THEN 1 ELSE 0 END)::BIGINT
             AS n_changed,
           sum(length(text))::BIGINT AS chars_before,
           sum(length(folded))::BIGINT AS chars_after
    FROM d GROUP BY 1
    """,
)
def accent_fold_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X185 — accent-fold audit (``text.accent_fold_audit``) with
    deterministic diacritic injections (every 5th doc gains
    precomposed é/ï/Å/ö, every 9th a double-combining-mark 'e') so
    the ASCII corpus exercises both precomposed and combining paths:
    Python NFD-strip-Mn vs DuckDB's native ``strip_accents`` — two
    independent implementations hash-agreeing, the same
    differential-oracle pattern as X167/X176."""
    from sync_cosmos_db_spark.operators.text import accent_fold_audit

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" caf\u00e9 na\u00efve \u00c5ngstr\u00f6m"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 9 == 0,
                   F.lit(" e\u0301\u0302")).otherwise(F.lit(""))))
    return accent_fold_audit(aug, "source", "text")


# ---------------------------------------------------------------------------
# X186 — position-based multi-touch attribution
# ---------------------------------------------------------------------------

@query(
    "position_attribution_events",
    """
    WITH fc AS (
      SELECT user_id, min(ts) AS conv_ts FROM events
      WHERE event_type = 'purchase' GROUP BY 1),
    t AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id,
             row_number() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS rn,
             count(*) OVER (PARTITION BY e.user_id) AS n
      FROM events e JOIN fc ON fc.user_id = e.user_id
      WHERE e.event_type <> 'purchase' AND e.ts < fc.conv_ts)
    SELECT event_type AS channel, count(*)::BIGINT AS n_touches,
           floor(sum(CASE WHEN n = 1 THEN 1.0
                          WHEN n = 2 THEN 0.5
                          WHEN rn = 1 THEN 0.4
                          WHEN rn = n THEN 0.4
                          ELSE 0.2 / (n - 2) END) * 10000 + 0.5)
             / 10000 AS credit
    FROM t GROUP BY 1
    """,
)
def position_attribution_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X186 — position-based 40/20/40 multi-touch attribution
    (``behavioral.position_attribution``) of purchases: first and
    last pre-conversion touches get 0.4 each, middles split 0.2,
    per-user credit sums to exactly 1 — the U-shaped model beside
    X84's last-touch.  Two shrinking user-keyed hops + one rank
    window over the (already small) touch table."""
    from sync_cosmos_db_spark.operators.behavioral import (
        position_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    return position_attribution(ev, "purchase")
