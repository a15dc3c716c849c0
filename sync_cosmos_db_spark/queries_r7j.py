"""Round-7 operator families (ninth batch) X203-X206: training-
mixture solver, nightly drift-gate verdict, deterministic
word-dropout augmentation, and count-data dispersion profile — the
pretraining mixture knob, the may-this-snapshot-ship gate composing
X28/X79/X51's parts, the reproducible augmentation view, and the
Poisson-or-bursty one-number check beside X142.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table

_TARGETS = {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2}


# ---------------------------------------------------------------------------
# X203 — training-mixture solver
# ---------------------------------------------------------------------------

@query(
    "mixture_solver_documents",
    """
    WITH c AS (SELECT source,
                      sum(len(string_split_regex(text, '\\s+')))
                        ::BIGINT AS tokens
               FROM documents GROUP BY 1),
    t(source, tgt) AS (VALUES ('src0', 0.3), ('src1', 0.3),
                              ('src2', 0.2), ('src3', 0.2)),
    d AS (SELECT c.source, c.tokens,
                 coalesce(t.tgt::DOUBLE, 0.0) AS target_share,
                 sum(c.tokens) OVER () AS tot
          FROM c LEFT JOIN t USING (source)),
    r AS (SELECT source, tokens, target_share,
                 tokens::DOUBLE / tot AS nat,
                 target_share / (tokens::DOUBLE / tot) AS rr,
                 max(target_share / (tokens::DOUBLE / tot)) OVER ()
                   AS rmax
          FROM d)
    SELECT source, tokens,
           floor(nat * 1000000 + 0.5) / 1000000 AS natural_share,
           target_share,
           floor(rr / rmax * 1000000 + 0.5) / 1000000
             AS sample_rate,
           floor(rr / rmax * tokens)::BIGINT AS tokens_after
    FROM r
    """,
)
def mixture_solver_documents(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X203 — downsample-only mixture solver
    (``curation.mixture_solver``): four target sources at
    30/30/20/20, every other source dropped (target 0 → rate 0).
    One token-count scan, then |sources|-row arithmetic with a
    window-max normalizer; the binding source keeps rate 1.0."""
    from sync_cosmos_db_spark.operators.curation import mixture_solver

    docs = load_table(spark, sf_dir, "documents")
    return mixture_solver(docs, "source", "text", _TARGETS)


# ---------------------------------------------------------------------------
# X204 — drift-gate verdict
# ---------------------------------------------------------------------------

@query(
    "drift_gate_orders",
    """
    WITH b AS (SELECT * FROM orders
               WHERE o_orderdate < DATE '1998-01-01'),
    c AS (SELECT * FROM orders
          WHERE o_orderdate >= DATE '1998-01-01'),
    nb AS (SELECT count(*)::BIGINT AS n FROM b),
    nc AS (SELECT count(*)::BIGINT AS n FROM c),
    hb AS (SELECT CASE WHEN o_totalprice > 300000 THEN 4
                       WHEN o_totalprice > 200000 THEN 3
                       WHEN o_totalprice > 100000 THEN 2
                       WHEN o_totalprice > 50000 THEN 1
                       ELSE 0 END AS bk,
                  count(*)::DOUBLE AS cb
           FROM b GROUP BY 1),
    hc AS (SELECT CASE WHEN o_totalprice > 300000 THEN 4
                       WHEN o_totalprice > 200000 THEN 3
                       WHEN o_totalprice > 100000 THEN 2
                       WHEN o_totalprice > 50000 THEN 1
                       ELSE 0 END AS bk,
                  count(*)::DOUBLE AS cc
           FROM c GROUP BY 1),
    h AS (SELECT coalesce(cb, 0.5) AS cb, coalesce(cc, 0.5) AS cc
          FROM hb FULL JOIN hc USING (bk)),
    hp AS (SELECT cb / sum(cb) OVER () AS pb,
                  cc / sum(cc) OVER () AS pc FROM h),
    psi AS (SELECT sum((pc - pb) * ln(pc / pb)) AS v FROM hp),
    cats AS (
      SELECT count(*)::BIGINT AS n FROM (
        (SELECT DISTINCT o_orderpriority FROM b
         EXCEPT SELECT DISTINCT o_orderpriority FROM c)
        UNION ALL
        (SELECT DISTINCT o_orderpriority FROM c
         EXCEPT SELECT DISTINCT o_orderpriority FROM b)) t)
    SELECT 'row_count_delta' AS check,
           floor(abs(nc.n - nb.n)::DOUBLE / nb.n * 1000000 + 0.5)
             / 1000000 AS metric,
           CASE WHEN abs(nc.n - nb.n)::DOUBLE / nb.n <= 0.5
                THEN 'PASS' ELSE 'WARN' END AS verdict
    FROM nb, nc
    UNION ALL
    SELECT 'psi_o_totalprice',
           floor(v * 1000000 + 0.5) / 1000000,
           CASE WHEN v <= 0.2 THEN 'PASS' ELSE 'WARN' END
    FROM psi
    UNION ALL
    SELECT 'category_domain_o_orderpriority',
           floor(n * 1000000 + 0.5) / 1000000,
           CASE WHEN n = 0 THEN 'PASS' ELSE 'WARN' END
    FROM cats
    """,
)
def drift_gate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X204 — drift-gate verdict (``expectations.drift_gate``)
    between the pre-1998 and 1998-onward order snapshots: row-count
    delta, PSI of the price distribution over FIXED edges, and
    priority-domain membership, each with a PASS/WARN verdict —
    X28/X79/X51's parts composed into the one table a pipeline
    pages on."""
    from sync_cosmos_db_spark.operators.expectations import drift_gate

    orders = load_table(spark, sf_dir, "orders")
    cut = F.to_date(F.lit("1998-01-01"))
    base = orders.filter(F.to_date("o_orderdate") < cut)
    cur = orders.filter(F.to_date("o_orderdate") >= cut)
    return drift_gate(base, cur, "o_totalprice", "o_orderpriority",
                      [50000.0, 100000.0, 200000.0, 300000.0])


# ---------------------------------------------------------------------------
# X205 — word-dropout augmentation
# ---------------------------------------------------------------------------

@query(
    "word_dropout_documents",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(generate_series(0,
               len(string_split_regex(text, '\\s+')) - 1)) AS pos,
             unnest(string_split_regex(text, '\\s+')) AS tok
      FROM documents),
    k AS (SELECT doc_id, pos, tok,
                 (pos = 0 OR
                  translate(substr(sha256(doc_id::VARCHAR || ':'
                                          || pos::VARCHAR
                                          || ':aug'), 1, 3),
                            'abcdef', '012345')::BIGINT % 100 >= 15)
                   AS keep
          FROM toks)
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE keep)
             AS aug_text
    FROM k GROUP BY 1
    """,
)
def word_dropout_documents(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X205 — deterministic 15% word dropout (``text.word_dropout``,
    salt 'aug'): sha2 draw per (doc, position), position 0 always
    survives, augmented text rebuilt in original order — the
    reproducible augmentation a contrastive pipeline re-derives
    instead of storing."""
    from sync_cosmos_db_spark.operators.text import word_dropout

    docs = load_table(spark, sf_dir, "documents")
    return word_dropout(docs, "doc_id", "text", drop_pct=15,
                        salt="aug")


# ---------------------------------------------------------------------------
# X206 — dispersion profile
# ---------------------------------------------------------------------------

@query(
    "dispersion_event_types",
    """
    WITH d AS (SELECT event_type AS g, ts::DATE AS d,
                      count(*)::BIGINT AS c
               FROM events GROUP BY 1, 2),
    a AS (SELECT g, count(*)::BIGINT AS n_days,
                 sum(c)::BIGINT AS s, sum(c * c)::BIGINT AS s2
          FROM d GROUP BY 1)
    SELECT g AS event_type, n_days,
           floor(s::DOUBLE / n_days * 1000000 + 0.5) / 1000000
             AS mean_daily,
           CASE WHEN n_days > 1
                THEN floor((n_days * s2 - s * s)::DOUBLE
                           / (n_days * (n_days - 1))
                           / (s::DOUBLE / n_days)
                           * 1000000 + 0.5) / 1000000
           END AS vmr,
           CASE WHEN n_days > 1 THEN
             (CASE WHEN (n_days * s2 - s * s)::DOUBLE
                        / (n_days * (n_days - 1))
                        / (s::DOUBLE / n_days) > 1.2
                   THEN 'overdispersed'
                   WHEN (n_days * s2 - s * s)::DOUBLE
                        / (n_days * (n_days - 1))
                        / (s::DOUBLE / n_days) < 0.8
                   THEN 'underdispersed'
                   ELSE 'poisson-like' END)
           END AS dispersion_class
    FROM a
    """,
)
def dispersion_event_types(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X206 — variance-to-mean dispersion of daily counts per event
    type (``profiling.dispersion_profile``): integer sufficient
    statistics, classification on the UNROUNDED ratio in both
    engines."""
    from sync_cosmos_db_spark.operators.profiling import (
        dispersion_profile,
    )

    ev = load_table(spark, sf_dir, "events")
    return dispersion_profile(ev, "event_type", F.to_date("ts"))
