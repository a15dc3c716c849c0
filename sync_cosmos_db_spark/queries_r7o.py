"""Round-7 operator families (fourteenth batch) X223-X226:
deterministic PPS systematic sampling, embedding mean-pooling with
renormalization, retention power-law fit & projection, and KWIC
snippet extraction — survey-grade size-proportional sampling without
RNG, the chunk→document embedding build, X187's triangle turned into
a forecast, and the search-UI snippet generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X223 — PPS systematic sampling
# ---------------------------------------------------------------------------

@query(
    "pps_sample_orders",
    """
    WITH c AS (SELECT o_orderkey AS k,
                      floor(o_totalprice * 100 + 0.5)::BIGINT AS w
               FROM orders),
    t AS (SELECT sum(w)::BIGINT AS total FROM c),
    g AS (SELECT greatest(total // 100, 1) AS step FROM t),
    cum AS (SELECT k, w,
                   sum(w) OVER (ORDER BY w, k
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)::BIGINT AS cum
            FROM c),
    sel AS (SELECT k, w, cum, cum - w AS prev FROM cum)
    SELECT k AS o_orderkey, w AS weight_cents,
           (((cum + step - step // 2) // step)
            - ((prev + step - step // 2) // step))::BIGINT
             AS n_picks
    FROM sel, g
    WHERE ((cum + step - step // 2) // step)
          - ((prev + step - step // 2) // step) > 0
    """,
)
def pps_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X223 — 100-slot PPS systematic sample of orders by price
    (``curation.pps_systematic_sample``): integer-cents weights on a
    distributed cumulative line, fixed mid-step anchor, zero RNG —
    heavy orders can be picked multiple times (n_picks), exactly
    PPS-with-replacement."""
    from sync_cosmos_db_spark.operators.curation import (
        pps_systematic_sample,
    )

    orders = load_table(spark, sf_dir, "orders")
    return pps_systematic_sample(orders, "o_orderkey",
                                 "o_totalprice", 100)


# ---------------------------------------------------------------------------
# X224 — embedding mean pooling
# ---------------------------------------------------------------------------

@query(
    "mean_pool_embeddings_labels",
    """
    WITH ex AS (
      SELECT label AS g,
             unnest(generate_series(0, len(embedding) - 1)) AS dim,
             unnest(embedding) AS x
      FROM embeddings),
    p AS (SELECT g, dim, avg(x::DOUBLE) AS p FROM ex GROUP BY 1, 2),
    n AS (SELECT g, sqrt(sum(p * p)) AS norm FROM p GROUP BY 1)
    SELECT p.g AS label, p.dim::BIGINT AS dim,
           floor(p.p * 1000000 + 0.5) / 1000000 AS pooled,
           CASE WHEN n.norm > 0
                THEN floor(p.p / n.norm * 1000000 + 0.5) / 1000000
           END AS pooled_renorm
    FROM p JOIN n USING (g)
    """,
)
def mean_pool_embeddings_labels(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X224 — per-label mean-pooled embedding, L2-renormalized
    (``similarity.mean_pool_embeddings``): posexplode → one
    (label, dim) average → tiny norm join; per-dimension output so
    the oracle checks values, not array hashes."""
    from sync_cosmos_db_spark.operators.similarity import (
        mean_pool_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return mean_pool_embeddings(emb, "label", "embedding")


# ---------------------------------------------------------------------------
# X225 — retention power-law fit
# ---------------------------------------------------------------------------

@query(
    "retention_fit_users",
    """
    WITH f AS (SELECT user_id, min(ts)::DATE AS fd
               FROM events GROUP BY 1),
    a AS (SELECT DISTINCT e.user_id, f.fd, e.ts::DATE AS d
          FROM events e JOIN f USING (user_id)),
    curve AS (SELECT date_diff('day', fd, d) AS t,
                     count(*)::DOUBLE AS act
              FROM a GROUP BY 1),
    sz AS (SELECT act AS size FROM curve WHERE t = 0),
    obs AS (SELECT t, act / size AS r, ln(t::DOUBLE) AS lnt,
                   ln(act / size) AS lnr
            FROM curve, sz WHERE t >= 1),
    fit AS (SELECT count(*)::DOUBLE AS n, sum(lnt) AS sx,
                   sum(lnr) AS sy, sum(lnt * lnr) AS sxy,
                   sum(lnt * lnt) AS sxx, max(t) AS h
            FROM obs),
    proj AS (SELECT h + x AS t, n, sx, sy, sxy, sxx
             FROM fit, (SELECT unnest(generate_series(1, 3)) AS x))
    SELECT t AS t_days, 'observed' AS kind,
           floor(r * 10000 + 0.5) / 10000 AS retention
    FROM obs
    UNION ALL
    SELECT t, 'projected',
           floor(exp((sy - ((n * sxy - sx * sy)
                            / (n * sxx - sx * sx)) * sx) / n
                     + ((n * sxy - sx * sy)
                        / (n * sxx - sx * sx)) * ln(t::DOUBLE))
                 * 10000 + 0.5) / 10000
    FROM proj
    """,
)
def retention_fit_users(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    """X225 — day-grain pooled retention curve with a power-law
    (log-log OLS) fit projected 3 days past the horizon
    (``behavioral.retention_curve_fit``)."""
    from sync_cosmos_db_spark.operators.behavioral import (
        retention_curve_fit,
    )

    ev = load_table(spark, sf_dir, "events")
    return retention_curve_fit(ev, "user_id", "ts", project_days=3)


# ---------------------------------------------------------------------------
# X226 — KWIC snippets
# ---------------------------------------------------------------------------

@query(
    "kwic_snippets_documents",
    """
    WITH m AS (
      SELECT doc_id, source, text,
             strpos(text, 'merge batch') AS pos,
             ((len(text) - len(replace(text, 'merge batch', '')))
              // 11)::BIGINT AS n_occ
      FROM documents WHERE contains(text, 'merge batch'))
    SELECT doc_id, source, pos::BIGINT AS first_pos, n_occ,
           substr(text, greatest(pos - 20, 1),
                  pos + 31 - greatest(pos - 20, 1)) AS snippet
    FROM m
    """,
)
def kwic_snippets_documents(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X226 — keyword-in-context snippets for 'merge batch': first
    occurrence position, occurrence count (length-delta trick,
    integer division), and a ±20-char window clamped at the start —
    all in-row string algebra, zero shuffle before the scan's own
    output."""
    docs = load_table(spark, sf_dir, "documents")
    pat = "merge batch"
    pos = F.locate(pat, F.col("text"))
    start = F.greatest(pos - 20, F.lit(1))
    n_occ = F.expr(
        "(length(text) - length(replace(text, 'merge batch', '')))"
        " div 11")
    return (docs.filter(F.col("text").contains(pat))
            .select("doc_id", "source",
                    pos.cast("long").alias("first_pos"),
                    n_occ.cast("long").alias("n_occ"),
                    F.substring(F.col("text"), start,
                                pos + 31 - start).alias("snippet")))
