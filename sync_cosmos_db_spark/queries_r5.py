"""Round-5 extension operators (X72–X78): calendar-decay EWMA
smoothing, chi-square independence audit, winsorized robust
aggregation, positional phrase search, functional-dependency audit,
categorical entropy profiling, and Z-order clustered layout.

None of these exist in the reference (its analytic surface is a single
document count, ``/root/reference/src/migration.py:62``); they are the
round-5 increment of the BASELINE.json extension series — the
statistics / data-layout / IR passes a training-data pipeline runs
beside the dedup+curation stack.  Same contract as every other query
module: each query is Spark-first (Catalyst plans, group-keyed
shuffles, no driver-side data loops) and each oracle recomputes the
semantics independently in DuckDB SQL for the driver's hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X72 — calendar-decay EWMA (operators/temporal.py)
# ---------------------------------------------------------------------------

@query(
    "ewma_daily_revenue",
    """
    WITH daily AS (
      SELECT o_orderdate::DATE AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    contrib AS (
      SELECT d + k::INTEGER AS day, v * pow(0.5, k) AS wv,
             pow(0.5, k) AS w
      FROM daily CROSS JOIN (SELECT unnest(generate_series(0, 29)) AS k) g),
    present AS (SELECT DISTINCT d AS day FROM daily)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           floor(sum(wv) / sum(w) * 10000 + 0.5) / 10000 AS ewma
    FROM contrib SEMI JOIN present USING (day)
    GROUP BY day
    """,
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72 — exponentially-weighted moving average of daily order
    revenue with CALENDAR decay (a 3-day gap decays 3×), pandas
    ``adjust=True`` normalization, 30-day truncation.  The plan has no
    self-join and no non-equi range join: each day explodes its value
    onto the ≤30 future days it influences and one day-keyed groupBy
    sums weighted numerator/denominator (see
    ``temporal.ewma_calendar``).  α = 0.5 makes every weight an exact
    dyadic double, so both engines multiply identically."""
    from sync_cosmos_db_spark.operators.temporal import ewma_calendar

    daily = (load_table(spark, sf_dir, "orders")
             .groupBy(F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.sum("o_totalprice").alias("v")))
    out = ewma_calendar(daily, "d", "v", alpha=0.5, window_days=30)
    return out.select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                      "ewma")


# ---------------------------------------------------------------------------
# X73 — chi-square independence (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "chi2_orders_status_priority",
    """
    WITH cells AS (
      SELECT o_orderstatus AS a, o_orderpriority AS b,
             count(*)::DOUBLE AS o
      FROM orders GROUP BY 1, 2),
    ma  AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
    mb  AS (SELECT b, sum(o) AS rb FROM cells GROUP BY b),
    tot AS (SELECT sum(o) AS n, count(DISTINCT a) AS n_a,
                   count(DISTINCT b) AS n_b FROM cells),
    j AS (SELECT o, ra * rb / n AS e, n, n_a, n_b
          FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot)
    SELECT n::BIGINT AS n, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           ((n_a - 1) * (n_b - 1))::BIGINT AS dof,
           floor((sum((o - e) * (o - e) / e) + n - sum(e)) * 10000 + 0.5)
             / 10000 AS chi2
    FROM j GROUP BY n, n_a, n_b
    """,
)
def chi2_orders_status_priority(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X73 — Pearson chi-square independence statistic between order
    status and priority: the contingency-table audit that flags
    leaking/correlated categoricals before they enter a sampling or
    stratification key.  One (a,b) groupBy builds the contingency
    table; margins re-aggregate the tiny cell table; unobserved cells
    contribute their expected mass in closed form (no category-grid
    cross join)."""
    from sync_cosmos_db_spark.operators.profiling import chi2_independence

    orders = load_table(spark, sf_dir, "orders")
    return chi2_independence(orders, "o_orderstatus", "o_orderpriority")


# ---------------------------------------------------------------------------
# X74 — winsorized robust aggregation (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "winsorized_price_by_priority",
    """
    WITH pct AS (
      SELECT o_orderpriority AS g,
             quantile_cont(o_totalprice, 0.05) AS plo,
             quantile_cont(o_totalprice, 0.95) AS phi
      FROM orders GROUP BY 1),
    r AS (SELECT o.o_orderpriority AS g, o.o_totalprice::DOUBLE AS v,
                 p.plo, p.phi
          FROM orders o JOIN pct p ON p.g = o.o_orderpriority)
    SELECT g AS o_orderpriority, count(*)::BIGINT AS n,
           floor(min(plo) * 10000 + 0.5) / 10000 AS p_lo,
           floor(min(phi) * 10000 + 0.5) / 10000 AS p_hi,
           floor(avg(v) * 10000 + 0.5) / 10000 AS mean_raw,
           floor(avg(least(greatest(v, plo), phi)) * 10000 + 0.5) / 10000
             AS mean_winsorized
    FROM r GROUP BY g
    """,
)
def winsorized_price_by_priority(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X74 — per-priority winsorized mean of order totals: values
    clamped to the group's interpolated [p05, p95] before averaging —
    the robust-mean pass that tames heavy tails without dropping rows.
    Exact interpolated ``percentile`` here; at 100 TB the same plan
    takes ``percentile_approx`` (identical shape, sketch-mergeable).
    Both engines interpolate percentiles linearly on the sorted
    values, so the clamp bounds agree."""
    from sync_cosmos_db_spark.operators.profiling import winsorized_stats

    orders = load_table(spark, sf_dir, "orders")
    return winsorized_stats(orders, "o_orderpriority", "o_totalprice",
                            lo=0.05, hi=0.95)


# ---------------------------------------------------------------------------
# X75 — positional phrase search (operators/retrieval.py)
# ---------------------------------------------------------------------------

@query(
    "phrase_search_table_table",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                      generate_subscripts(string_split(text, ' '), 1) AS i
               FROM documents),
    l AS (SELECT doc_id, i, tok,
                 lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t1
          FROM t)
    SELECT doc_id, count(*)::BIGINT AS n_matches,
           min(i)::BIGINT AS first_pos
    FROM l WHERE tok = 'table' AND t1 = 'table'
    GROUP BY doc_id
    """,
)
def phrase_search_table_table(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X75 — exact phrase search via the positional-inverted-index
    intersection (``retrieval.phrase_search``): candidate postings
    filtered per term, aligned to the phrase start, k-way equi-joined
    on (doc, start).  The phrase 'table table' has a REPEATED term —
    the degenerate case where one occurrence list must satisfy two
    offsets — and the oracle recomputes matches with an entirely
    different mechanism (adjacency via lead window), so agreement
    pins the intersection logic, not a shared shortcut."""
    from sync_cosmos_db_spark.operators.retrieval import phrase_search

    docs = load_table(spark, sf_dir, "documents")
    return phrase_search(docs, "table table")


# ---------------------------------------------------------------------------
# X76 — functional-dependency audit (operators/expectations.py)
# ---------------------------------------------------------------------------

@query(
    "fd_audit_docs_orders",
    """
    WITH d1 AS (SELECT source AS l, count(DISTINCT lang) AS nr
                FROM documents GROUP BY 1),
    d2 AS (SELECT lang AS l, count(DISTINCT source) AS nr
           FROM documents GROUP BY 1),
    d3 AS (SELECT o_custkey AS l, count(DISTINCT o_orderstatus) AS nr
           FROM orders GROUP BY 1)
    SELECT 'source->lang' AS fd, count(*)::BIGINT AS n_lhs,
           sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_violating_lhs,
           max(nr)::BIGINT AS max_rhs_per_lhs FROM d1
    UNION ALL
    SELECT 'lang->source', count(*)::BIGINT,
           sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END)::BIGINT,
           max(nr)::BIGINT FROM d2
    UNION ALL
    SELECT 'o_custkey->o_orderstatus', count(*)::BIGINT,
           sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END)::BIGINT,
           max(nr)::BIGINT FROM d3
    """,
)
def fd_audit_docs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X76 — functional-dependency audit
    (``expectations.fd_violations``): candidate FDs checked by
    counting lhs values mapping to >1 distinct rhs — the
    key-discovery / schema-inference pass.  'source->lang' holds or
    nearly holds on the corpus; its inverse and the customer→status
    candidates are heavily violated, so both branches of the verdict
    are exercised.  Each FD is one lhs-keyed groupBy over a 2-column
    pruned scan."""
    from sync_cosmos_db_spark.operators.expectations import fd_violations

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    return (fd_violations(docs, [("source", "lang"), ("lang", "source")])
            .unionByName(fd_violations(
                orders, [("o_custkey", "o_orderstatus")])))


# ---------------------------------------------------------------------------
# X77 — categorical entropy profiling (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "entropy_profile_categoricals",
    """
    WITH pairs AS (
      SELECT 'lang' AS column_name, lang AS val FROM documents
      UNION ALL SELECT 'source', source FROM documents
      UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
      UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
    counts AS (SELECT column_name, val, count(*)::DOUBLE AS c
               FROM pairs GROUP BY 1, 2),
    tot AS (SELECT column_name, sum(c) AS n FROM counts GROUP BY 1),
    r AS (SELECT counts.column_name, c / n AS p
          FROM counts JOIN tot USING (column_name))
    SELECT column_name, count(*)::BIGINT AS n_distinct,
           floor(sum(-p * log2(p)) * 10000 + 0.5) / 10000 AS entropy_bits,
           floor((1.0 - sum(p * p)) * 10000 + 0.5) / 10000 AS gini
    FROM r GROUP BY column_name
    """,
)
def entropy_profile_categoricals(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X77 — Shannon entropy + Gini impurity per categorical column
    (``profiling.categorical_entropy``): the degenerate-column
    detector (entropy 0 ⇒ constant, log2(n_distinct) ⇒ uniform ⇒
    likely an id).  All columns of a table profile in ONE scan — each
    row explodes into (column, value) pairs in-row, one groupBy
    counts, one re-aggregate of the tiny count table computes the
    stats."""
    from sync_cosmos_db_spark.operators.profiling import (
        categorical_entropy,
    )

    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    return (categorical_entropy(docs, ["lang", "source"])
            .unionByName(categorical_entropy(
                orders, ["o_orderstatus", "o_orderpriority"])))


# ---------------------------------------------------------------------------
# X78 — Z-order clustered layout (sinks.py)
# ---------------------------------------------------------------------------

@query(
    "zorder_roundtrip_documents",
    """
    SELECT doc_id, n_chars, lang, sha256(text) AS text_sha
    FROM documents
    """,
)
def zorder_roundtrip_documents(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """X78 — Z-order clustered rewrite (``sinks.write_zordered``):
    documents laid out by the Morton interleave of (n_chars, doc_id)
    bit-scaled ranks, then read back.  The oracle asserts the layout
    pass moved BYTES, not VALUES (identity content round-trip); the
    clustering claim itself — per-file min-max ranges narrow on both
    dimensions, which is what makes either predicate prune files at
    100 TB — is pinned by ``tests/test_sinks.py``."""
    import os
    import tempfile

    from sync_cosmos_db_spark.sinks import write_zordered

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="zorder_"), "docs.parquet")
    write_zordered(docs, path, ["n_chars", "doc_id"], num_files=8)
    back = spark.read.parquet(path)
    return back.select("doc_id", "n_chars", "lang",
                       F.sha2(F.col("text"), 256).alias("text_sha"))
