"""Round-5 extension operators (X72–X87): calendar-decay EWMA
smoothing, chi-square independence audit, winsorized robust
aggregation, positional phrase search, functional-dependency audit,
categorical entropy profiling, Z-order clustered layout, PSI/KS drift
detection, Benford audit, MAD outliers, equi-depth revenue deciles,
pivoted crosstab, last-touch attribution, rolling distinct actives,
vocabulary-growth profile, and key-skew diagnostics.

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


# ---------------------------------------------------------------------------
# X79 — PSI + binned-KS drift (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "drift_orders_price_halves",
    """
    WITH b AS (
      SELECT greatest(0, least(floor(o_totalprice / 30000), 19))::BIGINT
               AS bucket,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS is_a
      FROM orders),
    c AS (SELECT bucket, sum(is_a)::DOUBLE AS ca,
                 sum(1 - is_a)::DOUBLE AS cb
          FROM b GROUP BY 1),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
    r AS (SELECT bucket, ca, cb, na, nb,
                 greatest(ca / na, 1e-6) AS pa,
                 greatest(cb / nb, 1e-6) AS pb,
                 sum(ca / na) OVER (ORDER BY bucket) AS cdf_a,
                 sum(cb / nb) OVER (ORDER BY bucket) AS cdf_b
          FROM c CROSS JOIN t)
    SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
           floor(sum((pa - pb) * ln(pa / pb)) * 10000 + 0.5) / 10000
             AS psi,
           floor(max(abs(cdf_a - cdf_b)) * 10000 + 0.5) / 10000 AS ks
    FROM r
    """,
)
def drift_orders_price_halves(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """X79 — train/serve drift audit (``profiling.psi_ks_drift``):
    PSI + binned KS between pre-1998 and post-1998 order totals over
    20 fixed [0, 600k] bins.  Binned KS is the deliberate 100 TB
    choice — exact KS needs a global total order; the binned CDF gap
    is a constant-size aggregate.  The oracle recomputes both
    statistics from a conditional-sum contingency table rather than a
    two-sided outer join, so agreement pins the semantics."""
    from sync_cosmos_db_spark.operators.profiling import psi_ks_drift

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    return psi_ks_drift(orders.filter(F.col("o_orderdate") < cut),
                        orders.filter(F.col("o_orderdate") >= cut),
                        "o_totalprice", lo=0.0, hi=600000.0, n_buckets=20)


# ---------------------------------------------------------------------------
# X80 — Benford first-digit audit (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "benford_order_prices",
    """
    WITH d AS (
      SELECT floor(o_totalprice / pow(10, floor(log10(o_totalprice))))
               ::BIGINT AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, count(*)::DOUBLE AS c FROM d GROUP BY 1),
    t AS (SELECT sum(c) AS n_tot FROM c)
    SELECT digit, c::BIGINT AS n,
           floor(c / n_tot * 10000 + 0.5) / 10000 AS obs_p,
           floor(log10(1.0 + 1.0 / digit) * 10000 + 0.5) / 10000 AS exp_p,
           floor(abs(c / n_tot - log10(1.0 + 1.0 / digit)) * 10000 + 0.5)
             / 10000 AS abs_dev
    FROM c CROSS JOIN t
    """,
)
def benford_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X80 — Benford first-significant-digit audit
    (``profiling.benford_audit``) over order totals: observed leading-
    digit frequencies vs log10(1 + 1/d).  The digit is derived
    arithmetically (never via string formatting) so both engines
    compute it from the same IEEE double; one scan, one ≤9-row
    shuffle."""
    from sync_cosmos_db_spark.operators.profiling import benford_audit

    return benford_audit(load_table(spark, sf_dir, "orders"),
                         "o_totalprice")


# ---------------------------------------------------------------------------
# X81 — MAD robust outliers (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "mad_outlier_prices",
    """
    WITH med AS (
      SELECT o_orderpriority AS g,
             quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY 1),
    j AS (SELECT o.o_orderpriority AS g, o.o_totalprice::DOUBLE AS v,
                 m.med
          FROM orders o JOIN med m ON m.g = o.o_orderpriority),
    mad AS (SELECT g, quantile_cont(abs(v - med), 0.5) AS mad
            FROM j GROUP BY 1)
    SELECT j.g AS o_orderpriority, count(*)::BIGINT AS n,
           floor(max(j.med) * 10000 + 0.5) / 10000 AS med,
           floor(max(mad.mad) * 10000 + 0.5) / 10000 AS mad,
           sum(CASE WHEN CASE WHEN mad.mad > 0
                         THEN abs(0.6745 * (v - j.med) / mad.mad) > 3.5
                         ELSE v <> j.med END
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
    FROM j JOIN mad ON mad.g = j.g
    GROUP BY 1
    """,
)
def mad_outlier_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X81 — median-absolute-deviation outlier flags
    (``profiling.mad_outliers``): per-priority modified z-score
    0.6745·(x−med)/MAD with the Iglewicz–Hoaglin 3.5 cutoff — the
    50%-breakdown robust sibling of the IQR fence (X29).  Two
    group-keyed interpolated-percentile aggregates + broadcast joins;
    at 100 TB the identical plan takes ``percentile_approx``."""
    from sync_cosmos_db_spark.operators.profiling import mad_outliers

    return mad_outliers(load_table(spark, sf_dir, "orders"),
                        "o_orderpriority", "o_totalprice")


# ---------------------------------------------------------------------------
# X82 — equi-depth revenue deciles (broadcast-threshold bucketing)
# ---------------------------------------------------------------------------

@query(
    "revenue_decile_profile",
    """
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS spend
      FROM orders GROUP BY 1),
    b AS (SELECT quantile_cont(spend,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
            AS bounds FROM spend),
    d AS (SELECT o_custkey, spend,
                 (len(list_filter(bounds, x -> spend > x)) + 1)::BIGINT
                   AS decile
          FROM spend CROSS JOIN b)
    SELECT decile, count(*)::BIGINT AS n_customers,
           floor(sum(spend) * 10000 + 0.5) / 10000 AS total_spend,
           floor(min(spend) * 10000 + 0.5) / 10000 AS min_spend,
           floor(max(spend) * 10000 + 0.5) / 10000 AS max_spend
    FROM d GROUP BY decile
    """,
)
def revenue_decile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X82 — customer-revenue deciles WITHOUT a global sort: the naive
    NTILE(10) needs a single-partition total order over every
    customer; here the nine interpolated decile boundaries come from
    ONE single-row percentile aggregate, broadcast back, and each row
    buckets itself by comparison (`1 + #bounds below`) — the
    equi-depth histogram shape that survives a 15B-customer table.
    Ties share a decile (unlike NTILE's arbitrary split), which is
    the semantics a revenue-band report actually wants."""
    spend = (load_table(spark, sf_dir, "orders")
             .groupBy("o_custkey")
             .agg(F.sum("o_totalprice").alias("spend")))
    qs = [i / 10 for i in range(1, 10)]
    bounds = spend.agg(F.expr(
        f"percentile(spend, array({', '.join(str(q) for q in qs)}))")
        .alias("bounds"))
    p = 10 ** 4
    d = (spend.crossJoin(F.broadcast(bounds))
         .withColumn("decile",
                     (F.size(F.filter(
                         "bounds",
                         lambda x: F.col("spend") > x)) + 1).cast("long")))
    return (d.groupBy("decile")
            .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                 (F.floor(F.sum("spend") * p + F.lit(0.5)) / p)
                 .alias("total_spend"),
                 (F.floor(F.min("spend") * p + F.lit(0.5)) / p)
                 .alias("min_spend"),
                 (F.floor(F.max("spend") * p + F.lit(0.5)) / p)
                 .alias("max_spend")))


# ---------------------------------------------------------------------------
# X83 — pivoted crosstab (Catalyst pivot)
# ---------------------------------------------------------------------------

@query(
    "pivot_priority_by_status",
    """
    SELECT o_orderpriority,
           sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT
             AS n_f,
           sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT
             AS n_o,
           sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT
             AS n_p
    FROM orders GROUP BY 1
    """,
)
def pivot_priority_by_status(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X83 — crosstab via Catalyst ``pivot`` with EXPLICIT pivot
    values: passing the value list skips the extra distinct-values
    job a bare ``pivot(col)`` runs and makes the output schema static
    — the form that's safe to run unattended at scale.  The oracle is
    the CASE-WHEN expansion pivot desugars to."""
    orders = load_table(spark, sf_dir, "orders")
    pv = (orders.groupBy("o_orderpriority")
          .pivot("o_orderstatus", ["F", "O", "P"])
          .agg(F.count(F.lit(1))))
    return (pv.select("o_orderpriority",
                      F.coalesce(F.col("F"), F.lit(0)).cast("long")
                      .alias("n_f"),
                      F.coalesce(F.col("O"), F.lit(0)).cast("long")
                      .alias("n_o"),
                      F.coalesce(F.col("P"), F.lit(0)).cast("long")
                      .alias("n_p")))


# ---------------------------------------------------------------------------
# X84 — last-touch attribution (operators/behavioral.py)
# ---------------------------------------------------------------------------

@query(
    "attribution_last_touch",
    """
    WITH fc AS (
      SELECT user_id, min(ts) AS conv_ts
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    t AS (SELECT e.user_id, e.ts, e.event_id, e.event_type
          FROM events e JOIN fc USING (user_id)
          WHERE e.event_type <> 'purchase' AND e.ts < fc.conv_ts),
    lt AS (SELECT user_id, event_type AS channel FROM (
             SELECT user_id, event_type,
                    row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC)
                      AS rn
             FROM t) WHERE rn = 1)
    SELECT coalesce(lt.channel, 'direct') AS channel,
           count(*)::BIGINT AS n_converters
    FROM fc LEFT JOIN lt USING (user_id)
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X84 — last-touch conversion attribution
    (``behavioral.last_touch_attribution``): each converter's credit
    goes to the last non-purchase event before their first purchase
    ('direct' when none).  The Spark plan picks the touch with a
    user-keyed max-struct aggregate (no window over raw events); the
    oracle picks it with a row_number window — two mechanisms, one
    answer."""
    from sync_cosmos_db_spark.operators.behavioral import (
        last_touch_attribution,
    )

    return last_touch_attribution(load_table(spark, sf_dir, "events"),
                                  "purchase")


# ---------------------------------------------------------------------------
# X85 — rolling distinct actives (operators/behavioral.py)
# ---------------------------------------------------------------------------

@query(
    "rolling_7d_active_users",
    """
    WITH ud AS (SELECT DISTINCT user_id AS u, ts::DATE AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    r AS (SELECT days.d AS day, ud.u
          FROM days JOIN ud ON ud.d <= days.d AND ud.d > days.d - 7)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           count(DISTINCT u)::BIGINT AS active_users
    FROM r GROUP BY 1
    """,
)
def rolling_7d_active_users(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X85 — trailing-7-day distinct active users
    (``behavioral.rolling_active_users``): the WAU board metric.  A
    rolling DISTINCT can't ride a window frame, and the day×events
    range join the oracle runs is quadratic — the Spark plan instead
    dedups to (user, day) pairs FIRST, explodes each pair onto the
    ≤7 days it keeps the user active (bounded in-row expansion of the
    already-shrunk table), and runs one day-keyed distinct count."""
    from sync_cosmos_db_spark.operators.behavioral import (
        rolling_active_users,
    )

    out = rolling_active_users(load_table(spark, sf_dir, "events"),
                               window_days=7)
    return out.select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                      "active_users")


# ---------------------------------------------------------------------------
# X86 — vocabulary-growth profile (operators/text.py)
# ---------------------------------------------------------------------------

@query(
    "vocab_growth_documents",
    """
    WITH toks AS (
      SELECT floor(doc_id / 50)::BIGINT AS bucket,
             unnest(regexp_split_to_array(text, '\\s+')) AS tok
      FROM documents),
    tf AS (SELECT bucket, tok FROM toks WHERE tok <> ''),
    pt AS (SELECT tok, min(bucket) AS fb FROM tf GROUP BY 1),
    vol AS (SELECT bucket, count(*) AS n_tokens FROM tf GROUP BY 1),
    news AS (SELECT fb AS bucket, count(*) AS new_types
             FROM pt GROUP BY 1),
    j AS (SELECT vol.bucket, n_tokens, coalesce(new_types, 0) AS new_types
          FROM vol LEFT JOIN news USING (bucket))
    SELECT bucket,
           (sum(n_tokens) OVER (ORDER BY bucket))::BIGINT AS cum_tokens,
           (sum(new_types) OVER (ORDER BY bucket))::BIGINT AS cum_vocab,
           new_types::BIGINT AS new_types
    FROM j
    """,
)
def vocab_growth_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X86 — Heaps'-law vocabulary growth (``text.vocab_growth``):
    cumulative distinct vocabulary and token volume per 50-doc ingest
    bucket.  The corpus shuffles ONCE (token-keyed, carrying only
    (min_bucket, count) per type); cumulative vocab at bucket b falls
    out of the first-occurrence identity #\\{types: min_bucket ≤ b\\} —
    never a per-prefix re-count.  A flattening curve = more data buys
    no new vocabulary; a jump = an ingest batch with a tokenizer or
    encoding regression."""
    from sync_cosmos_db_spark.operators.text import vocab_growth

    return vocab_growth(load_table(spark, sf_dir, "documents"),
                        bucket_size=50)


# ---------------------------------------------------------------------------
# X87 — key-skew diagnostics (operators/profiling.py)
# ---------------------------------------------------------------------------

@query(
    "skew_histogram_events_users",
    """
    WITH c AS (SELECT user_id, count(*)::DOUBLE AS c
               FROM events GROUP BY 1)
    SELECT floor(log2(c) + 1e-9)::BIGINT AS count_bucket,
           count(*)::BIGINT AS n_keys,
           sum(c)::BIGINT AS total_rows,
           max(c)::BIGINT AS max_count
    FROM c GROUP BY 1
    """,
)
def skew_histogram_events_users(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X87 — shuffle-skew pre-flight (``profiling.key_skew_histogram``):
    per-user event counts bucketed into powers of two — the histogram
    an operator reads to decide salt-vs-broadcast before a user-keyed
    join at scale (a populated high bucket = straggler partitions).
    One key-keyed count with map-side partials, then a ≤64-row
    re-aggregate; the +1e-9 epsilon absorbs sub-ulp libm differences
    at exact powers of two so both engines bucket identically."""
    from sync_cosmos_db_spark.operators.profiling import (
        key_skew_histogram,
    )

    return key_skew_histogram(load_table(spark, sf_dir, "events"),
                              "user_id")
