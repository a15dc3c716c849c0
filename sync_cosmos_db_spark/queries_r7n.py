"""Round-7 operator families (thirteenth batch) X219-X222:
share-of-parent hierarchy rollup, penny-exact M:N allocation,
trigram-index substring search, and time-travel state reconstruction
— the two-level share view beside X95's share-of-total, the
largest-remainder allocation that reconciles to the cent, the
pg_trgm LIKE-acceleration trick with its selectivity audit, and
point-in-time replay of X53's changelog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import fround, query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X219 — share-of-parent rollup
# ---------------------------------------------------------------------------

@query(
    "share_of_parent_nations",
    """
    WITH nr AS (
      SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
             floor(sum(o.o_totalprice) * 100 + 0.5)::BIGINT AS c
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2)
    SELECT region, nation, c / 100.0 AS revenue,
           floor(c::DOUBLE / sum(c) OVER (PARTITION BY region)
                 * 1000000 + 0.5) / 1000000 AS share_of_region,
           floor(sum(c) OVER (PARTITION BY region)::DOUBLE
                 / sum(c) OVER () * 1000000 + 0.5) / 1000000
             AS region_share_of_total
    FROM nr
    """,
)
def share_of_parent_nations(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X219 — two-level hierarchy shares: each nation's revenue
    share of its REGION and each region's share of the total — the
    share-of-parent view X95's flat share-of-total can't express.
    Revenue stays integer cents through both window sums, so the
    shares are ratios of exact integers in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window as W

    nr = (orders.join(cust, orders.o_custkey == cust.c_custkey)
          .join(nation, cust.c_nationkey == nation.n_nationkey)
          .groupBy(F.col("n_regionkey").alias("region"),
                   F.col("c_nationkey").alias("nation"))
          .agg(F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
               .cast("long").alias("c")))
    wr = W.partitionBy("region")
    wt = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return nr.select(
        "region", "nation", (F.col("c") / 100.0).alias("revenue"),
        (F.floor(F.col("c") / F.sum("c").over(wr) * 1000000
                 + F.lit(0.5)) / 1000000).alias("share_of_region"),
        (F.floor(F.sum("c").over(wr) / F.sum("c").over(wt)
                 * 1000000 + F.lit(0.5)) / 1000000)
        .alias("region_share_of_total"))


# ---------------------------------------------------------------------------
# X220 — penny-exact allocation
# ---------------------------------------------------------------------------

@query(
    "allocated_revenue_suppliers",
    """
    WITH p AS (SELECT o_orderkey AS k,
                      floor(o_totalprice * 100 + 0.5)::BIGINT
                        AS cents
               FROM orders),
    n AS (SELECT l_orderkey AS k, count(*)::BIGINT AS n
          FROM lineitem GROUP BY 1),
    a AS (
      SELECT l.l_suppkey,
             p.cents // n.n
             + CASE WHEN row_number() OVER (
                      PARTITION BY l.l_orderkey
                      ORDER BY l.l_linenumber, l.l_suppkey)
                    <= p.cents % n.n THEN 1 ELSE 0 END AS ac
      FROM lineitem l
      JOIN n ON n.k = l.l_orderkey
      JOIN p ON p.k = l.l_orderkey)
    SELECT l_suppkey AS supplier, count(*)::BIGINT AS n_lines,
           sum(ac)::BIGINT AS alloc_cents,
           sum(ac) / 100.0 AS allocated
    FROM a GROUP BY 1
    """,
)
def allocated_revenue_suppliers(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """X220 — order totals allocated penny-exactly across each
    order's lineitems (``profiling.allocate_exact``,
    largest-remainder: cents div n each, the mod-n leftover pennies
    to the lowest (line number, supplier) pairs — (orderkey,
    linenumber) is NOT unique in this corpus, so the supplier
    tiebreak pins every penny that could change a supplier total),
    rolled up per supplier — Σ
    alloc_cents across suppliers equals Σ order cents EXACTLY,
    which float division cannot promise and the tests pin."""
    from sync_cosmos_db_spark.operators.profiling import (
        allocate_exact,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_suppkey", "l_linenumber")
    a = allocate_exact(orders, li, "k", "o_totalprice",
                       ["l_linenumber", "l_suppkey"])
    return (a.groupBy(F.col("l_suppkey").alias("supplier"))
            .agg(F.count("*").cast("long").alias("n_lines"),
                 F.sum("alloc_cents").cast("long")
                 .alias("alloc_cents"),
                 (F.sum("alloc_cents") / 100.0).alias("allocated")))


# ---------------------------------------------------------------------------
# X221 — trigram substring search
# ---------------------------------------------------------------------------

@query(
    "trigram_like_documents",
    """
    WITH pats AS (
      SELECT DISTINCT substr('merge batch', i, 3) AS tri
      FROM (SELECT unnest(generate_series(1,
                     len('merge batch') - 2)) AS i)),
    tri AS (
      SELECT DISTINCT d.doc_id, d.source,
             substr(d.text, i.i, 3) AS tri
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(1,
                      greatest(len(d.text) - 2, 0))) AS i) i
      WHERE substr(d.text, i.i, 3) IN (SELECT tri FROM pats)),
    cand AS (
      SELECT doc_id, source FROM tri
      GROUP BY 1, 2
      HAVING count(*) = (SELECT count(*) FROM pats)),
    ver AS (
      SELECT c.source,
             CASE WHEN contains(d.text, 'merge batch')
                  THEN 1 ELSE 0 END AS m
      FROM cand c JOIN documents d ON d.doc_id = c.doc_id),
    nd AS (SELECT source, count(*)::BIGINT AS n_docs
           FROM documents GROUP BY 1),
    cm AS (SELECT source, count(*)::BIGINT AS n_candidates,
                  sum(m)::BIGINT AS n_matches
           FROM ver GROUP BY 1)
    SELECT nd.source, nd.n_docs,
           coalesce(cm.n_candidates, 0)::BIGINT AS n_candidates,
           coalesce(cm.n_matches, 0)::BIGINT AS n_matches
    FROM nd LEFT JOIN cm USING (source)
    """,
)
def trigram_like_documents(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X221 — LIKE '%merge batch%' through the trigram index
    (``retrieval.trigram_like_search``): candidates must hold every
    pattern trigram, then verify with exact ``contains`` — the
    audit shows per-source candidate vs match counts (index
    selectivity made visible)."""
    from sync_cosmos_db_spark.operators.retrieval import (
        trigram_like_search,
    )

    docs = load_table(spark, sf_dir, "documents")
    return trigram_like_search(docs, "doc_id", "text",
                               "merge batch", group_col="source")


# ---------------------------------------------------------------------------
# X222 — time-travel state reconstruction
# ---------------------------------------------------------------------------

@query(
    "state_asof_orders_seq2",
    """
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
    ch2 AS (SELECT * FROM ch WHERE seq <= 2),
    latest AS (
      SELECT *, row_number() OVER (PARTITION BY k
                                   ORDER BY seq DESC, op ASC) AS rn
      FROM ch2),
    l AS (SELECT * FROM latest WHERE rn = 1)
    SELECT coalesce(l.k, snap.k) AS o_orderkey,
           floor((CASE WHEN l.k IS NOT NULL THEN l.p ELSE snap.p END)
                 * 100 + 0.5) / 100 AS o_totalprice,
           CASE WHEN l.k IS NOT NULL THEN l.s ELSE snap.s END
             AS o_orderstatus
    FROM snap FULL JOIN l ON snap.k = l.k
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
)
def state_asof_orders_seq2(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """X222 — point-in-time (time-travel) reconstruction: X53's
    exact changelog replayed only UP TO sequence 2 — the %7 keys
    show their seq-1 price (the seq-3 update hasn't happened yet),
    the %11 tombstones already apply, the inserts exist.  One
    filter in front of the same ``cdc.apply_changelog`` — time
    travel IS changelog replay with a cutoff, and the oracle
    replays the identical prefix."""
    from sync_cosmos_db_spark.operators.cdc import apply_changelog

    snap = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    k, p, s = (F.col("o_orderkey"), F.col("o_totalprice"),
               F.col("o_orderstatus"))

    def ev(df, key, price, status, seq, op):
        return df.select(key.alias("o_orderkey"),
                         price.alias("o_totalprice"),
                         status.alias("o_orderstatus"),
                         F.lit(seq).alias("seq"),
                         F.lit(op).alias("op"))

    base7 = snap.filter(k % 7 == 0)
    changes = (
        ev(base7, k, p * 1.1, s, 1, "U")
        .unionAll(ev(base7, k, p + 55.5, s, 3, "U"))
        .unionAll(ev(snap.filter(k % 11 == 0), k, p, s, 2, "D"))
        .unionAll(ev(snap.filter(k % 13 == 0), -k, p / 2,
                     F.lit("N"), 1, "U")))
    out = apply_changelog(snap, changes.filter(F.col("seq") <= 2),
                          ["o_orderkey"], "seq")
    return out.select("o_orderkey",
                      fround("o_totalprice", 2).alias("o_totalprice"),
                      "o_orderstatus")
