"""Full TPC-H-shaped relational coverage, part 2 (queries q2-q22 not in
``queries_relational.py``) — SURVEY.md §2.2 categories A1-A6.

The reference engine has no relational query surface at all (its only
query strings are ``COUNT(1)`` and ``SELECT *`` pushed to the server —
SURVEY §2.2 absence record); this module completes the 22-query TPC-H
pattern set so a reference user gets the *entire* standard analytic
repertoire: correlated-min lookups, multi-way star joins, market-share
ratios, HAVING-over-scalar-subquery, decorrelated EXISTS/NOT-EXISTS,
and anti-join "customers without X" shapes.

Adapted to the harness schema (TESTDATA.md): there is no ``partsupp``
table, so part↔supplier relationships ride the ``lineitem`` bridge; no
``l_commitdate``/``l_receiptdate``/``l_shipmode``/``c_phone``/
``p_container`` columns, so those predicates are re-expressed over the
columns that exist (``l_returnflag`` as the line class, ``c_nationkey``
as the country code, ``p_type``/``p_size`` as the part class). Every
query keeps the *plan shape* of its TPC-H namesake — that is what the
scale analysis cares about.

Oracle-parity rules (tests/oracle_utils.py): money SUMS use ``fsum``
(per-row integer-cents snap, exact BIGINT accumulation — a double sum
rounded at cents reorder-flips between engines at scale; round-10
audit, SCALING.md); other floats rounded in-query on BOTH sides with
``fround``; thresholds derived from aggregates are computed from exact
integer sums and rounded BEFORE comparison so both engines compare
identical doubles; years cast to BIGINT; every computed column aliased
identically in Spark and SQL.

Scale notes on each query: what broadcasts, what shuffles, and why the
plan survives a 1000-executor / 100 TB scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import fround, fsum, query
from sync_cosmos_db_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Q2: correlated-min supplier lookup ------------------------------------

@query(
    "q2_min_cost_supplier",
    """
    WITH bridge AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
             l.l_extendedprice
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'SMALL'
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
           floor(l_extendedprice * 100 + 0.5) / 100 AS min_price
    FROM (SELECT b.*, min(l_extendedprice) OVER (PARTITION BY p_partkey)
                 AS mn
          FROM bridge b)
    WHERE l_extendedprice = mn
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each in-region part of a type, the supplier(s)
    offering the minimum price — the correlated MIN subquery, decorrelated
    as a window-min over the same partition (one shuffle on p_partkey,
    no self-join). nation/region broadcast; the min compares STORED
    doubles (no computed-sum ulp risk), so equality is cross-engine
    deterministic."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    bridge = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
            li.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
                "l_extendedprice"))
    mn = F.min("l_extendedprice").over(W.partitionBy("p_partkey"))
    return (bridge.withColumn("mn", mn)
            .filter(F.col("l_extendedprice") == F.col("mn"))
            .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
                    fround(F.col("l_extendedprice"), 2).alias("min_price")))


# --- Q7: volume shipping between two nations -------------------------------

@query(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           sum(floor(volume * 100 + 0.5)::BIGINT) / 100.0 AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l.l_shipdate)::BIGINT AS l_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l.l_shipdate >= TIMESTAMP '1995-01-01'
            AND l.l_shipdate < TIMESTAMP '1997-01-01') AS shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year. Both nation dims
    broadcast; the nation-pair predicate lands on the joined rows BEFORE
    the orders⋈customer shuffle via broadcast-hash semi-filtering, so
    only the two nations' rows reach the wide join. lineitem⋈orders is
    the one big shuffle (on orderkey) — unavoidable and key-balanced."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "supp_nation")
    n2 = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "cust_nation")
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") \
        | (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.n_nationkey)
        .join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
             .alias("revenue")))


# --- Q8: national market share ---------------------------------------------

@query(
    "q8_market_share",
    """
    SELECT o_year,
           floor((sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                  / sum(volume)) * 10000 + 0.5) / 10000 AS mkt_share
    FROM (SELECT year(o.o_orderdate)::BIGINT AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n2.n_name AS nation
          FROM part p
          JOIN lineitem l ON l.l_partkey = p.p_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n1.n_regionkey
          JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
            AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                  AND TIMESTAMP '1996-12-31') AS all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of in-region revenue by order
    year — conditional-sum ratio. Every dimension (part, supplier,
    nation×2, region) broadcasts; lineitem⋈orders is again the single
    big shuffle. The ratio is rounded in-query (4 dp) so double-sum
    ordering differences between engines collapse."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") <= "1996-12-31"))
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation")
    n2 = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    natvol = F.when(F.col("nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == n2.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(fround(F.sum(natvol) / F.sum(vol), 4).alias("mkt_share")))


# --- Q9: product-type profit by nation and year ----------------------------

@query(
    "q9_product_type_profit",
    """
    SELECT nation, o_year,
           sum(floor(amount * 100 + 0.5)::BIGINT) / 100.0 AS sum_profit
    FROM (SELECT n.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
                 l.l_extendedprice * (1 - l.l_discount)
                   - 0.4 * p.p_retailprice * l.l_quantity AS amount
          FROM part p
          JOIN lineitem l ON l.l_partkey = p.p_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          WHERE p.p_name LIKE '%red%') AS profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year for a part
    family. No partsupp table in the harness, so supply cost is proxied
    as 0.4·p_retailprice·quantity (the plan shape — 5-way join with a
    LIKE-filtered part dim — is unchanged). part/supplier/nation
    broadcast; the LIKE filter shrinks part before the join."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.4 * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("nation", "o_year")
        .agg(fsum(amount, 2).alias("sum_profit")))


# --- Q11: important stock (HAVING over scalar subquery) --------------------

@query(
    "q11_important_stock",
    """
    WITH v AS (
      SELECT l.l_partkey,
             sum(floor(l.l_extendedprice * l.l_quantity * 100 + 0.5)::BIGINT)
               / 100.0 AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey)
    SELECT l_partkey, value
    FROM v
    WHERE value > (SELECT floor(0.001 * (sum(floor(value * 100 + 0.5)::BIGINT)
                                         / 100.0) * 100 + 0.5) / 100 FROM v)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part in-region inventory value, keeping parts
    above a fraction of the global total — HAVING over a scalar
    subquery. Per-part values are rounded BEFORE both the global sum and
    the comparison, so both engines compare identical doubles. Scale:
    one shuffle for the groupBy; the global total is a one-row broadcast
    (crossJoin of an aggregate), never a driver collect."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
          .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .select("s_suppkey"))
    v = (li.join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
         .groupBy("l_partkey")
         .agg(fsum(F.col("l_extendedprice") * F.col("l_quantity"), 2)
              .alias("value")))
    thresh = v.agg(fround(0.001 * fsum("value", 2), 2).alias("__thresh"))
    return (v.crossJoin(F.broadcast(thresh))
            .filter(F.col("value") > F.col("__thresh"))
            .select("l_partkey", "value"))


# --- Q12: line class vs order priority -------------------------------------

@query(
    "q12_priority_by_line_class",
    """
    SELECT l.l_returnflag AS line_class,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_by_line_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: high/low-priority order counts per line class
    (no l_shipmode column — l_returnflag is the stand-in; the
    conditional-count-after-join plan is identical). The shipdate +
    class filters push to the lineitem scan before the orderkey
    shuffle."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_returnflag").alias("line_class"))
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


# --- Q13: customer order-count distribution --------------------------------

@query(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) AS c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts with a
    filtered LEFT join (customers whose only orders are urgent must
    appear with count 0 — an inner join would drop them, which is the
    classic Q13 trap). Two shuffles: custkey for the join+count, c_count
    for the histogram; the second input is one row per customer."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


# --- Q15: top supplier (max scalar subquery) -------------------------------

@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT)
               / 100.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    equality against a MAX scalar subquery. Revenue is rounded BEFORE
    the max and the equality so sum-order ulp drift can't flip the
    winner across engines. The max is a one-row broadcast; supplier
    broadcasts into the final join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    s = _t(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(fsum(F.col("l_extendedprice")
                     * (1 - F.col("l_discount")), 2)
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("__mx"))
            .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue"))


# --- Q16: supplier count by part attributes (NOT IN subquery) --------------

@query(
    "q16_parts_supplier_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class,
    excluding a supplier denylist (negative balance stands in for the
    complaints LIKE — no comment column). NOT IN over a non-null key is
    a left-anti broadcast join; count(DISTINCT) shuffles once on the
    group keys with suppkey carried for the distinct."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    li = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


# --- Q17: small-quantity revenue (correlated AVG subquery) -----------------

@query(
    "q17_small_quantity_revenue",
    """
    WITH pa AS (
      SELECT l_partkey,
             floor(0.2 * avg(l_quantity) * 10000 + 0.5) / 10000 AS qty_thresh
      FROM lineitem GROUP BY l_partkey)
    SELECT floor(sum(floor(l.l_extendedprice * 100 + 0.5)::BIGINT) / 7.0
                 + 0.5) / 100.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_type = 'SMALL'
      AND l.l_quantity < pa.qty_thresh
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity lines —
    the correlated AVG subquery, decorrelated as an aggregate-then-join
    on partkey. Quantities are integer-valued doubles, so the per-part
    AVG is exact in both engines; the threshold is rounded anyway as
    defense. Scale: the per-part aggregate is tiny (one row per part)
    and broadcasts back into the lineitem join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "SMALL"))
    pa = (li.groupBy(F.col("l_partkey").alias("pa_partkey"))
          .agg(fround(0.2 * F.avg("l_quantity"), 4).alias("qty_thresh")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(pa), li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((F.floor(F.sum(F.floor(F.col("l_extendedprice") * 100
                                    + F.lit(0.5)).cast("long")) / 7.0
                      + F.lit(0.5)) / 100.0).alias("avg_yearly")))


# --- Q19: disjunctive multi-attribute predicates ---------------------------

@query(
    "q19_disjunctive_revenue",
    """
    SELECT sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                     + 0.5)::BIGINT) / 100.0 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst
    extracts the common p_brand-IN/p_size range as a pushable filter on
    part (CNF conversion) so the broadcast side shrinks before the join;
    the residual disjunction evaluates post-join in codegen."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#25") & F.col("p_size").between(1, 15)
           & q.between(20, 30)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(fsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")), 2)
                 .alias("revenue")))


# --- Q20: suppliers of a part family above a volume threshold --------------

@query(
    "q20_red_part_suppliers",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 300)
    """,
)
def q20_red_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved more than a threshold volume
    of a part family in a year — nested IN subqueries become a semi-join
    chain: part-family filter semi-joins lineitem, the HAVING aggregate
    produces the qualifying suppkey set, and supplier semi-joins that.
    Quantity sums are exact integers — the HAVING is deterministic.
    Every semi-join side here is small and broadcasts."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    red = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    qualifying = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 300)
        .select("l_suppkey"))
    return (s.join(F.broadcast(qualifying),
                   s.s_suppkey == F.col("l_suppkey"), "left_semi")
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("s_suppkey", "s_name", "n_name"))


# --- Q21: sole-returning supplier (EXISTS + NOT EXISTS) --------------------

@query(
    "q21_sole_returning_supplier",
    """
    WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem
                WHERE l_returnflag = 'R')
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_sole_returning_supplier(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, count finished multi-supplier
    orders where THIS supplier's line was the only one returned
    (l_returnflag='R' stands in for the receipt-after-commit lateness —
    no receipt/commit dates in the harness). EXISTS → left-semi and
    NOT EXISTS → left-anti, both equi-keyed on orderkey with the
    suppkey inequality as the join residual — SortMergeJoin with a
    post-condition, no cartesian anywhere."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R") \
        .select(F.col("l_orderkey").alias("o_key"),
                F.col("l_suppkey").alias("s_key"))
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l2 = li.select(F.col("l_orderkey").alias("l2_okey"),
                   F.col("l_suppkey").alias("l2_skey"))
    l3 = li.filter(F.col("l_returnflag") == "R") \
        .select(F.col("l_orderkey").alias("l3_okey"),
                F.col("l_suppkey").alias("l3_skey"))
    waiting = (
        l1.join(o, l1.o_key == o.o_orderkey, "left_semi")
        .join(l2, (F.col("o_key") == F.col("l2_okey"))
              & (F.col("s_key") != F.col("l2_skey")), "left_semi")
        .join(l3, (F.col("o_key") == F.col("l3_okey"))
              & (F.col("s_key") != F.col("l3_skey")), "left_anti"))
    return (waiting.join(F.broadcast(s), F.col("s_key") == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))


# --- Q22: dormant high-balance customers (anti-join + AVG subquery) --------

@query(
    "q22_dormant_customers",
    """
    WITH pot AS (
      SELECT c_custkey, c_acctbal, c_nationkey % 5 AS cntrycode
      FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)),
    thresh AS (
      SELECT floor(sum(floor(c_acctbal * 100 + 0.5)::BIGINT)::DOUBLE
                   / count(*) * 100 + 0.5) / 10000 AS a
      FROM pot WHERE c_acctbal > 0.0)
    SELECT cntrycode, count(*) AS numcust,
           sum(floor(c_acctbal * 100 + 0.5)::BIGINT) / 100.0 AS totacctbal
    FROM pot, thresh
    WHERE pot.c_acctbal > thresh.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pot.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, grouped by country code (c_nationkey % 5 — no phone column;
    every sf0.01 customer has SOME order, so the anti-condition is
    'no urgent order' to keep the anti-join shape populated). The AVG
    threshold is rounded before comparison; the NOT EXISTS is a
    left-anti join on custkey against the filtered orders."""
    c = _t(spark, sf_dir, "customer")
    pot = (c.filter(F.pmod(F.col("c_nationkey"), F.lit(5)).isin(0, 1, 2))
           .select("c_custkey", "c_acctbal",
                   F.pmod(F.col("c_nationkey"), F.lit(5)).alias("cntrycode")))
    bal_cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    thresh = (pot.filter(F.col("c_acctbal") > 0.0)
              .agg((F.floor(F.sum(bal_cents).cast("double")
                            / F.count("*") * 100 + F.lit(0.5)) / 10000)
                   .alias("__a")))
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        pot.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .join(urgent, pot.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"),
             fsum("c_acctbal", 2).alias("totacctbal")))
