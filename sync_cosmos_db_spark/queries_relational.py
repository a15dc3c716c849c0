"""Relational coverage queries (SURVEY.md §2.2 categories A1-A6).

The reference implements none of these (absence record in SURVEY §2.2 —
its only query strings are COUNT(1) and SELECT * pushed to the Cosmos
server); they exist so the engine demonstrably supplies the standard
relational surface via Catalyst:

* A1 joins   — inner/left/semi/anti, broadcast-hinted dims, multi-way
* A2 aggs    — sum/avg/min/max, distinct, rollup/cube, conditional pivot
* A3 windows — ranking + running frames
* A4 sorts   — order-by/limit top-k with deterministic tie-breaks
* A5 set ops — union/intersect/except
* A6 scalars — string/date/math/json/array function parity

Oracle-parity rules: money SUMS via ``fsum`` (per-row integer-cents
snap, exact BIGINT accumulation — round-10 audit, SCALING.md), other
floats rounded in-query on BOTH sides, timestamps surfaced as epoch
BIGINT, every computed column aliased identically.

Scale notes are on each query: what shuffles, what broadcasts, what
prunes — the plan we'd want on a 1000-executor cluster, not just the one
that passes at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import fround, fsum, query
from sync_cosmos_db_spark.session import load_table


# --- A2: rich aggregation (TPC-H Q1 shape) ---------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
           sum(floor(l_extendedprice * 100 + 0.5)::BIGINT) / 100.0 AS sum_base_price,
           sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)::BIGINT) / 100.0 AS sum_disc_price,
           floor((avg(l_quantity)) * 10000 + 0.5) / 10000 AS avg_qty,
           floor((avg(l_discount)) * 10000 + 0.5) / 10000 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Scale: partial (map-side) aggregation over ~6 groups
    means the shuffle carries only per-partition partials; the shipdate
    filter pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity"), 2).alias("sum_qty"),
            fsum("l_extendedprice", 2).alias("sum_base_price"),
            fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
            .alias("sum_disc_price"),
            fround(F.avg("l_quantity"), 4).alias("avg_qty"),
            fround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- A1: multi-way join + group + top-k (TPC-H Q3 shape) -------------------

@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)::BIGINT) / 100.0 AS revenue,
           epoch(o.o_orderdate)::BIGINT AS orderdate_epoch,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. Scale: customer (filtered on segment) is the small
    side → broadcast into orders; orders⋈lineitem shuffles on orderkey
    once and the groupBy reuses that partitioning. Top-k via TakeOrdered,
    not a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
             .alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.unix_timestamp("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)::BIGINT) / 100.0 AS revenue
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                                  AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (6-way join). Scale: region/nation/supplier/customer
    are dimension-sized → broadcast; only orders⋈lineitem is a real
    shuffle, keyed on orderkey."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s),
              (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(fsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "join_semi_orders_with_big_items",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 left-semi (EXISTS). Scale: the semi join ships only orderkeys of
    qualifying lineitems; filter pushes to the lineitem scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "join_anti_customers_without_orders",
    """
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 left-anti (NOT EXISTS): customers with no large order. Scale: the
    orders side is filtered then pruned to the single o_custkey column
    before the shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 300000).select("o_custkey"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_broadcast_part_brand",
    """
    SELECT p.p_brand,
           sum(floor(l.l_extendedprice * 100 + 0.5)::BIGINT) / 100.0 AS total_price,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY p_brand
    """,
)
def join_broadcast_part_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 broadcast dim join: part is dimension-sized at any SF ratio →
    explicit broadcast hint removes the shuffle on the fact side entirely;
    the aggregate then needs only its own exchange over ~25 brands."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(fsum("l_extendedprice", 2).alias("total_price"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand")
    )


# --- A3: window functions ---------------------------------------------------

@query(
    "window_topk_orders_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             floor((o_totalprice) * 100 + 0.5) / 100 AS totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 ranking window: top-3 orders per customer. Scale: one shuffle on
    o_custkey; deterministic tie-break on o_orderkey. At 100 TB a skewed
    customer is bounded by the rank cutoff (rn<=3 short-circuits in the
    window operator's sort buffer)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey",
                fround("o_totalprice", 2).alias("totalprice"), "rn")
    )


@query(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           (sum(floor(o_totalprice * 100 + 0.5)::BIGINT) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) / 100.0 AS running_total
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 analytic frame: per-customer running total, deterministically
    ordered (orderdate, orderkey)."""
    o = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return o.select(
        "o_custkey", "o_orderkey",
        (F.sum(cents).over(w) / 100.0).alias("running_total"))


@query(
    "window_lag_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate)::BIGINT AS days_since_prev
    FROM orders
    """,
)
def window_lag_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 lag(): days between consecutive orders per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"))


# --- A4: sort / limit top-k -------------------------------------------------

@query(
    "topk_expensive_lineitems",
    """
    SELECT l_orderkey, l_linenumber, floor((l_extendedprice) * 100 + 0.5) / 100 AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def topk_expensive_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 global top-k. Scale: orderBy+limit compiles to TakeOrderedAndProject
    — per-partition heaps + driver merge of k rows, never a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber",
                  fround("l_extendedprice", 2).alias("price"))
        .orderBy(F.desc("price"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --- A5: set operations -----------------------------------------------------

@query(
    "setop_except_custkeys",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 EXCEPT: customers with open orders but no finished ones."""
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"))
    fin = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey"))
    return open_.subtract(fin).orderBy("custkey")


@query(
    "setop_intersect_custkeys",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"))
    fin = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey"))
    return open_.intersect(fin).orderBy("custkey")


@query(
    "setop_union_nations",
    """
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    UNION
    SELECT DISTINCT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct().orderBy("nationkey")


# --- A2: rollup / cube / distinct aggregates -------------------------------

@query(
    "agg_rollup_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 hierarchical totals via ROLLUP (subtotal + grand-total rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(fround(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"),
                 F.asc_nulls_first("l_linestatus"))
    )


@query(
    "agg_cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT) / 100.0 AS total, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(fsum("o_totalprice", 2).alias("total"),
             F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("o_orderstatus"),
                 F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "agg_distinct_suppliers_per_flag",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 multi-distinct aggregation (expand + two-phase under the hood)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
             F.countDistinct("l_partkey").alias("n_parts"),
             F.count(F.lit(1)).alias("n_rows"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_pivot_qty",
    """
    SELECT l_returnflag,
           floor((sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)) * 100 + 0.5) / 100 AS qty_o,
           floor((sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)) * 100 + 0.5) / 100 AS qty_f
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 pivot — expressed as conditional aggregation so the oracle is
    plain ANSI; Spark's .pivot() compiles to the same plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(fround(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
        .orderBy("l_returnflag")
    )


# --- A6: scalar function parity --------------------------------------------

@query(
    "scalar_string_date_math",
    """
    SELECT o_orderkey,
           upper(o_orderpriority) AS prio_upper,
           substr(o_orderstatus, 1, 1) AS status_c,
           length(o_orderpriority) AS prio_len,
           concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
           year(o_orderdate)::INT AS order_year,
           month(o_orderdate)::INT AS order_month,
           floor((abs(o_totalprice - 100000.0)) * 100 + 0.5) / 100 AS dist_100k,
           o_orderkey % 7 AS key_mod7,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket
    FROM orders
    """,
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 scalar library parity: string/date/math/conditional expressions
    all JVM-side, all inside whole-stage codegen."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        fround(F.abs(F.col("o_totalprice") - 100000.0), 2).alias("dist_100k"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small").alias("bucket"),
    )


@query(
    "scalar_json_extract",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.k')::BIGINT AS k_num
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/O8 dynamic-path JSON extraction (``get_json_object``) — the
    load-bearing primitive for schemaless Cosmos documents (SURVEY §1.3)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.select("event_id", k.alias("k_str"),
                     k.cast("long").alias("k_num"))


@query(
    "scalar_date_trunc_monthly",
    """
    SELECT epoch(date_trunc('month', o_orderdate))::BIGINT AS month_epoch,
           count(*) AS n_orders,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT) / 100.0 AS month_total
    FROM orders GROUP BY 1 ORDER BY month_epoch
    """,
)
def scalar_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate")))
                  .alias("month_epoch"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             fsum("o_totalprice", 2).alias("month_total"))
        .orderBy("month_epoch")
    )


@query(
    "array_embedding_stats",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           floor((list_aggregate(embedding, 'sum')::DOUBLE) * 10000 + 0.5) / 10000 AS vec_sum,
           floor((sqrt(list_aggregate(list_transform(embedding, x -> x*x), 'sum'))::DOUBLE) * 10000 + 0.5) / 10000 AS vec_norm
    FROM embeddings
    """,
)
def array_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 higher-order array functions over ARRAY<FLOAT> — the X3 building
    blocks (aggregate/transform stay JVM-side, no UDF)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vec_sum = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x)
    vec_sq = F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        fround(vec_sum, 4).alias("vec_sum"),
        fround(F.sqrt(vec_sq), 4).alias("vec_norm"),
    )


# --- A2 + skew: explicit salted aggregation --------------------------------

@query(
    "agg_salted_revenue_by_flag",
    """
    SELECT l_returnflag, count(*) AS n,
           sum(floor(l_extendedprice * 100 + 0.5)::BIGINT) / 100.0 AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregation (operators/skew.py) on a
    genuinely skewed key — l_returnflag has 3 distinct values over the
    whole table, the worst case for a naive shuffle. Stage 1 partials on
    (flag, salt); stage 2 combines `buckets` tiny rows per flag. Result
    must equal the plain GROUP BY the oracle runs."""
    from sync_cosmos_db_spark.operators.skew import salted_agg

    li = (load_table(spark, sf_dir, "lineitem")
          .withColumn("__cents",
                      F.floor(F.col("l_extendedprice") * 100
                              + F.lit(0.5)).cast("long")))
    out = salted_agg(li, ["l_returnflag"],
                     {"n": "count", "revenue": "sum:__cents"},
                     buckets=32)
    return out.select("l_returnflag", "n",
                      (F.col("revenue") / 100.0).alias("revenue"))


# --- A1 + temporal: as-of join and bucketed range join ---------------------

@query(
    "asof_join_latest_snapshot",
    """
    WITH snaps AS (
      SELECT user_id, ts, max(value) AS snap_value
      FROM events WHERE event_id % 10 = 0 GROUP BY user_id, ts
    )
    SELECT e.event_id, s.snap_value
    FROM events e
    ASOF LEFT JOIN snaps s ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def asof_join_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.py): each event annotated with the
    latest snapshot value at-or-before its timestamp per user. The
    union-sort single-shuffle form vs DuckDB's native ASOF JOIN."""
    from sync_cosmos_db_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    snaps = (ev.filter(F.col("event_id") % 10 == 0)
             .groupBy("user_id", "ts")
             .agg(F.max("value").alias("snap_value")))
    out = asof_join(ev.select("event_id", "user_id", "ts"), snaps,
                    key="user_id", left_time="ts", right_time="ts",
                    value_cols=["snap_value"])
    return out.select("event_id", "snap_value")


@query(
    "range_join_event_windows",
    """
    WITH iv AS (
      SELECT event_id AS iv_id, ts AS start_ts,
             ts + INTERVAL 2 HOUR AS end_ts
      FROM events WHERE event_id % 50 = 0
    )
    SELECT e.event_id, i.iv_id
    FROM events e JOIN iv i
      ON e.ts >= i.start_ts AND e.ts < i.end_ts
    """,
)
def range_join_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/temporal.py): events matched to 2-hour
    interval windows via bucket equi-join + residual filter — no
    BroadcastNestedLoopJoin (asserted in tests/test_temporal.py)."""
    from sync_cosmos_db_spark.operators.temporal import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    iv = (ev.filter(F.col("event_id") % 50 == 0)
          .select(F.col("event_id").alias("iv_id"),
                  F.col("ts").alias("start_ts"),
                  (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts")))
    out = range_join_bucketed(ev.select("event_id", "ts"), iv,
                              "ts", "start_ts", "end_ts",
                              bucket_width_sec=3600)
    return out.select("event_id", "iv_id")


# --- TPC-H-shaped breadth (adapted to the harness columns) -----------------

@query(
    "q4_priority_with_returns",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts over orders having a matching
    lineitem — left-semi join then aggregate (the EXISTS decorrelation
    Catalyst performs; here written directly as the semi-join)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    return (orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders")))


@query(
    "q6_forecast_revenue",
    """
    SELECT sum(floor(l_extendedprice * l_discount * 100 + 0.5)::BIGINT) / 100.0
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — every predicate pushes to
    the parquet scan; zero shuffles beyond the final single-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24))
        .agg(fsum(F.col("l_extendedprice") * F.col("l_discount"), 2)
             .alias("revenue")))


@query(
    "q10_returned_revenue_by_customer",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           sum(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)::BIGINT)
           / 100.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue_by_customer(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-way join, lost-revenue per customer, top 20.
    nation broadcasts (tiny); customer⋈orders⋈lineitem shuffle on their
    keys; deterministic tie-break on custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(fsum(rev, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_big_part_share",
    """
    SELECT floor((100.0 * sum(CASE WHEN p.p_size > 25
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0 END)
           / sum(l.l_extendedprice * (1 - l.l_discount))) * 10000 + 0.5)
           / 10000 AS big_part_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q14_big_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-share aggregate over a broadcast
    dimension join (part is small)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = F.when(F.col("p_size") > 25, rev).otherwise(F.lit(0.0))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(fround(100.0 * F.sum(cond) / F.sum(rev), 4)
                 .alias("big_part_share_pct")))


@query(
    "q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_totalprice, t.total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150) t
      ON o.o_orderkey = t.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-join (the HAVING subquery runs
    first and shrinks the join input — never join-then-aggregate here)."""
    o = load_table(spark, sf_dir, "orders")
    big = (load_table(spark, sf_dir, "lineitem")
           .groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("total_qty"))
           .filter(F.col("total_qty") > 150))
    return (o.join(big, o.o_orderkey == big.l_orderkey)
            .select("o_orderkey", "o_totalprice", "total_qty")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(50))


# --- exactness + null semantics + window breadth ---------------------------

@query(
    "agg_decimal_exact_sum",
    """
    SELECT o_orderpriority,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_decimal_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/§1.2 DecimalType: exact decimal aggregation — no float drift,
    both engines produce bit-identical sums (unlike DOUBLE sums, which
    need in-query rounding)."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("decimal(38,2)")  # DuckDB's sum(DECIMAL(18,2)) type
                 .alias("total_dec"),
                 F.count(F.lit(1)).alias("n")))


@query(
    "scalar_null_semantics",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_mapped,
           (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL)
             AS is_open,
           CASE WHEN o_totalprice > 100000 THEN o_totalprice END
             IS NULL AS below_100k
    FROM orders
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/§1.2 NULL semantics: NULLIF/COALESCE and null-safe equality
    (Spark `<=>` vs SQL IS NOT DISTINCT FROM)."""
    o = load_table(spark, sf_dir, "orders")
    nn = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.coalesce(nn, F.lit("OPEN")).alias("status_mapped"),
        nn.eqNullSafe(F.lit(None).cast("string")).alias("is_open"),
        F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))
        .isNull().alias("below_100k"))


@query(
    "window_ntile_first_last",
    """
    SELECT o_orderkey,
           ntile(4) OVER w AS price_quartile,
           first_value(o_orderkey) OVER w AS cheapest_key,
           last_value(o_orderkey)
             OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS priciest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: ntile + first_value/last_value with explicit frames and a
    deterministic composite sort (price ties broken by key)."""
    o = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_orderpriority")
         .orderBy("o_totalprice", "o_orderkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).alias("priciest_key"))
