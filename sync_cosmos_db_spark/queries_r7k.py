"""Round-7 operator families (tenth batch) X207-X210: incremental
view maintenance for count/sum aggregates, semi-additive (last-value)
balance aggregation, candidate-key discovery audit, and
negative-balance episode extraction — the materialized-view delta
algebra, the warehouse semi-additive-measure trap encoded once, the
find-the-merge-key profiler, and the overdraft detector on X113's
running balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


# ---------------------------------------------------------------------------
# X207 — incremental view maintenance
# ---------------------------------------------------------------------------

@query(
    "ivm_orders_priority",
    """
    WITH base AS (
      SELECT o_orderpriority AS key, o_totalprice AS v,
             o_orderkey AS k
      FROM orders WHERE o_orderkey % 3 <> 0),
    final AS (
      SELECT key, CASE WHEN k % 4 = 0 THEN v + 10 ELSE v END AS v
      FROM base WHERE k % 5 <> 0
      UNION ALL
      SELECT o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey % 3 = 0)
    SELECT key, count(*)::BIGINT AS n,
           floor(sum(v) * 100 + 0.5) / 100 AS s
    FROM final GROUP BY 1
    """,
)
def ivm_orders_priority(spark: SparkSession,
                        sf_dir: str) -> DataFrame:
    """X207 — incremental maintenance of a per-priority count/sum
    view (``cdc.ivm_apply_agg``): the snapshot aggregates a base
    slice (orderkey % 3 ≠ 0); the changelog inserts the % 3 == 0
    rows, deletes the % 5 == 0 rows and bumps the % 4 == 0
    survivors by 10 — the maintained state must equal the oracle's
    DIRECT RECOMPUTE over the final row set, which is exactly the
    guarantee IVM is supposed to give."""
    from sync_cosmos_db_spark.operators.cdc import ivm_apply_agg

    orders = load_table(spark, sf_dir, "orders")
    k, v = F.col("o_orderkey"), F.col("o_totalprice")
    prio = F.col("o_orderpriority")
    base = orders.filter(k % 3 != 0)
    snapshot = (base.groupBy(prio.alias("key"))
                .agg(F.count("*").cast("long").alias("n"),
                     F.sum(v).alias("s")))
    ins = orders.filter(k % 3 == 0).select(
        prio.alias("key"), F.lit("I").alias("op"),
        v.alias("v_new"), F.lit(None).cast("double").alias("v_old"))
    dels = base.filter(k % 5 == 0).select(
        prio.alias("key"), F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("v_new"),
        v.alias("v_old"))
    upd = base.filter((k % 5 != 0) & (k % 4 == 0)).select(
        prio.alias("key"), F.lit("U").alias("op"),
        (v + 10).alias("v_new"), v.alias("v_old"))
    changelog = ins.unionByName(dels).unionByName(upd)
    return ivm_apply_agg(snapshot, changelog)


# ---------------------------------------------------------------------------
# X208 — semi-additive balance
# ---------------------------------------------------------------------------

@query(
    "semi_additive_user_value",
    """
    WITH l AS (
      SELECT user_id, date_trunc('month', ts) AS m, value,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('month', ts)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT m::DATE AS month, count(*)::BIGINT AS n_keys,
           floor(sum(value) * 10000 + 0.5) / 10000
             AS total_balance
    FROM l WHERE rn = 1 GROUP BY 1
    """,
)
def semi_additive_user_value(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """X208 — month-end balance aggregation
    (``temporal.semi_additive_balance``): each user's LAST value per
    month (struct-max election, event_id breaking ts ties), summed
    across users — additive over accounts, last-value over time."""
    from sync_cosmos_db_spark.operators.temporal import (
        semi_additive_balance,
    )

    ev = load_table(spark, sf_dir, "events")
    return semi_additive_balance(ev, "user_id", "ts", "value",
                                 "event_id")


# ---------------------------------------------------------------------------
# X209 — candidate-key audit
# ---------------------------------------------------------------------------

@query(
    "candidate_keys_lineitem",
    """
    SELECT 'l_orderkey' AS candidate,
           (SELECT count(*) FROM lineitem)::BIGINT AS n_rows,
           (SELECT count(*) FROM
             (SELECT DISTINCT l_orderkey FROM lineitem) t)::BIGINT
             AS n_distinct,
           floor((SELECT count(*) FROM
                   (SELECT DISTINCT l_orderkey FROM lineitem) t)
                 ::DOUBLE / (SELECT count(*) FROM lineitem)
                 * 1000000 + 0.5) / 1000000 AS uniqueness,
           (SELECT count(*) FROM
             (SELECT DISTINCT l_orderkey FROM lineitem) t)
             = (SELECT count(*) FROM lineitem) AS is_key
    UNION ALL
    SELECT 'l_orderkey+l_linenumber',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM
             (SELECT DISTINCT l_orderkey, l_linenumber
              FROM lineitem) t)::BIGINT,
           floor((SELECT count(*) FROM
                   (SELECT DISTINCT l_orderkey, l_linenumber
                    FROM lineitem) t)
                 ::DOUBLE / (SELECT count(*) FROM lineitem)
                 * 1000000 + 0.5) / 1000000,
           (SELECT count(*) FROM
             (SELECT DISTINCT l_orderkey, l_linenumber
              FROM lineitem) t)
             = (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'l_partkey+l_suppkey',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM
             (SELECT DISTINCT l_partkey, l_suppkey
              FROM lineitem) t)::BIGINT,
           floor((SELECT count(*) FROM
                   (SELECT DISTINCT l_partkey, l_suppkey
                    FROM lineitem) t)
                 ::DOUBLE / (SELECT count(*) FROM lineitem)
                 * 1000000 + 0.5) / 1000000,
           (SELECT count(*) FROM
             (SELECT DISTINCT l_partkey, l_suppkey
              FROM lineitem) t)
             = (SELECT count(*) FROM lineitem)
    """,
)
def candidate_keys_lineitem(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """X209 — candidate-key audit over lineitem
    (``expectations.candidate_key_audit``): in THIS synthetic
    corpus even (orderkey, linenumber) is refuted — duplicate
    pairs exist — which is precisely the discovery the audit is
    for (X220's allocation tiebreak was widened because of it);
    exact uniqueness ratios for all three candidates."""
    from sync_cosmos_db_spark.operators.expectations import (
        candidate_key_audit,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return candidate_key_audit(li, [
        ["l_orderkey"],
        ["l_orderkey", "l_linenumber"],
        ["l_partkey", "l_suppkey"]])


# ---------------------------------------------------------------------------
# X210 — negative-balance episodes
# ---------------------------------------------------------------------------

@query(
    "negative_episodes_user_value",
    """
    WITH a AS (
      SELECT user_id,
             ts,
             CASE WHEN event_type = 'purchase' THEN value
                  ELSE -value END AS amount
      FROM events),
    b AS (
      SELECT user_id, ts, amount,
             sum(amount) OVER (PARTITION BY user_id
                               ORDER BY ts, amount
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS bal
      FROM a),
    c AS (
      SELECT user_id, bal,
             CASE WHEN bal < 0 THEN 1 ELSE 0 END AS neg,
             coalesce(lag(CASE WHEN bal < 0 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id
                            ORDER BY ts, amount), 0) AS prev
      FROM b)
    SELECT user_id,
           sum(CASE WHEN neg = 1 AND prev = 0 THEN 1 ELSE 0 END)
             ::BIGINT AS n_episodes,
           floor(min(bal) * 10000 + 0.5) / 10000 AS min_balance
    FROM c GROUP BY 1
    HAVING sum(CASE WHEN neg = 1 AND prev = 0
               THEN 1 ELSE 0 END) > 0
    """,
)
def negative_episodes_user_value(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """X210 — overdraft episodes per user
    (``temporal.negative_balance_episodes``): purchases credit,
    everything else debits; running balance + sign islands on ONE
    user-partitioned sort window.  The sequential running sum is
    bit-identical in both engines, so the <0 comparisons cannot
    disagree."""
    from sync_cosmos_db_spark.operators.temporal import (
        negative_balance_episodes,
    )

    ev = load_table(spark, sf_dir, "events")
    amt = F.when(F.col("event_type") == "purchase",
                 F.col("value")).otherwise(-F.col("value"))
    d = ev.select("user_id", "ts", amt.alias("amount"))
    return negative_balance_episodes(d, "user_id", "ts", "amount")
