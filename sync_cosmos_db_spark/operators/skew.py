"""Skew mitigation: salted aggregation and salted joins.

No reference implementation (the reference is single-threaded; skew is
meaningless there). At 100 TB, hot keys are the failure mode of every
shuffle: one reducer gets the viral document's key and the stage runs at
the speed of that task. Two standard remedies, both deterministic:

* **Salted two-stage aggregation** — partial-aggregate on
  ``(key, salt)``, then final-aggregate on ``key``. The hot key's rows
  spread over ``buckets`` reducers in stage 1; stage 2 combines
  ``buckets`` partial rows per key, which is trivially small. Works for
  any decomposable aggregate (count/sum/min/max; avg as sum÷count).
  Spark's own map-side partial aggregation usually covers this — the
  explicit form matters when partial agg is defeated (high-cardinality
  composite grouping, or ``collect_list``-style holistic aggregates
  bounded per salt).
* **Salted join (replicate the small side)** — big side gets a salt in
  ``[0, buckets)``; the small side is exploded ×buckets so every
  (key, salt) pair finds its match. Bounded memory: small×buckets rows.
  AQE's skew-join split (enabled in session.py) handles moderate skew
  automatically; explicit salting is for the pathological keys AQE's
  per-partition-size heuristic can't fix, e.g. one key > one partition.

The salt is ``spark_partition_id() % buckets`` — free to compute (no
extra shuffle to assign), deterministic within a job, and spreads any
single input partition's hot rows across reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_salt(df: DataFrame, buckets: int) -> DataFrame:
    return df.withColumn(
        "__salt", F.pmod(F.spark_partition_id().cast("long"),
                         F.lit(buckets)))


def salted_agg(df: DataFrame, keys: list[str], exprs: dict[str, str],
               buckets: int = 32) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``exprs`` maps output column name → ``"count"`` | ``"sum:<col>"`` |
    ``"min:<col>"`` | ``"max:<col>"``. Example::

        salted_agg(li, ["l_returnflag"],
                   {"n": "count", "revenue": "sum:l_extendedprice"})
    """
    stage1_aggs, stage2_aggs = [], []
    for out, spec in exprs.items():
        if spec == "count":
            stage1_aggs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            stage2_aggs.append(F.sum(f"__p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            stage1_aggs.append(fn(col).alias(f"__p_{out}"))
            outer = F.sum if op == "sum" else {"min": F.min, "max": F.max}[op]
            stage2_aggs.append(outer(f"__p_{out}").alias(out))
    partial = _with_salt(df, buckets).groupBy(*keys, "__salt").agg(*stage1_aggs)
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                how: str = "inner", buckets: int = 16) -> DataFrame:
    """Join a skewed big side against a small side by replicating the
    small side ×buckets. Join key becomes (keys…, salt), so each hot
    key's rows land on ``buckets`` different reducers. Only for joins
    where the small side fits ×buckets in the shuffle (else fix skew
    with AQE or a broadcast, which sidesteps the shuffle entirely).
    Only inner/left joins: an outer join would surface each unmatched
    small-side row once PER SALT replica."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}: the "
            "replicated small side would duplicate unmatched rows")
    big_s = _with_salt(big, buckets)
    small_s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(buckets)])))
    return big_s.join(small_s, [*keys, "__salt"], how).drop("__salt")


def rendezvous_route(df: DataFrame, id_col: str,
                     n_shards: int,
                     round_digits: int = 6) -> DataFrame:
    """X198 — rendezvous (highest-random-weight) shard routing audit:
    each row is assigned to the shard whose sha2-derived
    (score, shard) pair is largest — the stateless router whose
    selling point over mod-N hashing is MINIMAL RESHUFFLE: when a
    shard is added, only the rows the NEW shard wins move, ~1/(N+1)
    of the corpus, instead of mod-N's (N-1)/N.  The audit reports,
    per current shard, the row count and how many of its rows would
    move to a hypothetical shard ``n_shards`` — movers can land
    NOWHERE ELSE by construction, which the tests pin.

    Scale shape: both assignments (N and N+1 shards) are computed
    IN-ROW from an array of (score, shard) structs — ``array_max``
    is the argmax, ties (≈2⁻⁴⁰ per row at 12-digit scores) break to
    the higher shard index deterministically — followed by ONE
    shard-keyed aggregate.  Zero joins, zero driver state; scores
    are integers so both engines agree exactly.  Returns
    ``(shard, n_rows, n_moving, move_share)``.
    """
    def score(i: int):
        return F.translate(
            F.substring(F.sha2(F.concat(
                F.col(id_col).cast("string"),
                F.lit(f":{i}")), 256), 1, 12),
            "abcdef", "012345").cast("bigint")

    def argmax(n: int):
        return F.array_max(F.array(*[
            F.struct(score(i).alias("s"),
                     F.lit(i).cast("long").alias("i"))
            for i in range(n)]))["i"]

    d = df.select(argmax(n_shards).alias("shard"),
                  argmax(n_shards + 1).alias("__next"))
    p = 10 ** round_digits
    return (d.groupBy("shard")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(F.when(F.col("__next") == n_shards, 1)
                       .otherwise(0)).cast("long").alias("n_moving"))
            .withColumn(
                "move_share",
                F.floor(F.col("n_moving") / F.col("n_rows")
                        * p + F.lit(0.5)) / p))
