"""Runtime-filter join pruning: cut a fact-table shuffle down to the
rows that can possibly match a selective dimension predicate, before
the exact join runs.

The reference never joins at all (its reader is a full container scan,
``/root/reference/src/cosmos_reader.py``), so this is a pure
scale-extension operator.  It reproduces — as an explicit, testable
operator — what Spark's own ``InjectRuntimeFilter`` rule does when
``spark.sql.optimizer.runtime.bloomFilter.enabled`` is on: derive a
compact membership filter from the dimension side and apply it to the
fact side *under* the shuffle, so the expensive exchange only carries
survivors.

This build's Spark does not register ``bloom_filter_agg`` /
``might_contain`` as SQL-callable functions, so the filter is the
equally-classic *distinct hash-bucket* form (one hash function, the
"bit set" materialized as a DISTINCT bucket-id relation):

* filter build: ``dim.select(xxhash64(key) pmod m).distinct()`` —
  bounded at ``m`` rows no matter how large the dimension, map-side
  partial-distinct then one tiny shuffle.
* filter apply: broadcast LEFT SEMI join of the fact on the bucket id
  — a BroadcastHashJoin that drops non-candidate fact rows *before*
  the exact join's exchange.  Like a Bloom probe this has false
  positives (two keys sharing a bucket) and zero false negatives,
  which is exactly why the exact join afterwards is still required —
  and why the end-to-end result is bit-identical to the unpruned
  plan, which is what the registered oracle query checks.

At 100 TB the win is the classic one: a 0.1%-selective dimension
predicate means 99.9% of the fact table never enters the join
exchange; the price is one extra broadcast of ≤ m longs.  ``m``
trades broadcast size against false-positive rate (expected FP rate ≈
n_keys / m for n_keys distinct dimension keys, the single-hash Bloom
bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_hash_filter(dim: DataFrame, key: str,
                      num_buckets: int = 1 << 20) -> DataFrame:
    """Compact membership filter for ``dim[key]``: the DISTINCT set of
    ``xxhash64(key) pmod num_buckets`` bucket ids (≤ ``num_buckets``
    rows, typically far fewer).  Aggregates map-side first, so the
    shuffle carries at most ``num_buckets`` rows per partition."""
    return (dim.select(
        F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets))
        .alias("__bucket__")).distinct())


def apply_hash_filter(fact: DataFrame, filt: DataFrame, key: str,
                      num_buckets: int = 1 << 20) -> DataFrame:
    """Drop fact rows whose key hashes to a bucket absent from the
    filter.  Broadcast LEFT SEMI — no shuffle of the fact side; no
    false negatives, so downstream exact joins lose nothing."""
    probe = F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets))
    return (fact.withColumn("__bucket__", probe)
            .join(F.broadcast(filt), "__bucket__", "left_semi")
            .drop("__bucket__"))


def runtime_filter_semi_join(fact: DataFrame, dim: DataFrame,
                             fact_key: str, dim_key: str,
                             num_buckets: int = 1 << 20) -> DataFrame:
    """``fact LEFT SEMI JOIN dim`` with a runtime hash filter pruning
    the fact side first.  Result is exactly the plain semi join (the
    filter admits false positives; the semi join removes them), so an
    oracle can hash-compare against the unpruned form — which doubles
    as a no-false-negative proof.
    """
    filt = build_hash_filter(dim, dim_key, num_buckets)
    pruned = apply_hash_filter(fact, filt, fact_key, num_buckets)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key, "left_semi")
