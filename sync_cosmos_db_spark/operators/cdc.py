"""Change-data-capture apply: merge an ordered change log into a
snapshot with last-writer-wins semantics.

The reference is a snapshot-sync engine — it classifies whole-container
scans into insert/update/skip (``/root/reference/src/migration.py:117-148``)
and has no notion of an ordered change feed.  Production Cosmos
pipelines consume the CHANGE FEED instead: a stream of (key, op,
payload, sequence) events where the latest event per key wins and a
delete tombstone removes the key.  This module is that operator,
set-at-a-time:

* **Collapse** — within the log, keep only the latest event per key:
  one ``row_number`` window over (key) ordered by (seq DESC, tiebreak).
  Shuffle keys on the document key — the natural partitioning a change
  feed already has.
* **Apply** — full outer join of snapshot and collapsed log on the key:
  a surviving log row that isn't a tombstone replaces (or inserts) the
  row; a tombstone drops it; keys untouched by the log pass through.
  One co-partitioned join; nothing is broadcast (both sides are
  table-sized at 100 TB).

The result is exactly what replaying the log row-at-a-time would leave
behind — which is what the reference's per-document loop computes, one
network round-trip at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: op-column values
OP_UPSERT = "U"
OP_DELETE = "D"


def collapse_changelog(changes: DataFrame, keys: list[str],
                       seq_col: str, op_col: str = "op") -> DataFrame:
    """Latest event per key from an ordered change log.

    Ordering is (seq DESC, op ASC): if the same key carries both an
    upsert and a delete at the SAME sequence number, the delete wins
    ('D' < 'U' in binary order, so ASC ranks it first) — a
    deterministic tiebreak both engines agree on.
    """
    w = (W.partitionBy(*keys)
         .orderBy(F.col(seq_col).desc(), F.col(op_col).asc()))
    return (changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn"))


def apply_changelog(snapshot: DataFrame, changes: DataFrame,
                    keys: list[str], seq_col: str,
                    op_col: str = "op") -> DataFrame:
    """Apply an I/U/D change log to a snapshot (last writer wins).

    ``changes`` must carry the snapshot's value columns plus ``seq_col``
    and ``op_col`` (``'U'`` upsert — insert-or-replace — or ``'D'``
    delete).  Returns the post-replay table with the snapshot's schema.
    """
    val_cols = [c for c in snapshot.columns if c not in keys]
    latest = collapse_changelog(changes, keys, seq_col, op_col)
    l = latest.select(
        *keys,
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in val_cols])
    joined = snapshot.join(l, keys, "full_outer")
    kept = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != OP_DELETE))
    has_change = F.col("__op").isNotNull()
    return kept.select(
        *keys,
        *[F.when(has_change, F.col(f"__c_{c}")).otherwise(F.col(c))
          .alias(c) for c in val_cols])


def ivm_apply_agg(snapshot: DataFrame, changelog: DataFrame,
                  key_col: str = "key", op_col: str = "op",
                  new_col: str = "v_new", old_col: str = "v_old",
                  round_digits: int = 2) -> DataFrame:
    """X207 — incremental view maintenance for a count/sum GROUP BY
    view: given the view's current state ``(key, n, s)`` and a
    changelog of I/D/U rows, produce the updated state WITHOUT
    rescanning the base table — the delta algebra every
    materialized-view engine runs (count and sum are self-
    maintainable; min/max are not, which is why they're excluded
    from this contract).

    Per key the changelog collapses to one delta row:
    ``dn = ΣI − ΣD`` and ``ds = Σv_new(I) − Σv_old(D) +
    Σ(v_new − v_old)(U)``; the merge is a FULL OUTER join of two
    key-partitioned aggregates, and keys whose count reaches 0
    drop out of the view.

    Scale shape: one key-keyed aggregate over the changelog (which
    is the DELTA's size, not the base's — the whole point), one
    key-keyed full-outer merge with the snapshot; at 100 TB the
    snapshot is a bucketed table and the merge is shuffle-free on
    its bucket key.  All value accumulation is INTEGER in units of
    10^−round_digits (values snap per row, the snapshot's ``s``
    snaps once): a maintained double sum drifts from the direct
    recompute by its own accumulation order, which is exactly the
    equivalence IVM must preserve.  Returns ``(key, n, s)``.
    """
    p = 10 ** round_digits
    snap = lambda c: (F.floor(c.cast("double") * p  # noqa: E731
                              + F.lit(0.5)).cast("long"))
    op = F.col(op_col)
    delta = (changelog.groupBy(F.col(key_col))
             .agg((F.sum(F.when(op == "I", 1).otherwise(0))
                   - F.sum(F.when(op == "D", 1).otherwise(0)))
                  .cast("long").alias("__dn"),
                  F.sum(
                      F.when(op == "I", snap(F.col(new_col)))
                      .when(op == "D", -snap(F.col(old_col)))
                      .when(op == "U",
                            snap(F.col(new_col))
                            - snap(F.col(old_col)))
                      .otherwise(F.lit(0).cast("long")))
                  .alias("__ds")))
    merged = (snapshot.join(delta, key_col, "full")
              .select(
                  F.col(key_col),
                  (F.coalesce(F.col("n"), F.lit(0))
                   + F.coalesce(F.col("__dn"), F.lit(0)))
                  .cast("long").alias("n"),
                  (F.coalesce(snap(F.col("s")), F.lit(0))
                   + F.coalesce(F.col("__ds"), F.lit(0)))
                  .alias("__s")))
    return (merged.filter(F.col("n") > 0)
            .select(key_col, "n",
                    (F.col("__s") / float(p)).alias("s")))
