"""Incremental aggregate maintenance: mergeable per-group aggregate
*states* that can absorb a delta batch without rescanning the base.

The reference recomputes everything from a full container scan on
every run (``/root/reference/migrate.py`` re-reads the whole source);
at 100 TB that posture is untenable for standing aggregates.  The
classic fix — the same algebra behind Spark's own partial aggregation
(map-side partials merged reduce-side) lifted to *cross-run*
granularity — is to persist commutative-monoid states and fold each
new batch in:

* ``cnt``  — adds
* ``sum``  — adds
* ``min``/``max`` — combine via min/max
* ``avg``, and anything else derivable, is **finalized** from the
  states and never stored (storing avg would break mergeability).

``merge_states(base, delta)`` is a union + re-aggregate: group-keyed,
map-side combinable, one shuffle whose width is the number of GROUPS
(not rows) — the delta scan is the only row-proportional work, which
is the whole point.  The registered oracle query proves the algebra:
states built separately over an old/new split of orders, merged, and
finalized must hash-match a single full-scan aggregate in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("cnt", "s_sum", "s_min", "s_max")

#: grid for the integer sum state: values snap to 10^-SUM_DIGITS per
#: row, so every state merge is exact BIGINT addition — a double
#: s_sum would drift from the full-recompute by its own merge order,
#: breaking the "any merge tree yields identical states" contract.
SUM_DIGITS = 4


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-group mergeable state ``(keys..., cnt, s_sum, s_min,
    s_max)`` for one numeric column — ``s_sum`` in exact integer
    10^-SUM_DIGITS grid units.  One group-keyed shuffle with
    map-side partials."""
    p = 10 ** SUM_DIGITS
    return df.groupBy(*keys).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(F.floor(F.col(value_col) * p + F.lit(0.5)).cast("long"))
        .alias("s_sum"),
        F.min(value_col).alias("s_min"),
        F.max(value_col).alias("s_max"))


def merge_states(base: DataFrame, delta: DataFrame,
                 keys: list[str]) -> DataFrame:
    """Fold a delta state into a base state.  Union + re-aggregate —
    associative/commutative, so any merge tree (pairwise, hierarchical
    across days, map-side partial) yields identical states."""
    return (base.unionByName(delta)
            .groupBy(*keys)
            .agg(F.sum("cnt").cast("long").alias("cnt"),
                 F.sum("s_sum").alias("s_sum"),
                 F.min("s_min").alias("s_min"),
                 F.max("s_max").alias("s_max")))


def finalize(state: DataFrame, keys: list[str],
             round_digits: int = 4) -> DataFrame:
    """Derive the user-facing aggregate row from a state: count, sum,
    min, max, and avg = s_sum/cnt.  Pure projection — no shuffle.
    ``s_sum`` is in integer 10^-SUM_DIGITS units (see ``agg_state``);
    total and mean convert back with one exact-integer division each,
    so they land on the SUM_DIGITS grid natively.  ``round_digits``
    rounds min/max (raw doubles) and, when COARSER than SUM_DIGITS,
    re-rounds total/mean onto the requested grid too; a finer
    ``round_digits`` cannot add precision the state never carried
    (total/mean stay on the SUM_DIGITS grid)."""
    p = 10 ** round_digits
    sp = 10 ** SUM_DIGITS

    def r(c):
        return F.floor(c * p + F.lit(0.5)) / p

    total = F.col("s_sum") / float(sp)
    mean = (F.floor(F.col("s_sum").cast("double") / F.col("cnt")
                    + F.lit(0.5)) / sp)
    if round_digits < SUM_DIGITS:
        total, mean = r(total), r(mean)
    return state.select(
        *keys,
        F.col("cnt").alias("n"),
        total.alias("total"),
        r(F.col("s_min")).alias("lo"),
        r(F.col("s_max")).alias("hi"),
        mean.alias("mean"))
