"""Numeric data profiling: fixed-bound histograms and column summaries.

Corpus profiling before training (value distributions, outlier mass,
null rates) is a single-pass groupBy at any scale.  The reference's
only profiling is a document count (``/root/reference/migrate.py:104``).

``histogram_fixed`` deliberately takes EXPLICIT bounds instead of
computing min/max first: at 100 TB a min/max pre-pass doubles the scan,
and training pipelines profile against known, stable bounds (a price
cap, a token-length budget) so drift between runs is visible rather
than silently renormalized.  The bucket expression is plain IEEE
double arithmetic — ``least(floor((x − lo)/width), n−1)`` — identical
across engines, so the whole histogram is oracle-checkable bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_of(col: Column | str, lo: float, hi: float,
              n_buckets: int) -> Column:
    """Bucket index in [0, n_buckets): underflow clamps to 0, overflow
    to n_buckets−1 (open-ended edge buckets, width_bucket-style)."""
    c = F.col(col) if isinstance(col, str) else col
    width = (hi - lo) / n_buckets
    raw = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(width))
    return F.greatest(F.lit(0),
                      F.least(raw, F.lit(n_buckets - 1))).cast("long")


def histogram_fixed(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
    round_digits: int = 4,
) -> DataFrame:
    """Fixed-bound histogram: ``(bucket, lo_edge, n, min_v, max_v)``,
    one row per non-empty bucket.  Single scan, one n_buckets-row
    shuffle with map-side partials; NULLs are excluded (profile them
    separately via ``null_profile``)."""
    width = (hi - lo) / n_buckets
    p = 10 ** round_digits
    b = bucket_of(col, lo, hi, n_buckets)
    return (df.filter(F.col(col).isNotNull())
            .groupBy(b.alias("bucket"))
            .agg(F.count("*").cast("long").alias("n"),
                 (F.floor(F.min(F.col(col).cast("double")) * p + F.lit(0.5))
                  / p).alias("min_v"),
                 (F.floor(F.max(F.col(col).cast("double")) * p + F.lit(0.5))
                  / p).alias("max_v"))
            .withColumn("lo_edge",
                        (F.floor((F.lit(float(lo))
                                  + F.col("bucket") * F.lit(width)) * p
                                 + F.lit(0.5)) / p)))


def null_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Null/blank rate per column in ONE scan: unpivots to
    ``(column, n_rows, n_null)`` via a stack of conditional sums (no
    per-column jobs, no driver loop)."""
    aggs = []
    for c in cols:
        aggs.append(F.count("*").cast("long").alias(f"__r_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .cast("long").alias(f"__n_{c}"))
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{c}', __r_{c}, __n_{c}" for c in cols)
    return row.selectExpr(
        f"stack({len(cols)}, {pairs}) as (col_name, n_rows, n_null)")
