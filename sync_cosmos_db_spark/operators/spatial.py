"""Spatial operators: grid-bucketed radius join on planar points.

"Find all pairs within distance r" is the 2-D cousin of the interval
range join (``operators/temporal.range_join_bucketed``) and shows up
in curation as geo-dedup (same venue scraped twice) and
location-feature joins.  The reference has no spatial surface.

Scale shape — the classic grid-hash decomposition:

* Each point lands in ONE square grid cell of side ``r`` (its floor
  coordinates).  Any pair within ``r`` must then lie in the same cell
  or in horizontally/vertically/diagonally adjacent cells, so the
  LEFT side is replicated into its 3×3 cell neighborhood (a bounded
  ×9 explode) and the join is a pure EQUI-join on the cell id —
  hash-partitionable, AQE-skew-splittable, no cross product and no
  theta-join.  The exact Euclidean predicate runs as a residual
  filter on the equi-join's output.
* Candidate volume is Σ_cell |L_cell±1| · |R_cell| — local density
  decides cost, never the global point count; a uniform corpus at any
  scale joins in O(n · density).  A pathological single hot cell is a
  data-skew problem, handled the same way as any hot join key (AQE
  skew split; or shrink ``r``/pre-aggregate the cell).
* Dedup discipline: replicating L (not R) means every true pair is
  produced exactly once — (cell of R) is unique per R row, and each L
  replica targets one distinct neighbor cell.

Planar coordinates are assumed (pre-projected, or small extents where
equirectangular is fine) — the operator is about the JOIN shape;
swapping in a haversine residual is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_cell(df: DataFrame, x: str, y: str, r: float,
              prefix: str = "") -> DataFrame:
    """Attach integer grid-cell coordinates (side = ``r``)."""
    return df.withColumn(f"{prefix}cx",
                         F.floor(F.col(x) / F.lit(r)).cast("long")) \
             .withColumn(f"{prefix}cy",
                         F.floor(F.col(y) / F.lit(r)).cast("long"))


def radius_join(left: DataFrame, right: DataFrame, r: float,
                lx: str = "x", ly: str = "y",
                rx: str = "x", ry: str = "y") -> DataFrame:
    """All (left, right) pairs with Euclidean distance ≤ ``r``.
    Column names of the two sides must be disjoint (rename first).
    Output keeps both sides' columns plus ``dist``."""
    dx = F.col("__dx__")
    dy = F.col("__dy__")
    l_cells = (with_cell(left, lx, ly, r, "l")
               .withColumn("__dx__", F.explode(F.array(
                   F.lit(-1), F.lit(0), F.lit(1))))
               .withColumn("__dy__", F.explode(F.array(
                   F.lit(-1), F.lit(0), F.lit(1))))
               .withColumn("cell_x", F.col("lcx") + dx)
               .withColumn("cell_y", F.col("lcy") + dy)
               .drop("__dx__", "__dy__", "lcx", "lcy"))
    r_cells = (with_cell(right, rx, ry, r, "r")
               .withColumnRenamed("rcx", "cell_x")
               .withColumnRenamed("rcy", "cell_y"))
    # plain multiplications, not pow(): both engines then evaluate the
    # identical IEEE expression, so the <= r boundary can't flip
    ddx = F.col(lx) - F.col(rx)
    ddy = F.col(ly) - F.col(ry)
    dist = F.sqrt(ddx * ddx + ddy * ddy)
    return (l_cells.join(r_cells, ["cell_x", "cell_y"])
            .withColumn("dist", dist)
            .where(F.col("dist") <= r)
            .drop("cell_x", "cell_y"))
