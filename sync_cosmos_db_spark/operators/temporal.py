"""Temporal joins Spark lacks natively: as-of join and range join.

No reference implementation (SURVEY.md §2.2 A1 — the reference has no
joins at all); these are the BASELINE.json "custom operator" seam,
expressed as compositions of built-in ops so Catalyst/Tungsten still own
execution.

* **As-of join** — for each left row, the latest right row whose time is
  ≤ the left time, per key. NOT implemented as a θ-join + max (that is
  O(n·m) per key); instead the scalable single-shuffle form: union both
  sides tagged, sort within key by (time, side-order), and carry right
  values forward with ``last(ignorenulls)`` over a running window. One
  shuffle on the key, linear scan within each key partition — the same
  shape kdb/QuestDB/Flink use.
* **Range join** — match rows to intervals. A naive non-equi join is a
  BroadcastNestedLoopJoin (quadratic); the bucketed form maps each event
  to fixed-width time buckets, explodes each interval over the buckets
  it overlaps, equi-joins on (key, bucket), then applies the exact
  residual predicate. Shuffle is on (key, bucket); cost ∝ events +
  Σ interval-widths/bucket — the standard interval-bucketing trick
  (as in Databricks' range-join optimization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """As-of (backward) join: attach to each left row the ``value_cols``
    of the latest right row with ``right_time <= left_time`` per key.

    Right (key, time) pairs should be unique (pre-aggregate otherwise) —
    ties would make "the latest row" ambiguous. Equal timestamps match
    (``<=`` semantics, right row sorts before the left row it serves).
    """
    lt = F.col(left_time)
    l_tagged = left.select(
        F.col(key), lt.alias("__t"), F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
          for c in value_cols],
        F.struct(*left.columns).alias("__row"),
    )
    r_tagged = right.select(
        F.col(key), F.col(right_time).alias("__t"), F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(
            l_tagged.schema["__row"].dataType).alias("__row"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (side 0) sort before left rows at the same timestamp,
    # so <= matching falls out of the running last()
    w = (W.partitionBy(key).orderBy("__t", "__side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = unioned.select(
        key, "__t", "__side", "__row",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
          for c in value_cols],
    ).filter(F.col("__side") == 1)
    out = filled.select(
        *[F.col("__row")[c].alias(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(c) for c in value_cols],
    )
    if how == "inner":
        out = out.dropna(subset=[value_cols[0]])
    return out


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    event_time: str,
    start_col: str,
    end_col: str,
    bucket_width_sec: int = 3600,
    key: str | None = None,
) -> DataFrame:
    """Match events to ``[start, end)`` intervals via equi-join on
    fixed-width time buckets + exact residual filter. With ``key``, both
    the bucket and the key join equi-side. Intervals explode over every
    bucket they overlap — choose ``bucket_width_sec`` near the median
    interval width so the explosion factor stays ~2×."""
    ev_b = events.withColumn(
        "__bucket",
        (F.unix_timestamp(F.col(event_time)) / bucket_width_sec)
        .cast("long"))
    iv_b = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            (F.unix_timestamp(F.col(start_col)) / bucket_width_sec)
            .cast("long"),
            (F.unix_timestamp(F.col(end_col)) / bucket_width_sec)
            .cast("long"))))
    on = ["__bucket"] + ([key] if key else [])
    return (
        ev_b.join(iv_b, on)
        .filter((F.col(event_time) >= F.col(start_col))
                & (F.col(event_time) < F.col(end_col)))
        .drop("__bucket")
    )


def scd2_history(
    updates: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from an update
    stream: one validity interval per run of equal values per key.

    Classic warehouse operator the reference cannot express (it has no
    windows; its sync is last-write-wins per id). Three window passes
    over the SAME (key, time) partitioning — Catalyst reuses one
    exchange for all three, so the whole build is a single shuffle:

    1. drop consecutive duplicates (``lag(value)`` per key),
    2. ``valid_from = time``, ``valid_to = lead(time)`` (NULL = open),
    3. ``is_current`` on the open interval.

    At 100 TB this is partitioned by ``key`` — no global sort, no
    driver state; per-key history fits the window's spillable sorter.
    Ties at identical timestamps are made deterministic by
    ``tiebreak_col`` (default: the value column itself).
    """
    tb = tiebreak_col or value_col
    w = W.partitionBy(key).orderBy(F.col(time_col), F.col(tb))
    # null-safe run detection: the first row per key has __prev NULL and
    # must be kept; a NULL value after a NULL value is the same run.
    runs = (updates
            .withColumn("__prev", F.lag(value_col).over(w))
            .withColumn("__first",
                        F.row_number().over(w) == 1)
            .filter(F.col("__first")
                    | ~F.col(value_col).eqNullSafe(F.col("__prev")))
            .drop("__prev", "__first"))
    w2 = W.partitionBy(key).orderBy(F.col(time_col), F.col(tb))
    return (runs
            .withColumn("valid_from", F.col(time_col))
            .withColumn("valid_to", F.lead(time_col).over(w2))
            .withColumn("is_current", F.col("valid_to").isNull()))


def gap_fill(df: DataFrame, keys: list[str], ts_col: str,
             value_cols: list[str], step: str = "1 day") -> DataFrame:
    """Regularize a sparse per-key time series: emit one row per key
    per ``step`` between that key's first and last observation, left-
    joining the observed rows in and forward-filling ``value_cols``
    (TimescaleDB calls this time_bucket_gapfill + locf; the reference
    has no time axis at all).

    Scale shape — three relational steps, one key-partitioned window:

    * bounds: ``groupBy(keys).agg(min/max(ts))`` — map-side partials,
      one tiny shuffle (one row per key).
    * spine: ``explode(sequence(lo, hi, step))`` — generated from the
      1-row-per-key bounds, so the expensive explode never touches the
      fact table and its width is data-bounded (span/step rows per
      key, not a cross join against a global calendar).
    * fill: left join spine↔observations on (keys, ts) — both sides
      hash-partitioned by key — then ``last(v, ignorenulls)`` over a
      key-partitioned window.  One exchange feeds both the join and
      the window (same keys), and state per window partition is one
      scalar per value column.

    ``step`` is a SQL interval literal (e.g. ``'1 day'``).  ``ts_col``
    must already be truncated to the grid (the operator fills gaps, it
    does not bucket).
    """
    from pyspark.sql import Window as W

    lo, hi = "__lo__", "__hi__"
    bounds = df.groupBy(*keys).agg(F.min(ts_col).alias(lo),
                                   F.max(ts_col).alias(hi))
    spine = bounds.select(
        *keys,
        F.explode(F.expr(f"sequence({lo}, {hi}, interval {step})"))
        .alias(ts_col))
    filled = spine.join(df, [*keys, ts_col], "left")
    w = (W.partitionBy(*keys).orderBy(ts_col)
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    for v in value_cols:
        filled = filled.withColumn(
            f"{v}_filled", F.last(v, ignorenulls=True).over(w))
    return filled


def ewma_calendar(df: DataFrame, day_col: str, value_col: str,
                  alpha: float = 0.5, window_days: int = 30,
                  round_digits: int = 4) -> DataFrame:
    """X72 — calendar-decay exponentially-weighted moving average over
    a (day, value) series: for each present day ``d``,

        ewma(d) = Σ_{i: 0 ≤ d−i < W} v_i·(1−α)^(d−i)
                / Σ_{i: 0 ≤ d−i < W} (1−α)^(d−i)

    — the pandas ``adjust=True`` normalization with decay by CALENDAR
    distance (a gap of 3 days decays 3×, so irregular series don't
    overweight stale values), truncated at ``window_days`` where the
    weight has decayed to negligible.

    Scale shape: NO self-join and NO non-equi range join — each day
    EXPLODES its value forward onto the ≤ W future days it influences
    (weight (1−α)^k for offset k, an in-row ``sequence``), then ONE
    groupBy on the receiving day sums weighted numerator/denominator,
    and a semi join keeps only days present in the input. Every
    shuffle key is a day; the W-fold row expansion is a constant (30),
    not a data-dependent blow-up.

    Determinism: with ``alpha = 0.5`` the weights 0.5^k are exact
    dyadic doubles, so both engines compute identical products;
    results floor-round at ``round_digits``.
    """
    q = 1.0 - alpha
    contrib = (df.select(F.col(day_col).alias("src_day"),
                         F.col(value_col).cast("double").alias("v"))
               .select("src_day", "v",
                       F.explode(F.sequence(F.lit(0),
                                            F.lit(window_days - 1)))
                       .alias("k"))
               .select(F.date_add(F.col("src_day"), F.col("k"))
                       .alias("day"),
                       (F.col("v") * F.pow(F.lit(q), F.col("k")))
                       .alias("wv"),
                       F.pow(F.lit(q), F.col("k")).alias("w")))
    present = df.select(F.col(day_col).alias("day")).distinct()
    p = 10 ** round_digits
    return (contrib.join(present, "day", "left_semi")
            .groupBy("day")
            .agg((F.floor(F.sum("wv") / F.sum("w") * p + F.lit(0.5)) / p)
                 .alias("ewma")))


def time_weighted_avg(df: DataFrame, key_col: str, ts_col: str,
                      value_col: str, order_col: str | None = None,
                      round_digits: int = 4) -> DataFrame:
    """X129 — trapezoidal time-weighted average per series: TWA =
    Σᵢ (vᵢ + vᵢ₊₁)/2 · Δtᵢ / Σᵢ Δtᵢ over consecutive observations —
    the correct mean for IRREGULARLY sampled series (sensor reads,
    account balances, prices), where the arithmetic mean over-weights
    bursts of closely spaced samples.

    ONE key-partitioned window (lead) builds the consecutive pairs —
    no self-join — and one key-keyed aggregate reduces; both shuffle
    on the series key only.  Zero-duration series (a single sample,
    or all samples at one instant) are dropped — TWA is undefined.
    Ordering ties on ``ts_col`` break deterministically on
    ``order_col`` (default: the key itself — pass an event id for
    multi-row-per-instant series).  Returns ``(key, n_obs, twa)``."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    v = F.col(value_col).cast("double")
    t = F.col(ts_col).cast("double")  # epoch seconds
    paired = (df.withColumn("__v2", F.lead(v).over(w))
              .withColumn("__t2", F.lead(t).over(w))
              .filter(F.col("__t2").isNotNull())
              .select(F.col(key_col),
                      ((F.col("__v2") + v) / 2
                       * (F.col("__t2") - t)).alias("__area"),
                      (F.col("__t2") - t).alias("__dt")))
    p = 10 ** round_digits
    return (paired.groupBy(key_col)
            .agg((F.count("*") + 1).cast("long").alias("n_obs"),
                 F.sum("__area").alias("__a"),
                 F.sum("__dt").alias("__d"))
            .filter(F.col("__d") > 0)
            .select(F.col(key_col), "n_obs",
                    (F.floor(F.col("__a") / F.col("__d") * p
                             + F.lit(0.5)) / p).alias("twa")))


def max_drawdown(series, group_col: str, time_col: str, value_col: str,
                 round_digits: int = 4):
    """X144 — maximum drawdown per group over an ordered series: the
    largest peak-to-trough drop of the cumulative sum — the
    resilience metric for revenue streams and balances (how deep did
    the worst slump go, and when).

    Input is a period-collapsed series per group (the
    ``changepoint_scan`` contract).  ONE group-keyed sort carries
    both windows (cumulative sum and running max of it); the trough
    row is elected per group by a max-struct aggregate, so no second
    sort or self-join.  All accumulation is INTEGER in units of
    10^−round_digits (the ``cusum`` discipline): values quantize to
    the grid FIRST, so the cumulative path, the drawdowns, the
    trough-election equality, and the unordered final-value reduce
    are all exact — no summation-order ulps on either engine.
    Returns
    ``(group, n_periods, final_value, max_drawdown, trough_<time>)``
    — trough is the FIRST period attaining the maximum drawdown."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    p = 10 ** round_digits
    vi = (F.floor(F.col(value_col).cast("double") * p + F.lit(0.5))
          .cast("long"))
    w = (Window.partitionBy("g").orderBy("t")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wg = Window.partitionBy("g")
    base = (series.select(F.col(group_col).alias("g"),
                          F.col(time_col).alias("t"), vi.alias("vi"))
            .withColumn("cum", F.sum("vi").over(w))
            .withColumn("peak", F.max("cum").over(w))
            .withColumn("dd", F.col("peak") - F.col("cum"))
            .withColumn("mdd", F.max("dd").over(wg)))
    return (base.groupBy(F.col("g").alias(group_col))
            .agg(F.count("*").cast("long").alias("n_periods"),
                 (F.sum("vi") / float(p)).alias("final_value"),
                 (F.max("mdd") / float(p)).alias("max_drawdown"),
                 F.min(F.when(F.col("dd") == F.col("mdd"),
                              F.col("t"))).alias(f"trough_{time_col}")))


def mase_profile(df: DataFrame, ts_col: str, value_col,
                 season: int = 7, round_digits: int = 4) -> DataFrame:
    """X181 — seasonal-naive forecast error profile (MASE framing):
    collapse to a daily series, then MAE of the one-step naive
    forecast (lag 1), MAE of the seasonal naive (lag ``season``), and
    their ratio — the scale-free baseline every forecasting effort
    must beat (ratio < 1 means last week predicts better than
    yesterday: the series is seasonal; a model that can't beat BOTH
    is decoration).  Companion to X113 MoM growth and X121/X135
    changepoint/ACF on the same period-collapsed shape.

    One date-keyed aggregate collapses the corpus to O(days) rows;
    both lag windows and the final 1-row reduce run on that tiny
    series — the standard period-collapse pattern, nothing scales
    with row count.  Returns ``(n_days, mae_naive, mae_seasonal,
    mase_ratio)`` (one row).
    """
    from pyspark.sql import Window

    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    daily = (df.groupBy(F.to_date(F.col(ts_col)).alias("d"))
             .agg(F.sum(v).alias("r")))
    w = Window.orderBy("d")
    e = (daily
         .withColumn("e1", F.abs(F.col("r") - F.lag("r", 1).over(w)))
         .withColumn("es", F.abs(F.col("r")
                                 - F.lag("r", season).over(w))))
    # a perfectly flat series has zero naive MAE; the ratio is
    # undefined there (NULL), not an ANSI divide-by-zero error
    ratio = F.when(F.col("__m1") != 0, F.col("__ms") / F.col("__m1"))
    return (e.agg(F.count("*").cast("long").alias("n_days"),
                  F.avg("e1").alias("__m1"),
                  F.avg("es").alias("__ms"))
            .select("n_days", fr(F.col("__m1")).alias("mae_naive"),
                    fr(F.col("__ms")).alias("mae_seasonal"),
                    fr(ratio).alias("mase_ratio")))


def gap_fill_interpolate(df: DataFrame, keys: list[str], ts_col: str,
                         value_col: str, step: str = "1 day",
                         round_digits: int = 4) -> DataFrame:
    """X190 — gap-fill with LINEAR interpolation: like ``gap_fill``
    (X37) the sparse per-key series is regularized onto a dense
    ``step`` spine, but interior gaps are filled by interpolating
    between the bracketing observations instead of holding the last
    one — the right fill for continuously-varying measures (prices,
    gauges, balances-as-of) where LOCF draws staircases.  The spine
    spans each key's own [min, max] so every gap is interior by
    construction: every filled row has both a previous and a next
    observation.

    Scale shape — identical to X37's, one extra window direction:
    per-key bounds aggregate → ``sequence``/``explode`` spine off the
    1-row-per-key bounds → left join on (keys, ts) → TWO key-keyed
    windows over the SAME partitioning (backward
    ``last(ignorenulls)`` for the previous observation and its stamp,
    forward ``first(ignorenulls)`` for the next) — one exchange feeds
    the join and both windows.  The interpolation weight is a ratio
    of integer day offsets (``datediff``), computed identically in
    the oracle, and the result is floor-rounded.

    Returns ``(keys…, ts, <value>, <value>_interp)`` where observed
    rows carry their own value and gap rows the interpolated one.
    """
    from pyspark.sql import Window as W

    lo, hi = "__lo__", "__hi__"
    bounds = df.groupBy(*keys).agg(F.min(ts_col).alias(lo),
                                   F.max(ts_col).alias(hi))
    spine = bounds.select(
        *keys,
        F.explode(F.expr(f"sequence({lo}, {hi}, interval {step})"))
        .alias(ts_col))
    filled = spine.join(df, [*keys, ts_col], "left")
    # BOTH directions are RUNNING frames: the forward fill uses a
    # DESCENDING running `last(ignorenulls)` rather than a
    # `first(ignorenulls)` over an UnboundedFollowing frame, because
    # Spark evaluates UnboundedFollowing frames by re-scanning the
    # remaining rows for EVERY row — O(span²) per key, measured as a
    # >280 s stall on a 10k-key × 3650-day spine where the two
    # running-frame form finishes in seconds (SCALING.md).
    back = (W.partitionBy(*keys).orderBy(ts_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow))
    fwd = (W.partitionBy(*keys).orderBy(F.col(ts_col).desc())
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    obs_ts = F.when(F.col(value_col).isNotNull(), F.col(ts_col))
    filled = (filled
              .withColumn("__pv", F.last(value_col, True).over(back))
              .withColumn("__pt", F.last(obs_ts, True).over(back))
              .withColumn("__nv", F.last(value_col, True).over(fwd))
              .withColumn("__nt", F.last(obs_ts, True).over(fwd)))
    span = F.datediff(F.col("__nt"), F.col("__pt"))
    frac = F.datediff(F.col(ts_col), F.col("__pt")) / span
    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col)) \
        .otherwise(F.col("__pv")
                   + (F.col("__nv") - F.col("__pv")) * frac)
    p = 10 ** round_digits
    return filled.select(
        *keys, ts_col, value_col,
        (F.floor(interp * p + F.lit(0.5)) / p)
        .alias(f"{value_col}_interp"))


def nearest_asof_join(left: DataFrame, right: DataFrame, key: str,
                      left_time: str, right_time: str,
                      value_col: str, tolerance: int) -> DataFrame:
    """X195 — NEAREST-match as-of join (pandas ``merge_asof
    direction='nearest'``): each left row gets the right row whose
    time is closest in EITHER direction, if within ``tolerance`` —
    the enrichment ``asof_join`` (backward-only) can't express when
    the reference series brackets the probe (sensor readings around
    an event, quotes around a trade).  Equidistant candidates break
    toward the BACKWARD (earlier) one, deterministically.

    Time columns must be NUMERIC (convert timestamps to epoch
    micros/days upstream); ``tolerance`` is in the same units.
    Right (key, time) pairs are collapsed with ``max`` first so
    "the nearest row" is well-defined.

    Scale shape: exactly two ``asof_join`` passes — the proven
    union + running-``last(ignorenulls)`` sort-window shape, the
    forward pass running on NEGATED times (a descending running
    frame, NEVER an UnboundedFollowing frame — the X190 lesson) —
    so the cost is two key-partitioned sort windows, no pairwise
    candidate join.  Returns the left columns plus
    ``(matched_time, matched_value, gap)``.
    """
    r = (right.groupBy(key, right_time)
         .agg(F.max(value_col).alias("__rv")))
    rb = r.select(key, right_time, "__rv",
                  F.col(right_time).alias("__bt"))
    b = asof_join(left, rb, key, left_time, right_time,
                  ["__rv", "__bt"]).withColumnRenamed("__rv", "__bv")
    lneg = b.withColumn("__nlt", -F.col(left_time))
    rneg = r.select(key, (-F.col(right_time)).alias("__nrt"),
                    F.col("__rv"),
                    F.col(right_time).alias("__ft"))
    f = asof_join(lneg, rneg, key, "__nlt", "__nrt",
                  ["__rv", "__ft"]).withColumnRenamed("__rv", "__fv")
    lt = F.col(left_time)
    bg, fg = lt - F.col("__bt"), F.col("__ft") - lt
    b_ok = F.col("__bt").isNotNull() & (bg <= tolerance)
    f_ok = F.col("__ft").isNotNull() & (fg <= tolerance)
    use_b = b_ok & (~f_ok | (bg <= fg))
    out = (f.withColumn(
        "matched_time",
        F.when(use_b, F.col("__bt")).when(f_ok, F.col("__ft")))
        .withColumn(
            "matched_value",
            F.when(use_b, F.col("__bv")).when(f_ok, F.col("__fv")))
        .withColumn(
            "gap", F.when(use_b, bg).when(f_ok, fg)))
    return out.drop("__bv", "__bt", "__fv", "__ft", "__nlt")


def rolling_ols_slope(daily: DataFrame, group_col: str, day_col: str,
                      value_col: str, window_days: int = 28,
                      round_digits: int = 4) -> DataFrame:
    """X196 — trailing-window OLS slope per group: for every
    observed day, the least-squares slope of ``value`` on the day
    index over the last ``window_days`` calendar days — the local
    trend X29's whole-series OLS and X92's whole-series Theil–Sen
    can't give (is revenue accelerating NOW).  A RANGE frame on the
    integer day index makes the window calendar-correct across
    missing days (the X50 RANGE-frame discipline).

    Scale shape: runs on a per-(group, day) PRE-AGGREGATED series —
    the period-collapse contract — so the five windowed sums scan
    O(days) rows per group in one group-keyed sort.  The day index
    is rebased to 1992-01-01 to keep ``n·Σxy`` inside the
    integer-exact double range at bench scale; ``value_col`` should
    be on an exact grid (round upstream) for the same reason.
    Slope is NULL where the frame holds fewer than two points.
    Returns ``(group, day, n_days, slope)``.
    """
    x = F.datediff(F.col(day_col),
                   F.to_date(F.lit("1992-01-01"))).cast("long")
    d = daily.select(F.col(group_col), F.col(day_col),
                     x.alias("__x"), F.col(value_col).alias("__y"))
    w = (W.partitionBy(group_col).orderBy("__x")
         .rangeBetween(-(window_days - 1), 0))
    d = (d.withColumn("__n", F.count("*").over(w))
         .withColumn("__sx", F.sum("__x").over(w))
         .withColumn("__sy", F.sum("__y").over(w))
         .withColumn("__sxy",
                     F.sum(F.col("__x") * F.col("__y")).over(w))
         .withColumn("__sxx",
                     F.sum(F.col("__x") * F.col("__x")).over(w)))
    den = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    p = 10 ** round_digits
    return d.select(
        F.col(group_col), F.col(day_col),
        F.col("__n").cast("long").alias("n_days"),
        F.when(den > 0,
               F.floor(num / den * p + F.lit(0.5)) / p).alias("slope"))


def semi_additive_balance(df: DataFrame, key_col: str, ts_col: str,
                          value_col: str, id_col: str,
                          round_digits: int = 4) -> DataFrame:
    """X208 — semi-additive measure aggregation: per period, the sum
    over keys of each key's LAST observed value in that period — the
    balance/inventory/level pattern where summing every row
    double-counts (balances are additive across ACCOUNTS, not across
    TIME; naive SUM over a month of balance snapshots is
    meaningless).  The classic warehouse trap this operator encodes
    once.

    Scale shape: one (key, month)-keyed struct-max election (the
    X91/X172 pattern — ``max(struct(ts, id, value))`` picks the
    latest row deterministically, the unique id breaking timestamp
    ties) followed by one month-keyed reduce.  Returns
    ``(month, n_keys, total_balance)``.
    """
    month = F.date_trunc("month", F.col(ts_col))
    last = (df.groupBy(F.col(key_col).alias("k"),
                       month.alias("__m"))
            .agg(F.max(F.struct(F.col(ts_col).alias("t"),
                                F.col(id_col).alias("i"),
                                F.col(value_col).alias("v")))
                 .alias("__last")))
    # sum pre-snapped integer grid units (the cusum discipline): the
    # cross-key reduce is unordered, and a double sum rounded at the
    # grid afterwards can flip between engines at scale
    p = 10 ** round_digits
    vi = (F.floor(F.col("__last.v").cast("double") * p + F.lit(0.5))
          .cast("long"))
    return (last.groupBy(F.col("__m").cast("date").alias("month"))
            .agg(F.count("*").cast("long").alias("n_keys"),
                 (F.sum(vi) / float(p)).alias("total_balance")))


def negative_balance_episodes(df: DataFrame, key_col: str,
                              ts_col: str, amount_col: str,
                              round_digits: int = 4) -> DataFrame:
    """X210 — negative-balance episode extraction: running balance
    per key (signed amounts in (ts, amount) order), then
    gaps-and-islands over the SIGN — one row per key that ever goes
    negative, with the episode count and the deepest point — the
    overdraft/stock-out detector X113's running balance feeds (the
    balance says *what*; the episodes say *how often and how
    deep*).

    Scale shape: one key-partitioned sort window computes the
    running balance AND the lagged below-zero flag (same exchange);
    episode starts are ``below & !lag(below)`` — a cumulative-free
    count per key — then one key reduce.  The running sum is
    sequential in the same (ts, amount) order in both engines, so
    the balances are bit-identical and the <0 comparisons cannot
    disagree.  Returns ``(key, n_episodes, min_balance)``.
    """
    w = W.partitionBy(key_col).orderBy(ts_col, amount_col)
    run = w.rowsBetween(W.unboundedPreceding, 0)
    d = (df.withColumn("__bal", F.sum(amount_col).over(run))
         .withColumn("__neg", (F.col("__bal") < 0).cast("int"))
         .withColumn("__prev",
                     F.coalesce(F.lag("__neg").over(w), F.lit(0))))
    start = ((F.col("__neg") == 1) & (F.col("__prev") == 0)) \
        .cast("long")
    p = 10 ** round_digits
    return (d.groupBy(F.col(key_col))
            .agg(F.sum(start).cast("long").alias("n_episodes"),
                 (F.floor(F.min("__bal") * p + F.lit(0.5)) / p)
                 .alias("min_balance"))
            .filter(F.col("n_episodes") > 0))


def seasonal_index_monthly(df: DataFrame, ts_col: str,
                           value_col: str,
                           round_digits: int = 4) -> DataFrame:
    """X216 — classical multiplicative seasonal index by
    ratio-to-moving-average: monthly totals (cents-snapped), a
    CENTERED 12-month MA (full windows only), per-month ratios, and
    the month-of-year average ratio normalized to mean 1.0 — the
    decades-old decomposition X157's dow-period STL doesn't cover
    (annual seasonality over a multi-year series).

    Scale shape: the series collapses to O(months) rows before the
    ordered window (the period-collapse contract), so the single
    ordered frame and the 12-row index table are trivial; the MA is
    rounded BEFORE the ratio so both engines divide identical
    numbers.  Returns ``(month_of_year, n_obs, seasonal_index)``.
    """
    # monthly totals and the centered MA both accumulate in INTEGER
    # cents (per-row snap, exact BIGINT sums): the month total is an
    # unordered reduce and the framed mean re-associates differently
    # per engine — either can flip the cents floor at scale
    monthly = (df.groupBy(
        F.date_trunc("month", F.col(ts_col)).alias("__m"))
        .agg(F.sum(F.floor(F.col(value_col) * 100 + F.lit(0.5))
                   .cast("long")).alias("__vc")))
    w = W.orderBy("__m").rowsBetween(-6, 5)
    ma = (monthly
          .withColumn("__n", F.count("*").over(w))
          .withColumn("__mac",
                      F.floor(F.sum("__vc").over(w).cast("double")
                              / F.col("__n") + F.lit(0.5))
                      .cast("long"))
          .filter(F.col("__n") == 12))
    ratios = ma.select(F.month("__m").alias("month_of_year"),
                       (F.col("__vc").cast("double")
                        / F.col("__mac")).alias("__r"))
    idx = ratios.groupBy("month_of_year").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.avg("__r").alias("__idx"))
    full = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    p = 10 ** round_digits
    return idx.select(
        "month_of_year", "n_obs",
        (F.floor(F.col("__idx") / F.avg("__idx").over(full) * p
                 + F.lit(0.5)) / p).alias("seasonal_index"))


def rolling_robust_z(daily: DataFrame, group_col: str, day_col: str,
                     value_col: str, window_days: int = 28,
                     min_obs: int = 10,
                     round_digits: int = 4) -> DataFrame:
    """X234 — rolling ROBUST z-score anomaly tagging: each day's
    value against the trailing window's median and IQR
    (``z = (x − med) / (IQR / 1.349)``, the normal-consistent IQR
    scale) — the outlier-immune sibling of X72's EWMA mean/σ
    control limits: one wild day inflates a trailing σ and masks
    the next anomaly; the IQR barely moves.

    Scale shape: three frame-quantiles (p25/p50/p75 of the SAME
    RANGE frame on the rebased integer day index — quantiles of the
    frame's values, which IS window-expressible, unlike a frame-MAD
    whose deviations depend on the current row) over the
    period-collapsed O(days) series.  Frames holding fewer than
    ``min_obs`` days or a zero IQR report NULL.  Returns
    ``(group, day, value, robust_z, is_anomaly)``.
    """
    x = F.datediff(F.col(day_col),
                   F.to_date(F.lit("1992-01-01"))).cast("long")
    d = daily.select(F.col(group_col), F.col(day_col),
                     x.alias("__x"), F.col(value_col).alias("__y"))
    w = (W.partitionBy(group_col).orderBy("__x")
         .rangeBetween(-(window_days - 1), 0))
    d = (d.withColumn("__n", F.count("*").over(w))
         .withColumn("__med", F.percentile("__y", F.lit(0.5)).over(w))
         .withColumn("__p25", F.percentile("__y", F.lit(0.25)).over(w))
         .withColumn("__p75", F.percentile("__y", F.lit(0.75)).over(w)))
    iqr = F.col("__p75") - F.col("__p25")
    z = (F.col("__y") - F.col("__med")) / (iqr / 1.349)
    ok = (F.col("__n") >= min_obs) & (iqr > 0)
    p = 10 ** round_digits
    return d.select(
        F.col(group_col), F.col(day_col),
        F.col("__y").alias(value_col),
        F.when(ok, F.floor(z * p + F.lit(0.5)) / p).alias("robust_z"),
        F.when(ok, F.abs(z) > 3).alias("is_anomaly"))
