"""Behavioral analytics over event streams: funnels, cohort retention,
Markov transition matrices.

The reference has no event-analytics surface at all (its only stream
treatment is the migration classifier's full-container diff,
``/root/reference/migrate.py:61-78``); these are extension operators for
the product-analytics posture every event warehouse needs, expressed
relationally so Catalyst plans them like any other aggregate.

Scale shapes (all shuffles are user- or group-keyed, nothing driver-side):

* **funnel** — k sequential conditional min-timestamp aggregates, each
  keyed by user: step i's events join the (user, t_{i-1}) table and keep
  only events after t_{i-1}.  k is the funnel length (small constant);
  the per-step state is one row per surviving user, strictly shrinking
  down the funnel.  No sessionization, no collect_list of raw events.
* **cohort retention** — two user-keyed aggregates: first-activity week
  per user, then (cohort_week, week_offset) distinct-user counts.
* **transition matrix** — one window pass per user ordered by (ts, id)
  producing (state, next_state) pairs, then a pair-keyed count; the
  row-normalizing total is a window over the tiny (|states|²) count
  table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.cache_scope import scoped_persist


def funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel timestamps: ``(user, t0, t1, ... t{k-1})``
    where ``t_i`` is the earliest occurrence of ``steps[i]`` strictly
    after ``t_{i-1}`` (NULL once the funnel is abandoned).  Strict
    ordering means a user must re-perform a later step after the earlier
    one — simultaneous events do not satisfy the funnel."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    times = (df.filter(F.col(type_col) == steps[0])
             .groupBy(user_col)
             .agg(F.min(ts_col).alias("t0")))
    for i in range(1, len(steps)):
        nxt = (df.filter(F.col(type_col) == steps[i])
               .join(times.select(user_col, f"t{i - 1}"), user_col)
               .filter(F.col(ts_col) > F.col(f"t{i - 1}"))
               .groupBy(user_col)
               .agg(F.min(ts_col).alias(f"t{i}")))
        times = times.join(nxt, user_col, "left")
    return times


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion table: ``(step, step_name, n_users)`` — users
    reaching each step in order.  Monotonically non-increasing by
    construction."""
    times = funnel_times(df, steps, user_col, ts_col, type_col)
    aggs = [F.count(F.col(f"t{i}")).cast("long").alias(f"n{i}")
            for i in range(len(steps))]
    row = times.agg(*aggs)
    pairs = ", ".join(
        f"{i}L, '{s}', n{i}" for i, s in enumerate(steps))
    return row.selectExpr(
        f"stack({len(steps)}, {pairs}) as (step, step_name, n_users)")


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: ``(cohort_week_s, week_offset, n_users)``
    — users whose FIRST activity fell in cohort week w and who were
    active again ``week_offset`` weeks later.  Weeks are ISO
    Monday-start (``date_trunc('week', ...)`` in both engines); the
    cohort week surfaces as epoch seconds so the column is
    engine-portable."""
    first = df.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    j = df.select(user_col, ts_col).join(first, user_col)
    cohort = F.date_trunc("week", F.col("__first_ts"))
    wk = F.date_trunc("week", F.col(ts_col))
    return (j.groupBy(
        F.unix_timestamp(cohort).alias("cohort_week_s"),
        (F.datediff(wk, cohort) / 7).cast("long").alias("week_offset"))
        .agg(F.count_distinct(F.col(user_col)).cast("long")
             .alias("n_users")))


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    round_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``(from_type, to_type, n, p)`` where ``p`` row-normalizes
    over ``from_type``.  Sequence order is (ts, id) so simultaneous
    events are deterministic.  One user-keyed window pass + one
    pair-keyed count; the normalizing window runs on the |states|²-row
    result, not the event stream."""
    w = W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (df
             .withColumn("__next", F.lead(type_col).over(w))
             .filter(F.col("__next").isNotNull())
             .groupBy(F.col(type_col).alias("from_type"),
                      F.col("__next").alias("to_type"))
             .agg(F.count("*").cast("long").alias("n")))
    tot = W.partitionBy("from_type")
    p = 10 ** round_digits
    return pairs.withColumn(
        "p",
        F.floor(F.col("n") / F.sum("n").over(tot) * p + F.lit(0.5)) / p)


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization: assign a per-user ``session_idx`` (1-based)
    that increments whenever the gap to the previous event exceeds
    ``gap_seconds`` — the classic lag + running-sum construction, the
    BATCH twin of the native streaming ``session_window``.

    Gap arithmetic runs in integer MICROSECONDS (``unix_micros``) so
    the boundary decision is exact and engine-portable (second-level
    epoch extraction truncates in Spark but rounds in DuckDB).  Both
    window passes share one (user, ts, id) sort; the running sum uses
    an explicit ROWS frame (ties are impossible — ``id_col`` breaks
    them — but implicit RANGE frames invite peer-row surprises)."""
    w = W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    new_s = F.when(
        prev.isNull()
        | ((us - F.unix_micros(prev)) > gap_seconds * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    run = (W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn("session_idx",
                         F.sum(new_s).over(run).cast("long"))


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """X84 — last-touch conversion attribution: for every user with at
    least one conversion event, credit the LAST non-conversion event
    strictly before the user's FIRST conversion, and count converters
    per attributed channel.  Users whose first conversion has no prior
    touch are reported under the 'direct' channel — the marketing
    attribution query every event warehouse runs.

    Two user-keyed hops, both shrinking: (1) one aggregate finds each
    converter's first conversion timestamp (one row per converter);
    (2) prior touches join that small table (broadcast when it fits)
    and a user-keyed max-struct aggregate picks the latest touch — no
    window over raw events, no collect_list.  Ties on the touch
    timestamp break by highest ``id_col`` so the pick is total-ordered
    and oracle-reproducible."""
    first_conv = (df.filter(F.col(type_col) == conversion_type)
                  .groupBy(user_col)
                  .agg(F.min(ts_col).alias("conv_ts")))
    touches = (df.filter(F.col(type_col) != conversion_type)
               .join(first_conv, user_col)
               .filter(F.col(ts_col) < F.col("conv_ts")))
    last_touch = (touches.groupBy(user_col)
                  .agg(F.max(F.struct(F.col(ts_col).alias("t"),
                                      F.col(id_col).alias("i"),
                                      F.col(type_col).alias("ch")))
                       .alias("s"))
                  .select(user_col, F.col("s.ch").alias("channel")))
    attributed = (first_conv.join(last_touch, user_col, "left")
                  .withColumn("channel",
                              F.coalesce(F.col("channel"),
                                         F.lit("direct"))))
    return (attributed.groupBy("channel")
            .agg(F.count(F.lit(1)).cast("long").alias("n_converters")))


def rolling_active_users(
    df: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """X85 — trailing-window distinct actives (the DAU/WAU board
    metric): for each calendar day present in the data, the count of
    distinct users seen in the trailing ``window_days`` days.

    A rolling DISTINCT cannot ride a window frame (COUNT(DISTINCT) is
    not frame-mergeable) and the naive day×events range join is
    quadratic.  The scale shape used here mirrors ``ewma_calendar``:
    dedup to (user, day) pairs first (one user/day-keyed aggregate —
    the big shrink), explode each pair onto the ≤``window_days``
    future days it keeps the user active for (bounded in-row
    expansion of an already-deduped table), then one day-keyed
    distinct count, semi-joined to days actually present so trailing
    ghost days don't appear."""
    day = F.col(ts_col).cast("date")
    user_days = (df.select(F.col(user_col).alias("u"), day.alias("d"))
                 .distinct())
    present = user_days.select("d").distinct()
    influenced = user_days.select(
        "u", F.explode(F.sequence(
            F.col("d"),
            F.date_add(F.col("d"), window_days - 1))).alias("day"))
    return (influenced.join(present.select(F.col("d").alias("day")),
                            "day", "semi")
            .groupBy("day")
            .agg(F.count_distinct("u").cast("long")
                 .alias("active_users")))


def burstiness(df: DataFrame, key_col: str, ts_col: str,
               order_col: str, min_gaps: int = 2,
               round_digits: int = 6) -> DataFrame:
    """X142 — inter-arrival burstiness per key: B = (σ−μ)/(σ+μ) over
    the gaps between consecutive events — −1 for a metronome, →0 for
    Poisson, →1 for bursty sessions; the bot-vs-human / retry-storm
    signature on ingest streams.

    One key-partitioned lag window (gaps), a key-keyed two-pass
    moment reduce.  The mean gap is floor-rounded BEFORE the variance
    pass and σ is computed from the explicit Σ(d−μ̂)² formula on both
    engines (library stddevs disagree in summation order at ulp
    scale); σ and μ round at 1e-2 s before B so the ratio is
    engine-identical.  Returns
    ``(key, n_gaps, mean_gap, std_gap, b)``."""
    p = 10 ** round_digits
    w = W.partitionBy(key_col).orderBy(ts_col, order_col)
    t = F.col(ts_col).cast("double")  # epoch seconds incl. fraction
    gaps = (df.withColumn("gap", t - F.lag(t).over(w))
            .filter(F.col("gap").isNotNull())
            .select(F.col(key_col), "gap"))
    # scope-registered: the returned plan reads gaps twice (mean pass +
    # variance pass); caller releases via cache_scope.release_persisted()
    gaps = scoped_persist(gaps)
    mu = gaps.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_gaps"),
        (F.floor(F.avg("gap") * 100 + F.lit(0.5)) / 100).alias("mu"))
    d = F.col("gap") - F.col("mu")
    return (gaps.join(mu, key_col)
            .filter(F.col("n_gaps") >= min_gaps)
            .groupBy(key_col)
            .agg(F.max("n_gaps").alias("n_gaps"),
                 F.max("mu").alias("mean_gap"),
                 (F.floor(F.sqrt(F.sum(d * d)
                                 / (F.max("n_gaps") - 1)) * 100
                          + F.lit(0.5)) / 100).alias("std_gap"))
            .withColumn(
                "b",
                F.floor(F.try_divide(
                    F.col("std_gap") - F.col("mean_gap"),
                    F.col("std_gap") + F.col("mean_gap")) * p
                    + F.lit(0.5)) / p))


def transition_dwell(df: DataFrame, key_col: str, ts_col: str,
                     type_col: str, order_col: str,
                     round_digits: int = 2) -> DataFrame:
    """X152 — transition dwell-time profile: for each (from_type,
    to_type) event transition, how long users dwell before making it
    (mean / median / p90 of the gap) — the timing companion of the
    Markov transition counts (X26): the count matrix says WHERE users
    go, this says HOW LONG they hesitate, which is what funnel SLAs
    and session-timeout tuning actually need.

    ONE key-partitioned lag window (previous type + timestamp), then
    one transition-keyed aggregate; the exact interpolated
    ``percentile`` holds O(distinct gap values) per transition cell
    (gaps quantize to seconds at 1e-2 — bounded), with
    ``percentile_approx`` the drop-in at unbounded cardinality.
    Returns ``(from_type, to_type, n, mean_s, p50_s, p90_s)``."""
    w = W.partitionBy(key_col).orderBy(ts_col, order_col)
    t = F.col(ts_col).cast("double")
    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    gaps = (df.withColumn("from_type", F.lag(type_col).over(w))
            .withColumn("gap", fr(t - F.lag(t).over(w)))
            .filter(F.col("from_type").isNotNull()))
    return (gaps.groupBy("from_type",
                         F.col(type_col).alias("to_type"))
            .agg(F.count("*").cast("long").alias("n"),
                 fr(F.avg("gap")).alias("mean_s"),
                 fr(F.expr("percentile(gap, 0.5)")).alias("p50_s"),
                 fr(F.expr("percentile(gap, 0.9)")).alias("p90_s")))


def burst_collapse(df: DataFrame, key_cols: list[str], ts_col: str,
                   id_col: str, tolerance_seconds: int = 5) -> DataFrame:
    """X171 — burst-collapse event dedup: consecutive events of the
    same key whose inter-arrival gap stays under ``tolerance_seconds``
    form one burst; only the FIRST event of each burst survives — the
    double-click / retry-storm / at-least-once-delivery cleaner that
    exact dedup (X1) can't express because the duplicates differ in
    timestamp.

    Same gaps-and-islands construction as :func:`sessionize` with the
    tolerance as the gap (one key-ordered window pass, integer
    microsecond arithmetic, ROWS frame), then the first row per island
    kept on the same sort — one shuffle total, both windows share it.
    Returns the surviving rows with ``burst_idx`` and ``burst_len``
    attached.
    """
    w = W.partitionBy(*key_cols).orderBy(F.col(ts_col), F.col(id_col))
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    new_b = F.when(
        prev.isNull()
        | ((us - F.unix_micros(prev)) > tolerance_seconds * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    tagged = (df.withColumn("__new", new_b)
              .withColumn("burst_idx", F.sum("__new").over(run)
                          .cast("long")))
    wb = W.partitionBy(*key_cols, "burst_idx")
    return (tagged
            .withColumn("burst_len", F.count("*").over(wb).cast("long"))
            .filter(F.col("__new") == 1)
            .drop("__new"))


def session_depth_profile(df: DataFrame, gap_seconds: int = 1800,
                          user_col: str = "user_id", ts_col: str = "ts",
                          id_col: str = "event_id",
                          type_col: str = "event_type",
                          round_digits: int = 4) -> DataFrame:
    """X172 — session depth / bounce profile by entry event type:
    sessionize (:func:`sessionize`, 30-min default gap), collapse to
    one row per session (depth, entry type via the min-(ts,id) event),
    then per entry type: session count, bounce rate (depth = 1), mean
    depth, p90 depth — the landing-page quality readout.

    The session collapse rides the SAME (user, ts, id) sort the
    sessionizer already shuffled; entry-type election orders a struct
    by (ts, id), and depths round before the per-type reduce.
    Returns ``(entry_type, n_sessions, n_bounce, bounce_rate,
    mean_depth, p90_depth)``.
    """
    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    s = sessionize(df, gap_seconds, user_col, ts_col, id_col)
    per_sess = (s.groupBy(user_col, "session_idx")
                .agg(F.count("*").cast("long").alias("depth"),
                     F.min(F.struct(F.col(ts_col), F.col(id_col),
                                    F.col(type_col)))[type_col]
                     .alias("entry_type")))
    return (per_sess.groupBy(F.col("entry_type"))
            .agg(F.count("*").cast("long").alias("n_sessions"),
                 F.sum((F.col("depth") == 1).cast("long"))
                 .alias("n_bounce"),
                 fr(F.avg((F.col("depth") == 1).cast("double")))
                 .alias("bounce_rate"),
                 fr(F.avg("depth")).alias("mean_depth"),
                 F.expr("percentile_cont(0.9) WITHIN GROUP "
                        "(ORDER BY depth)").alias("p90_depth")))


def transition_validity_audit(df: DataFrame, allowed: list[tuple],
                              key_col: str = "user_id",
                              ts_col: str = "ts",
                              id_col: str = "event_id",
                              state_col: str = "event_type") -> DataFrame:
    """X173 — state-machine transition validity audit: per observed
    (from, to) transition under the per-key (ts, id) order, count
    occurrences and flag whether the transition is in the ``allowed``
    whitelist — the referential-integrity analog for event SEQUENCES
    (an order that ships before it's placed, a session that purchases
    before it views).

    One key-ordered lag window (the X26 transition-matrix sort
    reused), one pair-keyed count, and an ``isin`` against the
    literal whitelist — |states| squared output rows.  Returns
    ``(from_state, to_state, n, is_allowed)``.
    """
    w = W.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (df.withColumn("__from", F.lag(F.col(state_col)).over(w))
             .filter(F.col("__from").isNotNull())
             .select(F.col("__from").alias("from_state"),
                     F.col(state_col).alias("to_state")))
    allowed_lit = [f"{a} {b}" for a, b in allowed]
    return (pairs.groupBy("from_state", "to_state")
            .agg(F.count("*").cast("long").alias("n"))
            .withColumn("is_allowed",
                        F.concat_ws(" ", "from_state", "to_state")
                        .isin(allowed_lit)))


def inactivity_profile(df: DataFrame, buckets_days: list[int],
                       key_col: str = "user_id",
                       ts_col: str = "ts") -> DataFrame:
    """X174 — churn / inactivity profile: each key's recency (days
    between its LAST event and the corpus high-water mark) bucketed
    into ``buckets_days`` bands (e.g. [7, 30] means active within 7d,
    lapsed within 30d, churned beyond) — the lifecycle segmentation
    every retention dashboard starts from.

    One key-keyed max aggregate, a crossJoin against the BROADCAST
    single-row high-water-mark aggregate (the X94 TTL shape), and a
    band bucketing expression — state is O(keys), one shuffle.
    Returns ``(bucket, n_keys, min_gap_days, max_gap_days)`` with
    integer day gaps (floor of the second gap / 86400).
    """
    last = df.groupBy(key_col).agg(F.max(F.col(ts_col)).alias("__last"))
    hwm = df.agg(F.max(F.col(ts_col)).alias("__hwm"))
    gap_days = F.floor(
        (F.unix_seconds(F.col("__hwm")) - F.unix_seconds(F.col("__last")))
        / 86400).cast("long")
    bucket = F.lit(f">{buckets_days[-1]}d")
    for b in reversed(sorted(buckets_days)):
        bucket = F.when(gap_days <= b, F.lit(f"<={b}d")).otherwise(bucket)
    return (last.crossJoin(F.broadcast(hwm))
            .withColumn("__gap", gap_days)
            .groupBy(bucket.alias("bucket"))
            .agg(F.count("*").cast("long").alias("n_keys"),
                 F.min("__gap").alias("min_gap_days"),
                 F.max("__gap").alias("max_gap_days")))


def position_attribution(df: DataFrame, conversion_type: str,
                         user_col: str = "user_id",
                         type_col: str = "event_type",
                         ts_col: str = "ts",
                         id_col: str = "event_id",
                         round_digits: int = 4) -> DataFrame:
    """X186 — position-based (U-shaped 40/20/40) multi-touch
    attribution: for every converter, the first touch before the
    first conversion gets 0.4 credit, the last touch 0.4, and the
    middle touches split 0.2 — the multi-touch companion of X84's
    last-touch model (one touch gets 1.0, two split 0.5/0.5, so
    per-user credit always sums to exactly 1).

    Same two shrinking user-keyed hops as X84 (first-conversion
    aggregate, prior-touch join) plus ONE user-keyed rank window over
    the touch table (already tiny relative to raw events) — no
    collect_list, no window over the raw stream.  Returns
    ``(channel, n_touches, credit)`` with credit floor-rounded.
    """
    first_conv = (df.filter(F.col(type_col) == conversion_type)
                  .groupBy(user_col)
                  .agg(F.min(ts_col).alias("conv_ts")))
    touches = (df.filter(F.col(type_col) != conversion_type)
               .join(first_conv, user_col)
               .filter(F.col(ts_col) < F.col("conv_ts")))
    w = W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    wn = W.partitionBy(user_col)
    t = (touches
         .withColumn("__rn", F.row_number().over(w))
         .withColumn("__n", F.count("*").over(wn)))
    n, rn = F.col("__n"), F.col("__rn")
    credit = (F.when(n == 1, 1.0)
              .when(n == 2, 0.5)
              .when(rn == 1, 0.4)
              .when(rn == n, 0.4)
              .otherwise(0.2 / (n - 2)))
    p = 10 ** round_digits
    return (t.withColumn("__c", credit)
            .groupBy(F.col(type_col).alias("channel"))
            .agg(F.count("*").cast("long").alias("n_touches"),
                 (F.floor(F.sum("__c") * p + F.lit(0.5)) / p)
                 .alias("credit")))


def cohort_retention_monthly(df: DataFrame,
                             user_col: str = "user_id",
                             ts_col: str = "ts",
                             round_digits: int = 4) -> DataFrame:
    """X187 — MONTHLY cohort retention triangle (the month-grain,
    distinct-user sibling of X19's `cohort_retention` weekly event
    counts): users are cohorted by the month of their FIRST event, then for every (cohort month, month
    offset) cell the triangle reports how many distinct cohort members
    were active that month and what share of the cohort that is — the
    canonical product-analytics retention matrix (the reference has no
    time axis at all; Amplitude/Mixpanel expose this as 'retention').

    Scale shape — every step keys on ``user_col`` or collapses:

    * first-touch: one user-keyed aggregate (map-side partials).
    * activity: fact ⋈ first-touch on the user key (both sides
      hash-partitioned the same), collapsed to DISTINCT
      (user, cohort, activity-month) — the distinct reuses the user
      partitioning, so one exchange feeds join + dedup.
    * triangle: aggregate on (cohort, offset) — at most
      months × months rows — and a window over that TINY table to
      pin each cohort's size (its offset-0 cell; every user is by
      construction active in their own cohort month).

    Month offsets are ``months_between`` on month-TRUNCATED stamps, so
    they are exact integers (no day-of-month fractions).  Returns
    ``(cohort_month, month_offset, n_active, cohort_size,
    retention)`` with retention floor-rounded.
    """
    first = (df.groupBy(user_col)
             .agg(F.min(ts_col).alias("__first_ts")))
    cohort = first.select(
        user_col,
        F.date_trunc("month", "__first_ts").alias("__cohort"))
    act = (df.join(cohort, user_col)
           .select(user_col, "__cohort",
                   F.date_trunc("month", ts_col).alias("__act"))
           .distinct())
    tri = (act.groupBy(
        F.col("__cohort"),
        F.months_between("__act", "__cohort").cast("long")
        .alias("month_offset"))
        .agg(F.count("*").cast("long").alias("n_active")))
    wc = W.partitionBy("__cohort")
    p = 10 ** round_digits
    size = F.max(F.when(F.col("month_offset") == 0,
                        F.col("n_active"))).over(wc)
    return (tri.withColumn("cohort_size", size)
            .select(F.col("__cohort").cast("date").alias("cohort_month"),
                    "month_offset", "n_active", "cohort_size",
                    (F.floor(F.col("n_active") / F.col("cohort_size")
                             * p + F.lit(0.5)) / p).alias("retention")))


def km_survival(df: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts", censor_days: int = 30,
                round_digits: int = 6) -> DataFrame:
    """X191 — Kaplan–Meier survival curve over user lifetimes with
    right-censoring: a user's lifetime is the day span from first to
    last event; a user whose last event falls within ``censor_days``
    of the corpus high-water mark is CENSORED (still alive as far as
    the data can tell), everyone else is an observed churn event.
    S(t) = Π_{u≤t} (1 − d_u/n_u) — the estimator that plain
    "avg lifetime" gets wrong by treating censored users as churned
    (X174's lifecycle bands are the band-level view; this is the
    full curve with censoring done properly).

    Scale shape: one user-keyed aggregate (first/last event), a
    broadcast 1-row high-water mark on a derived constant key (the
    X94 shape), then a collapse to one row per distinct lifetime-day
    — the survival table is O(days), and the two cumulative windows
    run over that TINY table (the X121/X135/X157 period-collapse
    contract: the ordered window never touches the fact table).
    d_u/n_u are ratios of small integers and the cumulative log-sum
    runs in lifetime order in BOTH engines, so the oracle agrees to
    the rounding grid.  A day where every remaining user dies sends
    the survivor function to EXACTLY 0 (tracked as a zero-factor
    count, not ln(0)).  Returns
    ``(t_days, at_risk, deaths, censored, survival)``.
    """
    per_user = (df.groupBy(user_col)
                .agg(F.to_date(F.min(ts_col)).alias("__first"),
                     F.to_date(F.max(ts_col)).alias("__last")))
    hwm = (df.agg(F.to_date(F.max(ts_col)).alias("__hwm"))
           .withColumn("__k", F.floor(F.month("__hwm") * 0)))
    pu = (per_user.withColumn("__k", F.floor(F.month("__first") * 0))
          .join(F.broadcast(hwm), "__k")
          .select(
              F.datediff("__last", "__first").cast("long")
              .alias("t_days"),
              (F.datediff("__hwm", "__last") < censor_days)
              .cast("int").alias("__cens")))
    day = (pu.groupBy("t_days")
           .agg(F.sum(1 - F.col("__cens")).cast("long")
                .alias("deaths"),
                F.sum("__cens").cast("long").alias("censored")))
    wo = W.orderBy("t_days")
    before = (F.coalesce(
        F.sum(F.col("deaths") + F.col("censored"))
        .over(wo.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)))
    total = F.sum(F.col("deaths") + F.col("censored")) \
        .over(wo.rowsBetween(W.unboundedPreceding,
                             W.unboundedFollowing))
    d = (day.withColumn("at_risk", (total - before).cast("long")))
    factor = 1.0 - F.col("deaths") / F.col("at_risk")
    run = wo.rowsBetween(W.unboundedPreceding, 0)
    d = (d.withColumn("__lnsum",
                      F.sum(F.when(factor > 0, F.log(factor))
                            .otherwise(F.lit(0.0))).over(run))
         .withColumn("__zeros",
                     F.sum(F.when(factor <= 0, 1).otherwise(0))
                     .over(run)))
    p = 10 ** round_digits
    surv = F.when(F.col("__zeros") > 0, F.lit(0.0)) \
        .otherwise(F.floor(F.exp("__lnsum") * p + F.lit(0.5)) / p)
    return d.select("t_days", "at_risk", "deaths", "censored",
                    surv.alias("survival"))


def new_vs_returning(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     round_digits: int = 4) -> DataFrame:
    """X202 — daily active users split into NEW (first-ever event
    that day) vs RETURNING — the growth-accounting decomposition
    behind every DAU chart (X85's rolling actives count the level;
    this explains it: is the level new acquisition or retention?).
    Cohort retention (X187) is the same first-touch join viewed
    month-by-cohort; this is the day-by-day marginal view.

    Scale shape: one user-keyed first-touch aggregate, one
    user-keyed join + (user, day) distinct on the same
    partitioning, then a day-keyed count — integer counts
    throughout, only the final share rounds.  Returns
    ``(day, dau, new_users, returning_users, pct_new)``.
    """
    first = (df.groupBy(user_col)
             .agg(F.to_date(F.min(ts_col)).alias("__first_day")))
    act = (df.join(first, user_col)
           .select(user_col, "__first_day",
                   F.to_date(ts_col).alias("day"))
           .distinct())
    p = 10 ** round_digits
    return (act.groupBy("day")
            .agg(F.count("*").cast("long").alias("dau"),
                 F.sum(F.when(F.col("day") == F.col("__first_day"), 1)
                       .otherwise(0)).cast("long").alias("new_users"))
            .withColumn("returning_users",
                        F.col("dau") - F.col("new_users"))
            .withColumn("pct_new",
                        F.floor(F.col("new_users") / F.col("dau")
                                * p + F.lit(0.5)) / p))


def decayed_engagement(df: DataFrame, group_col: str, ts_col: str,
                       half_life_days: float = 7.0,
                       round_digits: int = 4) -> DataFrame:
    """X214 — exponential-decay-weighted activity mass per group:
    each event contributes ``2^(−age_days / half_life)`` measured
    from the corpus high-water mark — the continuous
    recency×frequency score that replaces RFM's (X103) discrete
    recency bucket, and the freshness weighting a crawl-mixture
    decision uses (yesterday's million events outweigh last
    quarter's).

    Scale shape: broadcast 1-row high-water mark on a derived
    constant key (X94 shape), then ONE group aggregate — the decay
    weight is in-row arithmetic on integer day ages, and the same
    ``exp(ln2·…)``-free form ``pow(2, −age/h)`` keeps both engines
    on the identical expression.  Returns
    ``(group, n_events, decayed_mass, mass_share_of_count)``.
    """
    hwm = (df.agg(F.to_date(F.max(ts_col)).alias("__hwm"))
           .withColumn("__k", F.floor(F.month("__hwm") * 0)))
    d = (df.withColumn("__k", F.floor(F.month(ts_col) * 0))
         .join(F.broadcast(hwm), "__k"))
    age = F.datediff("__hwm", F.to_date(F.col(ts_col)))
    w = F.pow(F.lit(2.0), -age / F.lit(float(half_life_days)))
    p = 10 ** round_digits
    return (d.groupBy(F.col(group_col))
            .agg(F.count("*").cast("long").alias("n_events"),
                 (F.floor(F.sum(w) * p + F.lit(0.5)) / p)
                 .alias("decayed_mass"),
                 (F.floor(F.sum(w) / F.count("*") * p + F.lit(0.5))
                  / p).alias("mass_share_of_count")))


def conversion_latency(df: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts",
                       type_col: str = "event_type",
                       from_type: str = "click",
                       to_type: str = "purchase",
                       round_digits: int = 4) -> DataFrame:
    """X215 — conversion latency profile: among users whose first
    ``from_type`` event is eventually followed by a ``to_type``
    event, the distribution of that first-touch→first-conversion
    delay — X155's funnel counts WHO converts within a window; this
    profiles HOW LONG conversion takes (the number an SLA or a
    retargeting-delay decision needs).

    Scale shape: two user-keyed aggregates on the same partitioning
    (first ``from_type`` stamp; first ``to_type`` stamp at-or-after
    it via a conditional min over the user-keyed join) and one
    global reduce; percentiles run on the converters-only delay
    column with Spark's exact ``percentile`` (the interpolation
    twin of the oracle's ``percentile_cont``).  Returns one row:
    ``(n_users, n_converters, conv_rate, p50_s, p90_s)``.
    """
    first = (df.filter(F.col(type_col) == from_type)
             .groupBy(user_col)
             .agg(F.min(F.unix_micros(ts_col)).alias("__c")))
    conv = (df.filter(F.col(type_col) == to_type)
            .select(user_col, F.unix_micros(ts_col).alias("__p"))
            .join(first, user_col)
            .filter(F.col("__p") >= F.col("__c"))
            .groupBy(user_col)
            .agg(F.min(F.col("__p") - F.col("__c")).alias("__gap")))
    base = first.join(conv, user_col, "left")
    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    gap_s = F.col("__gap") / 1e6
    return base.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("__gap").cast("long").alias("n_converters"),
        fr(F.count("__gap") / F.count("*")).alias("conv_rate"),
        fr(F.expr("percentile(__gap, 0.5)") / 1e6).alias("p50_s"),
        fr(F.expr("percentile(__gap, 0.9)") / 1e6).alias("p90_s"))


def retention_curve_fit(df: DataFrame, user_col: str = "user_id",
                        ts_col: str = "ts", project_days: int = 3,
                        round_digits: int = 4) -> DataFrame:
    """X225 — pooled day-grain retention curve with a power-law fit
    and projection: users cohorted by first-event DAY, pooled
    retention r(t) = active(t)/at-cohort(t) per day offset, then
    ``ln r = a − b·ln t`` fit by closed-form OLS over observed
    offsets t ≥ 1 and projected ``project_days`` past the horizon —
    the growth-model shape (retention decays roughly as a power
    law) that turns X187's triangle into a forecast.

    Scale shape: X187's user-keyed join/distinct shape collapsed to
    a day-offset curve (O(days) rows), the OLS sums and the
    projection all run on that tiny table; the fit parameters ride
    along every row so the output is one self-contained table.
    Returns ``(t_days, kind 'observed'|'projected', retention)``.
    """
    first = (df.groupBy(user_col)
             .agg(F.to_date(F.min(ts_col)).alias("__f")))
    act = (df.join(first, user_col)
           .select(user_col, "__f", F.to_date(ts_col).alias("__d"))
           .distinct())
    curve = (act.groupBy(F.datediff("__d", "__f").cast("long")
                         .alias("t_days"))
             .agg(F.count("*").cast("double").alias("__active")))
    size = act.filter(F.col("__d") == F.col("__f")).count()
    obs = (curve.filter(F.col("t_days") >= 1)
           .withColumn("__r", F.col("__active") / F.lit(float(size)))
           .withColumn("__lnt", F.log(F.col("t_days").cast("double")))
           .withColumn("__lnr", F.log("__r")))
    fit = obs.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("__lnt").alias("sx"), F.sum("__lnr").alias("sy"),
        F.sum(F.col("__lnt") * F.col("__lnr")).alias("sxy"),
        F.sum(F.col("__lnt") * F.col("__lnt")).alias("sxx"))
    b = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    a = (F.col("sy") - b * F.col("sx")) / F.col("n")
    horizon = (obs.agg(F.max("t_days").alias("h"))
               .collect()[0]["h"])
    spark = df.sparkSession
    proj_t = spark.range(int(horizon) + 1,
                         int(horizon) + 1 + project_days) \
        .select(F.col("id").alias("t_days"))
    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    # project_days rows crossJoin the BROADCAST 1-row fit
    # aggregate (the X73/X184 shape; allowlisted in test_plans)
    proj = (proj_t.crossJoin(F.broadcast(fit))
            .select("t_days", F.lit("projected").alias("kind"),
                    fr(F.exp(a + b * F.log(
                        F.col("t_days").cast("double"))))
                    .alias("retention")))
    observed = obs.select("t_days", F.lit("observed").alias("kind"),
                          fr(F.col("__r")).alias("retention"))
    return observed.unionByName(proj)


def ltv_curve(df: DataFrame, user_col: str = "user_id",
              ts_col: str = "ts", type_col: str = "event_type",
              value_col: str = "value",
              revenue_type: str = "purchase",
              round_digits: int = 4) -> DataFrame:
    """X227 — LTV buildup curve: users cohorted by first-event DAY,
    revenue events pooled by day-of-life offset, and the running
    cumulative revenue PER USER by age — the payback-period view
    (X187/X225 track who comes back; this tracks what they're worth
    by age, which is what a CAC ceiling is set against).

    Scale shape: one user-keyed first-touch aggregate + user-keyed
    join, one offset-keyed reduce to the O(days) curve, then the
    cumulative window over that tiny table.  Daily revenue is
    rounded BEFORE the cumulative sum, so the running total is a
    sequential sum of identical doubles in both engines.  Returns
    ``(t_days, rev_day, cum_rev_per_user)``.
    """
    first = (df.groupBy(user_col)
             .agg(F.to_date(F.min(ts_col)).alias("__f")))
    size = first.count()
    rev = (df.filter(F.col(type_col) == revenue_type)
           .join(first, user_col)
           .groupBy(F.datediff(F.to_date(F.col(ts_col)), F.col("__f"))
                    .cast("long").alias("t_days"))
           .agg(F.sum(value_col).alias("__r")))
    p = 10 ** round_digits
    day = rev.select(
        "t_days",
        (F.floor(F.col("__r") * p + F.lit(0.5)) / p).alias("rev_day"))
    run = W.orderBy("t_days").rowsBetween(W.unboundedPreceding, 0)
    return day.withColumn(
        "cum_rev_per_user",
        F.floor(F.sum("rev_day").over(run) / F.lit(float(size))
                * p + F.lit(0.5)) / p)


def peak_concurrency(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """X233 — peak concurrency via a sweep line: each user's active
    span per day ([first, last] event, end exclusive) becomes a +1
    start point and a −1 end point; the running sum over the
    day-partitioned (time, delta) order is the instantaneous
    concurrency and its max is the day's peak — the capacity number
    (how many sessions at once) that per-hour COUNTs structurally
    cannot give, computed without any interval self-join.

    Tie discipline: at an identical microsecond, ends sort BEFORE
    starts (delta ascending), so back-to-back spans don't phantom-
    overlap; the end point is ``last_event + 1 µs`` so a
    single-event span still occupies its instant.  Equal (t, delta)
    points are interchangeable — the running sum ascends through
    them in any order, so the max is deterministic.

    Scale shape: one (day, user) aggregate, a 2× explode to
    endpoints, ONE day-partitioned sort window, one day reduce.
    Cross-midnight spans are split by the day collapse (stated —
    the grain is the contract).  Returns
    ``(day, n_sessions, peak_concurrency)``.
    """
    spans = (df.groupBy(F.to_date(ts_col).alias("day"),
                        F.col(user_col).alias("u"))
             .agg(F.min(F.unix_micros(ts_col)).alias("__s"),
                  (F.max(F.unix_micros(ts_col)) + 1).alias("__e")))
    pts = spans.select(
        "day",
        F.explode(F.array(
            F.struct(F.col("__s").alias("t"),
                     F.lit(1).alias("delta")),
            F.struct(F.col("__e").alias("t"),
                     F.lit(-1).alias("delta")))).alias("p")) \
        .select("day", F.col("p.t").alias("t"),
                F.col("p.delta").alias("delta"))
    w = (W.partitionBy("day").orderBy("t", "delta")
         .rowsBetween(W.unboundedPreceding, 0))
    run = F.sum("delta").over(w)
    return (pts.withColumn("__run", run)
            .groupBy("day")
            .agg((F.count("*") / 2).cast("long").alias("n_sessions"),
                 F.max("__run").cast("long")
                 .alias("peak_concurrency")))


def activity_streaks(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """X241 — consecutive-active-day streaks per user by
    gaps-and-islands: distinct active days minus a per-user row
    number collapse each consecutive run onto one anchor, and the
    runs aggregate to longest / count / final streak — the
    engagement metric (Duolingo's whole retention model) that DAU
    and X85's rolling actives can't see: the SAME 10 active days
    mean a different user at streak 10 vs 10 scattered singletons.

    Scale shape: one user-keyed distinct, one user-keyed
    ``row_number`` window on the SAME partitioning, one
    (user, anchor) aggregate, one user reduce — a single exchange
    end to end.  The final streak is elected by max-anchor struct,
    deterministically.  Returns
    ``(user, n_active_days, n_streaks, longest_streak,
    final_streak)``.
    """
    days = (df.select(F.col(user_col).alias("u"),
                      F.to_date(ts_col).alias("d"))
            .distinct())
    w = W.partitionBy("u").orderBy("d")
    anch = (days.withColumn(
        "__a", F.date_sub("d", F.row_number().over(w))))
    runs = (anch.groupBy("u", "__a")
            .agg(F.count("*").cast("long").alias("__len"),
                 F.max("d").alias("__end")))
    return (runs.groupBy(F.col("u").alias(user_col))
            .agg(F.sum("__len").cast("long").alias("n_active_days"),
                 F.count("*").cast("long").alias("n_streaks"),
                 F.max("__len").cast("long").alias("longest_streak"),
                 F.max(F.struct(F.col("__end").alias("e"),
                                F.col("__len").alias("l")))["l"]
                 .cast("long").alias("final_streak")))
