"""Declarative data-quality expectations: evaluate a rule set against
a table in ONE scan and emit a per-rule violation report.

The reference's only quality surface is the id/pk validity split
(``/root/reference/src/document_model.py``, mirrored in
``document_model.split_valid_invalid``); production pipelines need the
generalized form — "these invariants must hold, tell me how badly they
don't" (the Deequ / dbt-test / Great-Expectations shape).

Scale design: every row-local rule compiles to
``sum(CASE WHEN violated THEN 1 ELSE 0 END)`` inside a single
aggregate, so N rules cost ONE pass over the table and the output is N
tiny rows — at 100 TB the scan dominates and adding a rule is free.
Referential rules (foreign key exists in a dimension) are the one
exception: each adds a broadcast LEFT ANTI join (the dimension's keys
ship to the executors; the fact never shuffles).  Rules are plain
Column predicates, so Catalyst folds constants and prunes columns the
rule set doesn't touch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level predicates (True = row VIOLATES the
    rule).  Returns ``(rule, n_violations, n_rows, pass_rate)`` — one
    row per rule, one scan total.

    Rule names surface only as Column LITERALS (the aggregates are
    aliased positionally), so any name — spaces, quotes, unicode — is
    safe: nothing is interpolated into a SQL string (round-3 ADVICE,
    expectations.py:36)."""
    aggs = [F.sum(F.when(cond, 1).otherwise(0)).cast("long")
            .alias(f"__r{i}") for i, cond in enumerate(rules.values())]
    counts = df.agg(F.count("*").cast("long").alias("__n"), *aggs)
    # one wide row -> long form via explode of (rule, count) structs
    # (in-row, no shuffle)
    entries = F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col(f"__r{i}").alias("n_violations"))
        for i, name in enumerate(rules)])
    long_form = counts.select(
        F.explode(entries).alias("e"), F.col("__n")).select(
        F.col("e.rule").alias("rule"),
        F.col("e.n_violations").alias("n_violations"),
        F.col("__n"))
    rate = (F.lit(1.0)
            - F.col("n_violations").cast("double") / F.col("__n"))
    return long_form.select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("__n").alias("n_rows"),
        (F.floor(rate * 1000000 + F.lit(0.5)) / 1000000).alias("pass_rate"))


def referential_violations(fact: DataFrame, fact_key: str,
                           dim: DataFrame, dim_key: str) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` has no match in
    ``dim[dim_key]`` (NULL keys are violations too, matching FK
    semantics with required keys).  Broadcast LEFT ANTI — the fact
    side never shuffles."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return fact.join(F.broadcast(keys), fact_key, "left_anti")


def fd_violations(df: DataFrame, fds: list[tuple[str, str]]) -> DataFrame:
    """X76 — functional-dependency audit: for each candidate FD
    ``lhs → rhs``, how many lhs values map to MORE than one distinct
    rhs (the violation count a schema-inference or key-discovery pass
    acts on).

    Returns one row per candidate: (fd, n_lhs, n_violating_lhs,
    max_rhs_per_lhs).  Scale: one groupBy per FD on its lhs (shuffle
    key = lhs) over a two-column projection — Catalyst prunes the scan
    to exactly the columns each FD touches — then a tiny union of
    per-FD single-row summaries."""
    outs = []
    for lhs, rhs in fds:
        per = (df.select(F.col(lhs).alias("l"), F.col(rhs).alias("r"))
               .groupBy("l")
               .agg(F.countDistinct("r").alias("nr")))
        outs.append(per.agg(
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("nr") > 1, 1).otherwise(0)).cast("long")
            .alias("n_violating_lhs"),
            F.max("nr").cast("long").alias("max_rhs_per_lhs")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def missingness_patterns(df: DataFrame,
                         cols: list[str],
                         round_digits: int = 6) -> DataFrame:
    """X197 — missingness-pattern audit: one row per observed NULL
    PATTERN across ``cols`` (a '1'/'0' string, '1' = missing), with
    count and share — the co-missingness view that per-column null
    rates hide (two fields each 10% null is a different dataset
    depending on whether they go missing TOGETHER, and imputation /
    quarantine policy depends on which).  The pattern table is at
    most 2^|cols| rows.

    Scale shape: the pattern string is built in-row, one aggregate
    with map-side partials produces the ≤2^k-row table, and the
    share denominator is a window total over that tiny table —
    integer counts throughout, only the final share rounds.
    Returns ``(pattern, n_rows, share)``.
    """
    from pyspark.sql import Window as W

    pat = F.concat(*[F.when(F.col(c).isNull(), F.lit("1"))
                     .otherwise(F.lit("0")) for c in cols])
    agg = (df.select(pat.alias("pattern"))
           .groupBy("pattern")
           .agg(F.count("*").cast("long").alias("n_rows")))
    total = F.sum("n_rows").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    p = 10 ** round_digits
    return agg.select(
        "pattern", "n_rows",
        (F.floor(F.col("n_rows") / total * p + F.lit(0.5)) / p)
        .alias("share"))


def drift_gate(baseline: DataFrame, current: DataFrame,
               value_col: str, cat_col: str,
               bucket_edges: list[float],
               count_warn: float = 0.5, psi_warn: float = 0.2,
               round_digits: int = 6) -> DataFrame:
    """X204 — nightly drift-gate verdict: ONE table that answers
    "may this snapshot ship?" by combining the three checks a data
    contract actually needs — row-count delta, PSI of a numeric
    distribution over FIXED bucket edges, and categorical-domain
    membership (new or vanished categories) — each with a
    PASS/WARN verdict against declared thresholds.  X28 (snapshot
    diff), X79 (PSI) and X51 (schema evolution) are the parts; this
    is the gate that pipelines page on.

    Scale shape: each side is scanned ONCE per check (count, fixed-
    edge bucket histogram, category distinct) — all map-side
    partial aggregates joined as tiny broadcast tables on derived
    constant keys.  Fixed edges make PSI deterministic (no
    quantiles); empty buckets get a floor count of 0.5 on BOTH
    sides of the log ratio, stated.  Returns
    ``(check, metric, verdict)``.
    """
    from pyspark.sql import Window as W

    def bucket(c):
        b = F.lit(0)
        for i, e in enumerate(bucket_edges):
            b = F.when(F.col(c) > e, F.lit(i + 1)).otherwise(b)
        return b

    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731

    nb = baseline.count()
    nc = current.count()
    # an empty baseline reports a NULL metric (and WARN), never an
    # inf that floor-rounding would mangle
    delta = abs(nc - nb) / nb if nb else None

    full = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    hb = (baseline.groupBy(bucket(value_col).alias("b"))
          .agg(F.count("*").cast("double").alias("cb")))
    hc = (current.groupBy(bucket(value_col).alias("b"))
          .agg(F.count("*").cast("double").alias("cc")))
    h = (hb.join(hc, "b", "full")
         .select(F.coalesce("cb", F.lit(0.5)).alias("cb"),
                 F.coalesce("cc", F.lit(0.5)).alias("cc")))
    h = (h.withColumn("pb", F.col("cb") / F.sum("cb").over(full))
         .withColumn("pc", F.col("cc") / F.sum("cc").over(full)))
    psi_row = h.agg(F.sum(
        (F.col("pc") - F.col("pb"))
        * F.log(F.col("pc") / F.col("pb"))).alias("psi"))
    psi = psi_row.collect()[0]["psi"]

    cats_b = {r["c"] for r in
              baseline.select(F.col(cat_col).alias("c"))
              .distinct().collect()}
    cats_c = {r["c"] for r in
              current.select(F.col(cat_col).alias("c"))
              .distinct().collect()}
    n_changed = len(cats_b ^ cats_c)

    spark = baseline.sparkSession
    rows = [
        ("row_count_delta",
         float(delta) if delta is not None else None,
         "PASS" if delta is not None and delta <= count_warn
         else "WARN"),
        ("psi_" + value_col, float(psi),
         "PASS" if psi <= psi_warn else "WARN"),
        ("category_domain_" + cat_col, float(n_changed),
         "PASS" if n_changed == 0 else "WARN"),
    ]
    out = spark.createDataFrame(
        rows, "check string, metric double, verdict string")
    return out.select("check", fr(F.col("metric")).alias("metric"),
                      "verdict")


def candidate_key_audit(df: DataFrame,
                        combos: list[list[str]],
                        round_digits: int = 6) -> DataFrame:
    """X209 — candidate-key discovery audit: for each declared
    column combination, the exact distinct-tuple count, uniqueness
    ratio and is-key verdict — the profiling step that finds (or
    refutes) a merge key before anyone writes a join, and the
    uniqueness side of what X76's FD audit checks for dependencies.

    Scale shape: one two-level aggregate per combo (distinct is a
    keyed aggregate with map-side partials, never a global sort);
    the per-combo results are single rows unioned together, so the
    output is |combos| rows.  NULLs count as ordinary values
    (SQL-distinct semantics), stated.  Returns
    ``(candidate, n_rows, n_distinct, uniqueness, is_key)``.
    """
    p = 10 ** round_digits
    outs = []
    for combo in combos:
        name = "+".join(combo)
        agg = (df.groupBy(*combo).agg(F.count("*").alias("__c"))
               .agg(F.sum("__c").cast("long").alias("n_rows"),
                    F.count("*").cast("long").alias("n_distinct")))
        outs.append(agg.select(
            F.lit(name).alias("candidate"), "n_rows", "n_distinct",
            (F.floor(F.col("n_distinct") / F.col("n_rows")
                     * p + F.lit(0.5)) / p).alias("uniqueness"),
            (F.col("n_distinct") == F.col("n_rows")).alias("is_key")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def header_detail_reconciliation(header: DataFrame, detail: DataFrame,
                                 key_col: str, header_amt: str,
                                 detail_amt: str, group_col: str,
                                 tol_pct: float = 1.0,
                                 round_digits: int = 4) -> DataFrame:
    """X236 — header/detail reconciliation: per group, how well the
    header table's amount agrees with the sum of its detail rows —
    match rate within a declared tolerance, the median
    header/detail ratio (a SYSTEMATIC ratio ≠ 1 means a formula
    mismatch like tax/discount, not noise), and the p90 absolute
    percentage error — the cross-TABLE twin of X76's within-table
    FD audit, and the first query any finance closing process runs.

    Scale shape: one key-keyed detail aggregate + one key-keyed
    join (same partitioning), then a group reduce with exact
    percentiles over the O(group-size) ratio column.  Headers with
    no detail rows are excluded and counted (stated in the output).
    Returns ``(group, n_matched_rows, n_no_detail, n_within_tol,
    median_ratio, p90_abs_pct_err)``.
    """
    d = (detail.groupBy(F.col(key_col))
         .agg(F.sum(detail_amt).alias("__ds")))
    j = header.join(d, key_col, "left")
    ratio = F.col(header_amt) / F.col("__ds")
    err = F.abs(F.col(header_amt) - F.col("__ds")) \
        / F.col(header_amt) * 100
    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    return (j.groupBy(F.col(group_col))
            .agg(F.count("__ds").cast("long").alias("n_matched_rows"),
                 F.sum(F.col("__ds").isNull().cast("long"))
                 .cast("long").alias("n_no_detail"),
                 F.sum((err <= tol_pct).cast("long")).cast("long")
                 .alias("n_within_tol"),
                 fr(F.percentile(ratio, F.lit(0.5)))
                 .alias("median_ratio"),
                 fr(F.percentile(err, F.lit(0.9)))
                 .alias("p90_abs_pct_err")))
