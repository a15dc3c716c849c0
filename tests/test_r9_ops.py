"""Unit tests for the round-9 selection operators (X255-X258)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_token_budget_greedy_prefix(spark):
    """Selection = exact greedy prefix under (score DESC, id):
    every kept doc starts inside the budget, the kept set is a prefix
    of the rank order, and overshoot is at most one document."""
    from sync_cosmos_db_spark.operators.curation import token_budget_select

    rows = [(i, float(100 - i), 10 * (i % 3 + 1)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, score double, nt long")
    out = token_budget_select(df, "id", "score", "nt", budget=95)
    got = sorted((r.id, r.tokens_before) for r in out.collect())
    # rank order == id order here (score strictly decreasing in id)
    cum, expect = 0, []
    for i, (_, s, nt) in enumerate(rows):
        if cum < 95:
            expect.append((i, cum))
        cum += nt
    assert got == expect
    total = sum(nt for (i, _, nt), (j, _o) in zip(rows, expect))
    kept_tokens = sum(rows[i][2] for i, _ in expect)
    assert kept_tokens >= 95  # budget filled
    assert kept_tokens - rows[expect[-1][0]][2] < 95  # ≤1-doc overshoot


def test_token_budget_no_single_partition_exchange(spark):
    """The X151 discipline: no SinglePartition exchange in the plan."""
    from sync_cosmos_db_spark.operators.curation import token_budget_select

    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("score"),
        F.lit(10).cast("long").alias("nt"))
    plan = token_budget_select(df, "id", "score", "nt", budget=500) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_curriculum_positions_unique_and_interleaved(spark):
    from sync_cosmos_db_spark.queries_r9 import (
        curriculum_interleave_documents,  # noqa: F401
    )
    from pyspark.sql import Window as W

    rows = [(i, "s%d" % (i % 3), "w " * (i + 1)) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    t = docs.select("doc_id", "source",
                    F.size(F.split("text", " ")).cast("long")
                    .alias("n_tokens"))
    sources = (t.select("source").distinct()
               .withColumn("source_rank",
                           F.row_number().over(W.orderBy("source"))
                           .cast("long")))
    n_src = sources.agg(F.count(F.lit(1)).alias("n_sources"))
    rk = F.row_number().over(
        W.partitionBy("source").orderBy("n_tokens", "doc_id")).cast("long")
    out = (t.withColumn("rank_in_source", rk)
           .join(F.broadcast(sources), "source")
           .crossJoin(F.broadcast(n_src))
           .select("doc_id", "source", "rank_in_source",
                   ((F.col("rank_in_source") - 1) * F.col("n_sources")
                    + F.col("source_rank")).alias("position"))).collect()
    positions = [r.position for r in out]
    assert len(positions) == len(set(positions))  # unique
    # the first |sources| positions are one doc from EACH source
    first = sorted(out, key=lambda r: r.position)[:3]
    assert {r.source for r in first} == {"s0", "s1", "s2"}
    # within a source, position strictly increases with rank
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append((r.rank_in_source, r.position))
    for v in by_src.values():
        v.sort()
        assert all(p1 < p2 for (_, p1), (_, p2) in zip(v, v[1:]))


def test_temperature_weights_limits(spark):
    from sync_cosmos_db_spark.operators.curation import (
        temperature_mixture_weights,
    )

    df = spark.createDataFrame(
        [("a",)] * 90 + [("b",)] * 10, "g string")
    # tau=1 → proportional
    w1 = {r.group: r.weight for r in
          temperature_mixture_weights(df, "g", tau=1.0).collect()}
    assert abs(w1["a"] - 0.9) < 1e-6 and abs(w1["b"] - 0.1) < 1e-6
    # tau=0 → uniform
    w0 = {r.group: r.weight for r in
          temperature_mixture_weights(df, "g", tau=0.0).collect()}
    assert abs(w0["a"] - 0.5) < 1e-6 and abs(w0["b"] - 0.5) < 1e-6
    # tau=0.7 sits between, weights sum to ~1, minority epochs > majority
    rows = {r.group: r for r in
            temperature_mixture_weights(df, "g", tau=0.7).collect()}
    assert 0.5 < rows["a"].weight < 0.9
    assert abs(rows["a"].weight + rows["b"].weight - 1.0) < 1e-5
    assert rows["b"].epochs > rows["a"].epochs


def test_minhash_calibration_twins_exact(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import minhash_estimate_calibration

    out = minhash_estimate_calibration(spark, sf_dir).collect()
    assert out, "no calibration pairs"
    assert all(r.n_violations == 0 for r in out)
    twins = [r for r in out if r.id_b == r.id_a + 100000]
    assert twins and all(r.exact_j == 1.0 for r in twins)
    adj = [r for r in out if r.id_b == r.id_a + 1]
    assert adj and all(r.exact_j < 1.0 for r in adj)
