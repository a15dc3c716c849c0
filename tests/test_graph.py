"""PageRank (operators/graph.py): invariants on small graphs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w double")


def test_uniform_cycle_stays_uniform(spark):
    # 3-cycle with equal weights: the stationary distribution is uniform,
    # and every iteration preserves it exactly.
    e = _edges(spark, [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)])
    pr = {r.node: r.pr for r in pagerank(e, n_iter=5).collect()}
    for v in pr.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_mass_conserved_without_dangling(spark):
    # every node has out-edges → total rank mass stays 1.
    e = _edges(spark, [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 3.0),
                       (3, 1, 2.0), (3, 2, 1.0)])
    pr = pagerank(e, n_iter=4)
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_authority_ordering(spark):
    # star graph: everything points at hub 1 (and back, so no dangling);
    # the hub must outrank every leaf.
    rows = []
    for leaf in (2, 3, 4, 5):
        rows += [(leaf, 1, 1.0), (1, leaf, 1.0)]
    pr = {r.node: r.pr
          for r in pagerank(_edges(spark, rows), n_iter=6).collect()}
    hub = pr.pop(1)
    assert all(hub > v for v in pr.values())


def test_weights_shift_rank(spark):
    # 1 sends 9x more weight to 2 than to 3 (with return edges so the
    # chain mixes): 2 must outrank 3.
    e = _edges(spark, [(1, 2, 9.0), (1, 3, 1.0),
                       (2, 1, 1.0), (3, 1, 1.0)])
    pr = {r.node: r.pr for r in pagerank(e, n_iter=8).collect()}
    assert pr[2] > pr[3]


def test_isolated_receiver_gets_teleport_only(spark):
    # node 3 has an in-edge but its only "activity" is inbound; node 4
    # appears only as a dst of a zero-contribution path — here: 3 has no
    # out-edges (dangling), so its rank leaks but others still get the
    # teleport floor.
    e = _edges(spark, [(1, 2, 1.0), (2, 1, 1.0), (1, 3, 1.0)])
    pr = {r.node: r.pr for r in pagerank(e, n_iter=3).collect()}
    teleport = (1 - 0.85) / 3
    assert all(v >= teleport - 1e-12 for v in pr.values())


def test_no_lingering_cache(spark):
    # every INTERMEDIATE cache (nodes, normalized edges, per-iteration
    # rank vectors) is released inside pagerank; only the documented
    # result cache remains, and the caller's unpersist returns the
    # session to its prior cache census.
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    e = _edges(spark, [(1, 2, 1.0), (2, 1, 1.0)])
    pr = pagerank(e, n_iter=2)
    pr.collect()
    assert jsc.getPersistentRDDs().size() == before + 1  # just the result
    pr.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() == before


def test_n_iter_zero_is_uniform(spark):
    e = _edges(spark, [(1, 2, 1.0), (2, 1, 1.0)])
    pr = {r.node: r.pr for r in pagerank(e, n_iter=0).collect()}
    assert pr == {1: 0.5, 2: 0.5}


def test_negative_iter_raises(spark):
    e = _edges(spark, [(1, 2, 1.0)])
    with pytest.raises(ValueError):
        pagerank(e, n_iter=-1)


def test_bfs_hops_line_graph(spark):
    """1-2-3-4-5 line, seed {1}, max_hops=3: hops are path distances
    and node 5 stays unreached."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.graph import bfs_hops

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    e = spark.createDataFrame(pairs, "a long, b long")
    edges = (e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(e.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.hops for r in bfs_hops(edges, seeds, 3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_early_exit_and_min_hop(spark):
    """A triangle plus a long way round: BFS keeps the MIN hop count,
    and an exhausted frontier stops the loop before max_hops."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.graph import bfs_hops

    # 1-2, 2-3, 1-3 (3 reachable at hop 1 via direct edge)
    pairs = [(1, 2), (2, 3), (1, 3)]
    e = spark.createDataFrame(pairs, "a long, b long")
    edges = (e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(e.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"))))
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.hops for r in bfs_hops(edges, seeds, 10).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


def test_bellman_ford_prefers_cheap_long_path(spark):
    """1→2 direct costs 10; 1→3→2 costs 2 — two relax rounds must
    find the cheaper 2-edge path; one round only sees the direct."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators.graph import bellman_ford

    rows = [(1, 2, 10), (1, 3, 1), (3, 2, 1)]
    e = spark.createDataFrame(rows, "a long, b long, w long")
    edges = (e.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                      "w")
             .unionByName(e.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst"), "w")))
    seeds = spark.createDataFrame([(1,)], "node long")
    two = {r.node: r.cost for r in
           bellman_ford(edges, seeds, rounds=2).collect()}
    assert two == {1: 0, 3: 1, 2: 2}
    one = {r.node: r.cost for r in
           bellman_ford(edges, seeds, rounds=1).collect()}
    assert one[2] == 10  # direct edge only after a single round


def test_bellman_ford_rejects_negative_weights(spark):
    import pytest

    from sync_cosmos_db_spark.operators.graph import bellman_ford

    edges = spark.createDataFrame([(1, 2, -5)], "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="negative edge weights"):
        bellman_ford(edges, seeds, rounds=1)


# ---------------------------------------------------------------------------
# Round-15 regressions: every iterative operator consumes its edge
# input in ONE pass (the connected_components single-pass discipline)
# ---------------------------------------------------------------------------

def _tagged_edges(spark, rows, schema="src long, dst long, w double"):
    """An edge source that counts how many times each input row is
    actually computed (the round-14 CC test mechanism — deterministic
    in local mode: tiny data, no task retries)."""
    counter = spark.sparkContext.accumulator(0)
    base = spark.createDataFrame(rows, schema)

    def tag(batches):
        for pdf in batches:
            counter.add(len(pdf))
            yield pdf

    return base.repartition(2).mapInPandas(tag, base.schema), counter


_E3 = [(1, 2, 1.0), (2, 3, 1.0), (10, 11, 2.0)]


def test_symmetrize_single_pass_and_both_directions(spark):
    from sync_cosmos_db_spark.operators.graph import symmetrize

    edges, c = _tagged_edges(spark, _E3)
    rows = sorted(map(tuple, symmetrize(edges).collect()))
    assert rows == sorted([(1, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0),
                           (3, 2, 1.0), (10, 11, 2.0), (11, 10, 2.0)])
    assert c.value == 3, (
        f"symmetrize computed {c.value} source rows for 3 input edges")


def test_bellman_ford_single_pass_over_edges(spark):
    # pre-fix: probe + 3 relax rounds re-executed the edge plan every
    # time (x2 via the callers' union symmetrization) = 8 passes.
    from sync_cosmos_db_spark.operators.graph import bellman_ford, symmetrize

    edges, c = _tagged_edges(spark, _E3)
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.cost for r in
           bellman_ford(symmetrize(edges), seeds, rounds=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2}
    assert c.value == 3, (
        f"edge source computed {c.value} rows for 3 input edges — "
        "bellman_ford must cache its edge relation across rounds")


def test_min_label_propagation_single_pass_over_edges(spark):
    from sync_cosmos_db_spark.operators.graph import (
        min_label_propagation,
        symmetrize,
    )

    edges, c = _tagged_edges(spark, _E3)
    out = {r.node: r.label for r in
           min_label_propagation(symmetrize(edges), rounds=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert c.value == 3, (
        f"edge source computed {c.value} rows for 3 input edges — "
        "min_label_propagation must cache its edge relation")


def test_bfs_hops_single_pass_over_edges(spark):
    from sync_cosmos_db_spark.operators.graph import bfs_hops, symmetrize

    edges, c = _tagged_edges(spark, _E3)
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.hops for r in
           bfs_hops(symmetrize(edges), seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2}
    assert c.value == 3, (
        f"edge source computed {c.value} rows for 3 input edges — "
        "bfs_hops must cache its edge relation across hops")


def test_pagerank_single_pass_over_edges(spark):
    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.operators.graph import pagerank, symmetrize

    edges, c = _tagged_edges(spark, _E3)
    pr = pagerank(symmetrize(edges), n_iter=3)
    assert pr.count() == 5
    release_persisted()
    assert c.value == 3, (
        f"edge source computed {c.value} rows for 3 input edges — "
        "pagerank must derive e/nodes from one cached materialization")


def test_k_core_single_pass_over_edges(spark):
    from sync_cosmos_db_spark.operators.graph import k_core, symmetrize

    edges, c = _tagged_edges(spark, _E3)
    out = k_core(symmetrize(edges), k=1, rounds=3).collect()
    assert len(out) == 5
    assert c.value == 3, (
        f"edge source computed {c.value} rows for 3 input edges")


def test_hits_single_pass_and_checkpointed_scores(spark):
    # pre-fix: the lazy h/a chains referenced e 2*iters+1 times and the
    # final hub∪authority union executed the whole converged chain once
    # per branch.
    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.operators.graph import hits_scores

    edges, c = _tagged_edges(spark, _E3)
    out = hits_scores(edges, iters=3).collect()
    assert {r.kind for r in out} == {"hub", "authority"}
    release_persisted()
    assert c.value == 3, (
        f"edge source computed {c.value} rows for 3 input edges — "
        "hits_scores must cache e and checkpoint the converged scores")


def test_caller_persisted_edges_survive_operator_calls(spark):
    # ADVICE r15: the operators used to persist/unpersist the
    # caller-supplied edges unconditionally, so a caller that cached one
    # edge plan to share across several operator calls silently lost
    # the cache after the first call (recompute, not corruption).  Now
    # a caller-owned cache is left alone — and still counts as the
    # single materialization (1 pass over the edge source across BOTH
    # operator calls, not 1 per call).
    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.operators.graph import (
        bfs_hops, hits_scores, min_label_propagation, symmetrize)

    edges, c = _tagged_edges(spark, _E3)
    sym = symmetrize(edges).persist()
    try:
        sym.count()
        assert c.value == 3
        seeds = spark.createDataFrame([(1,)], "node long")
        assert bfs_hops(sym, seeds, max_hops=2).count() > 0
        assert sym.is_cached, "bfs_hops dropped the caller's cache"
        assert min_label_propagation(sym, rounds=2).count() > 0
        assert sym.is_cached, ("min_label_propagation dropped the "
                               "caller's cache")
        assert hits_scores(sym, iters=2).count() > 0
        release_persisted()
        assert sym.is_cached, "hits_scores dropped the caller's cache"
        assert c.value == 3, (
            f"edge source computed {c.value} rows for 3 input edges "
            "across 3 operator calls sharing one caller-owned cache")
    finally:
        sym.unpersist(blocking=True)
