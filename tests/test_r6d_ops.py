"""Unit tests for the round-6 fourth-batch families (X148-X152)."""

from __future__ import annotations

import datetime as dt

import pytest


def _sym(spark, pairs):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pairs, "src long, dst long")
    return (df.unionByName(df.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
            .distinct())


def test_min_label_propagation_two_components(spark):
    """Two disjoint triangles converge to their own minima; an
    isolated far node keeps its own id; 0 rounds = identity."""
    from sync_cosmos_db_spark.operators.graph import min_label_propagation

    edges = _sym(spark, [(1, 2), (2, 3), (3, 1),
                         (10, 11), (11, 12), (12, 10)])
    got = {r.node: r.label
           for r in min_label_propagation(edges, rounds=3).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    ident = {r.node: r.label
             for r in min_label_propagation(edges, rounds=0).collect()}
    assert all(k == v for k, v in ident.items())


def test_min_label_propagation_chain_horizon(spark):
    """On a path 1-2-3-4-5, after 2 rounds node 5's label is the min
    id within 2 hops (3), not the global min — the bounded horizon
    is exact."""
    from sync_cosmos_db_spark.operators.graph import min_label_propagation

    edges = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    got = {r.node: r.label
           for r in min_label_propagation(edges, rounds=2).collect()}
    assert got[5] == 3 and got[4] == 2 and got[3] == 1


def test_k_core_star_evaporates_triangle_core_survives(spark):
    """A K4 clique survives k=3 peeling; a star of pendants around a
    hub (each degree 1) evaporates entirely — including the hub,
    whose degree collapses once pendants drop."""
    from sync_cosmos_db_spark.operators.graph import k_core

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    star = [(100, p) for p in range(101, 106)]
    edges = _sym(spark, k4 + star)
    got = {r.node: r.degree for r in k_core(edges, k=3, rounds=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_tfidf_top_terms_ranks_distinctive_tokens(spark):
    """A token unique to one doc outranks a corpus-wide stopword
    (idf = ln(1) = 0); ranks are 1-based and capped at top_k."""
    from sync_cosmos_db_spark.operators.retrieval import tfidf_top_terms

    docs = [(1, "the the the zebra"), (2, "the cat"), (3, "the dog")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = tfidf_top_terms(df, "doc_id", "text", top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc, []).append((r.rank, r.token, r.score))
    top1 = sorted(by_doc[1])[0]
    assert top1[1] == "zebra" and top1[2] > 0
    # 'the' appears in every doc -> idf 0 -> score 0, never outranks
    assert all(tok != "the" or sc == 0.0
               for recs in by_doc.values() for _, tok, sc in recs)


def test_quantile_normalize_identical_groups_map_to_self(spark):
    """When every group already has the global shape (two identical
    groups), mapping is (close to) the identity on each group's
    sorted order; a shifted group maps onto global values."""
    from sync_cosmos_db_spark.operators.curation import quantile_normalize

    rows = [("a", i, float(i)) for i in range(10)] + \
           [("b", 100 + i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = quantile_normalize(df, "g", "id", "v").collect()
    # both groups interleave in the global order; the mapped value of
    # each group's rank-r element is the global value at the scaled
    # position — for identical groups that is within one step of v
    for r in out:
        assert abs(r.mapped - r.v) <= 1.0


def test_transition_dwell_hand_sequence(spark):
    """a->b after 10 s and 30 s, b->a after 20 s: transition (a,b)
    has n=2, mean 20, p50 20; (b,a) has n=1, all stats 20."""
    from sync_cosmos_db_spark.operators.behavioral import transition_dwell

    t0 = dt.datetime(2024, 1, 1)
    seq = [("a", 0), ("b", 10), ("a", 30), ("b", 60)]
    rows = [(1, t0 + dt.timedelta(seconds=s), ty, i)
            for i, (ty, s) in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")
    got = {(r.from_type, r.to_type): r
           for r in transition_dwell(df, "user_id", "ts",
                                     "event_type", "event_id").collect()}
    ab = got[("a", "b")]
    assert ab.n == 2 and ab.mean_s == 20.0 and ab.p50_s == 20.0
    ba = got[("b", "a")]
    assert ba.n == 1 and ba.mean_s == 20.0 and ba.p90_s == 20.0
