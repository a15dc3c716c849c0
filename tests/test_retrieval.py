"""Keyword retrieval (operators/retrieval.py): index stats, posting
lists, BM25 scoring vs a hand-computed fixture."""

from __future__ import annotations

import math

from sync_cosmos_db_spark.operators.retrieval import (bm25_topk,
                                                      build_inverted_index,
                                                      posting_lists)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a b a c"), (2, "a b"), (3, "c c c d"), (4, "d")],
        "doc_id long, text string")


def test_inverted_index_counts(spark):
    idx = {r.term: (r.df, r.tf_total)
           for r in build_inverted_index(_docs(spark)).collect()}
    assert idx == {"a": (2, 3), "b": (2, 2), "c": (2, 4), "d": (2, 2)}


def test_posting_lists_sorted_and_capped(spark):
    pl = {r.term: [(p.doc_id, p.tf) for p in r.postings]
          for r in posting_lists(_docs(spark), max_postings=1).collect()}
    # capped to the first posting by doc_id — deterministic prefix
    assert pl["c"] == [(1, 1)]
    full = {r.term: [(p.doc_id, p.tf) for p in r.postings]
            for r in posting_lists(_docs(spark)).collect()}
    assert full["c"] == [(1, 1), (3, 3)]


def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    docs = {d: t.split() for d, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {q: sum(1 for t in docs.values() if q in t) for q in terms}
    out = {}
    for d, toks in docs.items():
        s = 0.0
        for q in terms:
            tf = toks.count(q)
            if not tf or not df[q]:
                continue
            idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s:
            out[d] = math.floor(s * 1e6 + 0.5) / 1e6
    return out


def test_bm25_matches_reference(spark):
    corpus = [(1, "a b a c"), (2, "a b"), (3, "c c c d"), (4, "d")]
    got = {r.doc_id: r.score
           for r in bm25_topk(spark, _docs(spark), ["a", "d"], k=10).collect()}
    assert got == _bm25_ref(corpus, ["a", "d"])


def test_bm25_topk_order_and_limit(spark):
    rows = bm25_topk(spark, _docs(spark), ["c"], k=1).collect()
    assert len(rows) == 1 and rows[0].doc_id == 3  # tf=3 wins


def test_rrf_fuse_hand_computed(spark):
    from sync_cosmos_db_spark.operators.retrieval import rrf_fuse

    la = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3)],
        "qid string, doc long, rank long")
    lb = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 13, 2)],
        "qid string, doc long, rank long")
    out = {r.doc: r for r in
           rrf_fuse([la, lb], ["qid"], "doc", "rank", k=60).collect()}
    import math
    f6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    # doc 11 appears in both lists: 1/62 + 1/61
    assert out[11].n_lists == 2
    assert out[11].rrf_score == f6(1 / 62 + 1 / 61)
    assert out[11].fused_rank == 1
    assert out[10].rrf_score == f6(1 / 61) and out[10].fused_rank == 2
    assert out[13].rrf_score == f6(1 / 62) and out[13].fused_rank == 3
    assert out[12].rrf_score == f6(1 / 63) and out[12].fused_rank == 4


def test_rrf_fuse_top_n_and_validation(spark):
    import pytest as _pytest

    from sync_cosmos_db_spark.operators.retrieval import rrf_fuse

    la = spark.createDataFrame(
        [("q", d, r) for d, r in ((1, 1), (2, 2), (3, 3))],
        "qid string, doc long, rank long")
    assert rrf_fuse([la], ["qid"], "doc", top_n=2).count() == 2
    with _pytest.raises(ValueError):
        rrf_fuse([], ["qid"], "doc")
