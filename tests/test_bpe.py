"""Distributed BPE (operators/bpe.py) pinned against a pure-Python
reference implementation of the Sennrich et al. merge loop."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators import bpe as B


def _ref_bpe(texts, n_merges):
    wc = collections.Counter(w for t in texts for w in t.split())
    syms = {w: list(w) + [B.EOW] for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        mx = max(pc.values())
        a, b = sorted(k for k, v in pc.items() if v == mx)[0]
        merges.append((a, b, mx))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


TEXTS = ["low low lower lowest newest new",
         "newest newer low wide wider widest"]


def _df(spark):
    return spark.createDataFrame([(t,) for t in TEXTS], "text string")


def test_merges_match_reference(spark):
    ref, _ = _ref_bpe(TEXTS, 6)
    assert B.bpe_learn(spark, _df(spark), 6) == ref


def test_segmentation_matches_reference(spark):
    merges = B.bpe_learn(spark, _df(spark), 4)
    ref_merges, ref_syms = _ref_bpe(TEXTS, 4)
    assert merges == ref_merges
    wc = B._init_symbols(B.word_counts(_df(spark)))
    got = {r.word: list(r.s) for r in
           wc.select("word", B.segment_with_merges(
               F.col("symbols"), merges).alias("s")).collect()}
    assert got == {w: s for w, s in ref_syms.items()}


def test_overlapping_pair_merges_left_to_right(spark):
    # 'aaa' + (a,a) merge must produce [aa, a, EOW], not [aa, aa...]
    df = spark.createDataFrame([("aaa aaa",)], "text string")
    wc = B._init_symbols(B.word_counts(df))
    seg = wc.select(B.segment_with_merges(
        F.col("symbols"), [("a", "a", 0)]).alias("s")).collect()
    assert list(seg[0].s) == ["aa", "a", B.EOW]


def test_unpersists_cached_tables(spark):
    """DELTA census (round-8 verdict item 2): bpe_learn itself must add
    zero persisted RDDs — a global ``== 0`` assert in the shared test
    session blamed bpe for OTHER tests' leaks (those are now caught by
    the per-module census fixture in conftest.py)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    B.bpe_learn(spark, _df(spark), 2)
    assert jsc.getPersistentRDDs().size() == before


def test_encode_documents_matches_reference(spark, tmp_path):
    """encode via distinct-word replay + join == per-doc pure-Python
    replay; merge artifact save/load round-trips identically."""
    merges = B.bpe_learn(spark, _df(spark), 5)
    path = str(tmp_path / "merges")
    B.save_merges(spark, merges, path)
    assert B.load_merges(spark, path) == merges

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_tokens, r.tokens) for r in
           B.encode_documents(docs, B.load_merges(spark, path)).collect()}

    _, ref_syms = _ref_bpe(TEXTS, 5)
    for i, t in enumerate(TEXTS):
        words = t.split()
        toks = [ref_syms[w] for w in words]
        want = (len(words), sum(len(s) for s in toks),
                " ".join("+".join(s) for s in toks))
        assert got[i] == want, i


def test_encode_documents_empty_merge_table_is_chars(spark):
    docs = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    r = B.encode_documents(docs, []).collect()[0]
    assert (r.n_words, r.n_tokens) == (2, 5)  # a,b,</w> + c,</w>
    assert r.tokens == f"a+b+{B.EOW} c+{B.EOW}"
