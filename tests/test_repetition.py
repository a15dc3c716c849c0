"""Gopher repetition rules (operators/text.py repetition_profile).

The oracle query gopher_repetition_flags hash-checks every marginal
against DuckDB at sf0.01; these tests pin the semantics on hand-built
documents where every fraction is computable by eye.
"""

from sync_cosmos_db_spark.operators.text import (
    REPETITION_BOUNDS,
    repetition_profile,
)


def _profile(spark, text, doc_id=1):
    df = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    [row] = repetition_profile(df).collect()
    return row.asDict()


def test_duplicate_line_and_top_gram_fractions(spark):
    # lines: "a b", "a b", "c d" -> 1 dup occurrence of 3 lines;
    # paragraphs: "a b\na b", "c d" -> no dup;
    # tokens: a b a b c d -> top 2-gram "a b" x2, len 3; text len 12.
    r = _profile(spark, "a b\na b\n\nc d")
    assert round(r["dup_line_frac"], 6) == round(1 / 3, 6)
    assert round(r["dup_line_char_frac"], 6) == round(3 / 9, 6)
    assert r["dup_para_frac"] == 0.0
    assert r["top2_char_frac"] == 0.5  # 2 occurrences * 3 chars / 12
    assert r["dup5_char_frac"] == 0.0  # both 5-grams unique
    assert r["keep"] is False  # top2 0.5 > 0.20 bound


def test_unstructured_doc_dup_fractions_zero(spark):
    # no newlines, all tokens distinct -> every DUP fraction is 0; the
    # top-gram fractions are nonzero by definition (the most frequent
    # gram covers chars even at count 1 — on a 5-token doc that coverage
    # alone breaches the bound, which is why Gopher pairs these rules
    # with a min-word-count rule)
    r = _profile(spark, "one two three four five")
    for name in REPETITION_BOUNDS:
        if name.startswith("dup"):
            assert r[name] == 0.0, name
    # argmax tie-break on (count, len, gram): all 2-grams occur once,
    # longest is "three four" (10 chars) over 23 chars of text
    assert abs(r["top2_char_frac"] - 10 / 23) < 1e-5


def test_heavy_ngram_repetition_flagged(spark):
    # "x y " * 30: dup 5-gram coverage saturates -> keep=False even
    # though there is no line structure at all
    r = _profile(spark, " ".join(["x y"] * 30))
    assert r["dup5_char_frac"] > 0.15
    assert r["dup10_char_frac"] > 0.10
    assert r["keep"] is False


def test_short_doc_has_no_grams(spark):
    # 3 tokens: no 5-grams or 10-grams exist; fractions coalesce to 0
    r = _profile(spark, "p q r")
    assert r["dup5_char_frac"] == 0.0
    assert r["dup10_char_frac"] == 0.0


# ---------------------------------------------------------------------------
# Unigram LM scoring (operators/text.py unigram_logprob_profile)
# ---------------------------------------------------------------------------

def test_unigram_logprob_hand_computed(spark):
    import math
    from sync_cosmos_db_spark.operators.text import unigram_logprob_profile
    df = spark.createDataFrame([(1, "a a b"), (2, "a b")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_logprob_profile(df).collect()}
    # corpus: a x3, b x2, T=5
    exp1 = math.log(5) - (2 * math.log(3) + math.log(2)) / 3
    exp2 = math.log(5) - (math.log(3) + math.log(2)) / 2
    assert abs(rows[1]["avg_neg_logprob"] - exp1) < 1e-5
    assert abs(rows[2]["avg_neg_logprob"] - exp2) < 1e-5
    # the doc weighted toward the rarer token scores as MORE atypical
    assert rows[2]["avg_neg_logprob"] > rows[1]["avg_neg_logprob"]


def test_unigram_logprob_uniform_corpus_constant(spark):
    import math
    from sync_cosmos_db_spark.operators.text import unigram_logprob_profile
    # every token unique -> every doc scores exactly ln(T)
    df = spark.createDataFrame([(1, "p q"), (2, "r s t")],
                               "doc_id long, text string")
    rows = unigram_logprob_profile(df).collect()
    for r in rows:
        assert abs(r["avg_neg_logprob"] - math.log(5)) < 1e-5
