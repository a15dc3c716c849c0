"""Unit tests for the round-6 final-batch families (X164-X165)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_field_survivorship_later_null_never_wins(spark):
    """Per column independently: the latest NON-NULL wins; a later
    version that is null for a column must not erase the earlier
    value."""
    rows = [
        (1, 0, "t0", "en", "s0"),
        (1, 1, None, "de", None),     # updates lang only
        (1, 2, "t2", None, None),     # updates text only
        (2, 0, "x", None, None),      # lang never set
    ]
    v = spark.createDataFrame(
        rows, "k long, ver int, text string, lang string, src string")

    def latest(col):
        return F.max(F.when(F.col(col).isNotNull(),
                            F.struct(F.col("ver"),
                                     F.col(col).alias("val"))))["val"]

    out = {r.k: r for r in
           v.groupBy("k").agg(latest("text").alias("text"),
                              latest("lang").alias("lang"),
                              latest("src").alias("src")).collect()}
    assert (out[1].text, out[1].lang, out[1].src) == ("t2", "de", "s0")
    assert out[2].lang is None and out[2].text == "x"


def test_corpus_datacard_dup_rate(spark, sf_dir):
    """The registered datacard's dup counting: n_exact_dups =
    rows − distinct texts; rates live in [0, 1]."""
    from sync_cosmos_db_spark.queries_r6 import corpus_datacard_documents
    from sync_cosmos_db_spark.session import load_table

    card = corpus_datacard_documents(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    nd = docs.select("text").distinct().count()
    assert card.n_docs == n
    assert card.n_exact_dups == n - nd
    assert 0.0 <= card.dup_rate <= 1.0
    assert 0.0 <= card.frac_en <= 1.0
    assert card.n_tokens > card.n_docs
