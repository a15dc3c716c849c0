"""Property-based invariants (SURVEY.md §5.4) over random documents.

Each property generates a BATCH of random rows and runs ONE Spark job —
hypothesis drives the data, not the job count, so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sync_cosmos_db_spark.document_model import (
    content_hash,
    strip_system_fields,
)
from sync_cosmos_db_spark.migration import classify_actions
from sync_cosmos_db_spark.sanitizer import sanitize_dataframe

_SETTINGS = settings(max_examples=5, deadline=None,
                     suppress_health_check=[HealthCheck.function_scoped_fixture])

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40)
_doc = st.fixed_dictionaries({
    "id": st.integers(0, 10_000),
    "email": st.one_of(st.none(), _text),
    "payload": _text,
    "_etag": _text,
    "nested": st.fixed_dictionaries({"ssn": st.one_of(st.none(), _text),
                                     "note": _text}),
})


def _df(spark, docs):
    schema = ("id long, email string, payload string, _etag string, "
              "nested struct<ssn: string, note: string>")
    rows = [(d["id"], d["email"], d["payload"], d["_etag"],
             (d["nested"]["ssn"], d["nested"]["note"])) for d in docs]
    return spark.createDataFrame(rows, schema)


@_SETTINGS
@given(st.lists(_doc, min_size=1, max_size=30))
def test_strip_is_idempotent(spark, docs):
    df = _df(spark, docs)
    once = strip_system_fields(df)
    twice = strip_system_fields(once)
    assert once.schema == twice.schema
    assert once.exceptAll(twice).isEmpty()


@_SETTINGS
# unique ids: the NULL-preservation check joins orig↔sanitized on id,
# and a duplicate id would cross-pair two different documents' rows
# (hypothesis found exactly that) — the sanitizer itself is row-wise
# and id-agnostic, so uniqueness costs the property nothing.
@given(st.lists(_doc, min_size=1, max_size=30, unique_by=lambda d: d["id"]))
def test_sanitize_deterministic_and_schema_stable(spark, docs):
    df = _df(spark, docs)
    s1, s2 = sanitize_dataframe(df), sanitize_dataframe(df)
    assert s1.schema == df.schema  # type/shape preserved
    assert s1.exceptAll(s2).isEmpty()  # same input -> same output
    # NULL PII stays NULL; non-null PII changes (email values are hex-
    # prefixed fakes, never equal to a random short original by format)
    joined = df.select("id", "email").withColumnRenamed("email", "orig") \
        .join(s1.select("id", "email"), "id")
    for r in joined.collect():
        assert (r.email is None) == (r.orig is None)


@_SETTINGS
@given(st.lists(_doc, min_size=1, max_size=30, unique_by=lambda d: d["id"]))
def test_second_migration_is_all_skip(spark, docs):
    src = _df(spark, docs)
    # migrate onto itself: every row must classify as skip (the
    # reference's dedup short-circuit, src/migration.py:129-130)
    tagged = classify_actions(strip_system_fields(src),
                              strip_system_fields(src), keys=["id"])
    actions = {r.action for r in tagged.select("action").distinct().collect()}
    assert actions == {"skip"}


@_SETTINGS
@given(st.lists(_doc, min_size=1, max_size=30))
def test_content_hash_ignores_column_order(spark, docs):
    df = _df(spark, docs)
    h1 = df.select(content_hash(["payload", "email"]).alias("h"))
    h2 = df.select(content_hash(["email", "payload"]).alias("h"))
    assert [r.h for r in h1.collect()] == [r.h for r in h2.collect()]


def test_gopher_rules_individual_failures(spark):
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.operators import text as X

    good = "the quick brown fox likes to run and jump over it " * 10
    docs = spark.createDataFrame(
        [(1, good.strip()),                           # passes all
         (2, "the of and to in"),                     # too short
         (3, ("the " + "# " * 60 + "of and is it " * 20).strip()),  # symbols
         (4, ("the of " + "99 00 11 " * 40).strip()),  # non-alpha words
         (5, ("zz yy xx ww vv uu tt ss " * 15).strip())],  # no stopwords
        "doc_id long, text string")
    rules = X.gopher_rules("text")
    rows = {r.doc_id: r for r in docs.select(
        "doc_id", *[c.alias(n) for n, c in rules.items()],
        X.gopher_filter("text").alias("keep")).collect()}
    assert rows[1].keep
    assert not rows[2].ok_word_count and not rows[2].keep
    assert not rows[3].ok_symbol_ratio and not rows[3].keep
    assert not rows[4].ok_word_alpha and not rows[4].keep
    assert not rows[5].ok_stopwords and not rows[5].keep
