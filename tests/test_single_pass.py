"""Round-16 single-pass discipline (r15 verdict item 3): the
multi-consumer compositions — curation/web pipelines, the
decontamination gram join, the foreachBatch batch-merge loops — must
consume their expensive upstream exactly ONCE.  Mechanism-asserting
accumulator tests (the tests/test_graph.py pattern): a mapInPandas tag
counts how many times each source row is actually computed —
deterministic in local mode (tiny data, no task retries)."""

from __future__ import annotations


def _tagged(spark, rows, schema):
    counter = spark.sparkContext.accumulator(0)
    base = spark.createDataFrame(rows, schema)

    def tag(batches):
        for pdf in batches:
            counter.add(len(pdf))
            yield pdf

    return base.repartition(2).mapInPandas(tag, base.schema), counter


_DOCS = [(1, "aa bb cc dd"), (7, "ee ff gg hh"), (10, "aa bb cc dd"),
         (14, "ii jj kk ll"), (20, "mm nn oo pp"), (21, "qq rr ss tt")]


def test_curation_pipeline_single_pass_over_docs(spark):
    # pre-fix: raw count + exact dedup + survivor semi-join each
    # consumed the corpus plan afresh, and the 3-branch union executed
    # the documents source once per branch = 9 source passes.
    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.queries_scale import (
        _curation_pipeline_agg, _planted_dup_corpus)

    docs, c = _tagged(spark, _DOCS, "doc_id long, text string")
    row = _curation_pipeline_agg(_planted_dup_corpus(docs)).collect()[0]
    release_persisted()
    # 6 docs + 2 exact plants (10, 20) + 2 near plants (7, 14, 21 → 3)
    assert row.n_raw == 6 + 2 + 3
    assert c.value == 6, (
        f"documents source computed {c.value} rows for 6 input docs — "
        "the curation pipeline must build the corpus in one explode "
        "pass and cache it across the stage-1 consumers")


def test_web_pipeline_single_pass_over_corpus(spark):
    # pre-fix: n_input, n_quality and the dedup aggregate each
    # re-executed the full strip_html + quality chain = 3 corpus passes.
    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.queries_r4 import _web_pipeline_agg

    rows = [(i, f"<html><body><p>{'tok ' * 40}doc {i}</p>"
                "<script>x</script></body></html>") for i in range(8)]
    corpus, c = _tagged(spark, rows, "doc_id long, html string")
    row = _web_pipeline_agg(corpus).collect()[0]
    release_persisted()
    assert row.n_input == 8
    assert c.value == 8, (
        f"corpus source computed {c.value} rows for 8 input docs — "
        "the scored frame must be checkpointed once and feed both "
        "aggregates")


def test_decontam_gram_join_single_pass_per_side(spark):
    # the gram build (token split + n-gram explode) is the expensive
    # upstream; the df-gate window must reuse the gram exchange, not
    # re-execute the build.
    from sync_cosmos_db_spark.operators.curation import ngram_contamination

    text = "a b c d e f g h i j"
    train, ct = _tagged(spark, [(1, text), (2, text)],
                        "doc_id long, text string")
    ev, ce = _tagged(spark, [(100, text)], "doc_id long, text string")
    out = ngram_contamination(train, ev, "doc_id", "text",
                              n=8, max_train_df=50).collect()
    assert len(out) == 2  # eval shares grams with both train docs
    assert ct.value == 2, (
        f"train source computed {ct.value} rows for 2 input docs")
    assert ce.value == 1, (
        f"eval source computed {ce.value} rows for 1 input doc")


def test_rate_limit_merge_batch_single_pass(spark, tmp_path):
    from datetime import datetime

    from sync_cosmos_db_spark.streaming.stateful import (
        make_rate_limit_merge_batch)

    versions: dict[int, str] = {}
    merge = make_rate_limit_merge_batch(str(tmp_path), 5, versions)
    rows = [(1, datetime(2024, 1, 1, 10, m)) for m in range(6)]
    b0, c0 = _tagged(spark, rows, "user_id long, ts timestamp")
    merge(b0, 0)
    assert c0.value == 6, (
        f"batch 0 source computed {c0.value} rows for 6 input events")
    b1, c1 = _tagged(spark, rows, "user_id long, ts timestamp")
    merge(b1, 1)
    assert c1.value == 6, (
        f"batch 1 source computed {c1.value} rows for 6 input events "
        "(the prev-version merge must read parquet, not the batch)")


def test_compaction_merge_batch_single_pass(spark, tmp_path):
    from sync_cosmos_db_spark.streaming.stateful import (
        make_compaction_merge_batch)

    versions: dict[int, str] = {}
    merge = make_compaction_merge_batch(str(tmp_path), ["k"], "seq",
                                        "op", versions)
    rows = [(1, 1, "U", "a"), (1, 2, "U", "b"), (2, 1, "U", "c")]
    schema = "k long, seq long, op string, v string"
    b0, c0 = _tagged(spark, rows, schema)
    merge(b0, 0)
    assert c0.value == 3, (
        f"batch 0 source computed {c0.value} rows for 3 input changes")
    b1, c1 = _tagged(spark, [(1, 3, "D", "x"), (3, 1, "U", "d")], schema)
    merge(b1, 1)
    assert c1.value == 2, (
        f"batch 1 source computed {c1.value} rows for 2 input changes")


def test_apply_batch_merge_single_pass_over_batch(spark, tmp_path):
    # pre-fix: the touched-bucket collect, the classify join and the
    # untouched anti-join each consumed the batch plan afresh = 3
    # passes per micro-batch over what is a fresh file scan in a real
    # change feed.
    from sync_cosmos_db_spark.streaming.incremental import apply_batch_merge

    target = str(tmp_path / "target")
    schema = "id long, val string"
    b0, c0 = _tagged(spark, [(1, "a"), (2, "b"), (3, "c")], schema)
    apply_batch_merge(spark, b0, target, ["id"])
    assert c0.value == 3, (
        f"bootstrap batch computed {c0.value} rows for 3 input rows")
    b1, c1 = _tagged(spark, [(2, "B"), (4, "d")], schema)
    apply_batch_merge(spark, b1, target, ["id"])
    assert c1.value == 2, (
        f"merge batch computed {c1.value} rows for 2 input rows — "
        "apply_batch_merge must cache the micro-batch across the "
        "touched-bucket collect, classify join and untouched anti-join")
    out = {r.id: r.val for r in
           spark.read.parquet(target).select("id", "val").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_fold_temporal_audit_single_pass_over_orders(spark):
    # pre-fix: the folds×months cells frame fed four consumers (row
    # totals, column totals, grand total, chi² join) and each
    # consumption re-executed the orders scan+aggregate = 4 passes.
    from datetime import date

    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.queries_r7 import _fold_temporal_audit

    rows = [(i, date(2024, 1 + i % 3, 1)) for i in range(12)]
    orders, c = _tagged(spark, rows, "o_orderkey long, o_orderdate date")
    out = _fold_temporal_audit(orders).collect()
    release_persisted()
    assert len(out) == 1 and out[0].n_months == 3
    assert c.value == 12, (
        f"orders source computed {c.value} rows for 12 input rows — "
        "the contingency cells must be checkpointed once")
