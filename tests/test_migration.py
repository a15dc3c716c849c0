"""Migration kernel tests (O6/O12/O18/O21/O22): the golden scenario from
SURVEY.md §5.2 — known insert/update/skip/error composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync_cosmos_db_spark.migration import (
    check_pk_alignment,
    classify_actions,
    migrate_container,
    verify_migration,
)

SRC = [
    ("s1", "t1", "same content", "E-src", 1),
    ("s2", "t1", "changed in source", "E-src", 2),
    ("s3", "t2", "new in source", "E-src", 3),
    (None, "t2", "invalid: no id", "E-src", 4),
    ("s5", "", "invalid: empty pk", "E-src", 5),
]
TGT = [
    ("s1", "t1", "same content", "E-tgt-different", 99),   # → skip (strip is load-bearing)
    ("s2", "t1", "original content", "E-tgt", 98),         # → update
    ("t9", "t3", "target-only", "E-tgt", 97),              # untouched
]
SCHEMA = "id string, tenantId string, body string, _etag string, _ts long"


def test_golden_counter_quadruple(spark):
    src = spark.createDataFrame(SRC, SCHEMA)
    tgt = spark.createDataFrame(TGT, SCHEMA)
    tagged, result = migrate_container(
        src, tgt, keys=["id", "tenantId"], container="golden")
    assert (result.inserted, result.updated, result.skipped, result.errors) \
        == (1, 1, 1, 2)
    actions = {r.id: r.action for r in tagged.collect()}
    assert actions == {"s1": "skip", "s2": "update", "s3": "insert"}


def test_idempotent_second_migration_all_skip(spark):
    # property from the reference's dedup short-circuit (migration.py:129-130)
    src = spark.createDataFrame([r for r in SRC if r[0] and r[1]], SCHEMA)
    tagged = classify_actions(src, src, keys=["id", "tenantId"])
    assert {r.action for r in tagged.collect()} == {"skip"}


def test_pk_alignment_abort():
    check_pk_alignment(["/tenantId"], ["/tenantId"])  # no raise
    with pytest.raises(ValueError, match="do not match"):
        check_pk_alignment(["/tenantId"], ["/id"])
    with pytest.raises(ValueError):
        # hierarchical list compared in full, not truncated (SURVEY §1.4)
        check_pk_alignment(["/a", "/b"], ["/a"])


def test_verify_migration_strong(spark):
    a = spark.createDataFrame(TGT, SCHEMA)
    b = spark.createDataFrame(TGT, SCHEMA).withColumn("_etag", F.lit("X"))
    ok, n_src, n_tgt = verify_migration(a, b, strong=True)
    assert ok and n_src == n_tgt == 3
    c = spark.createDataFrame(TGT[:2], SCHEMA)
    ok2, *_ = verify_migration(a, c)
    assert not ok2
