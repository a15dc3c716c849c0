"""JSONL source/sink (sources/jsonl.py): corrupt-line quarantine,
explicit-schema read, bounded inference, partitioned write layout."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from sync_cosmos_db_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "t": "ok"}\n'
                 'THIS IS NOT JSON\n'
                 '{"id": 2, "t": "also ok"}\n')
    df = read_jsonl(spark, str(p), schema="id bigint, t string")
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "THIS IS NOT JSON"
    assert bad[0].id is None
    good = sorted(r.id for r in rows if r[CORRUPT_COL] is None)
    assert good == [1, 2]


def test_inference_is_bounded_sample(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    # row 2000 has an extra column — a bounded 1000-row sample must NOT
    # see it (proving inference doesn't scan the whole file)
    lines = ['{"id": %d}' % i for i in range(1999)]
    lines.append('{"id": 1999, "surprise": true}')
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl(spark, str(p), keep_corrupt=False)
    assert "surprise" not in df.columns
    assert df.count() == 2000


def test_partitioned_gzip_write_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "en", "hello"), (2, "de", "hallo"), (3, "en", "hi")],
        "id long, lang string, text string")
    out = str(tmp_path / "out")
    write_jsonl(src, out, partition_by=["lang"])
    # hive layout with gzip part files
    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) \
        == ["lang=de", "lang=en"]
    en_dir = os.path.join(out, "lang=en")
    gz = [f for f in os.listdir(en_dir) if f.endswith(".gz")]
    assert gz, "expected gzip part files"
    with gzip.open(os.path.join(en_dir, gz[0]), "rt") as fh:
        assert fh.readline().startswith("{")
    back = read_jsonl(spark, out, schema="id bigint, text string, "
                      "lang string", keep_corrupt=False)
    assert sorted(map(tuple, back.select("id", "lang", "text").collect())) \
        == [(1, "en", "hello"), (2, "de", "hallo"), (3, "en", "hi")]


def test_partition_pruning_on_jsonl(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"t{i}") for i in range(20)],
        "id long, lang string, text string")
    out = str(tmp_path / "out")
    write_jsonl(src, out, partition_by=["lang"])
    back = read_jsonl(spark, out, schema="id bigint, text string, "
                      "lang string", keep_corrupt=False)
    plan = back.filter(F.col("lang") == "en")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan
