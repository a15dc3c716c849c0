"""Entity resolution (operators/linkage.py): blocking recall, hot-key
gate, determinism, semi-join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators.linkage import (blocked_fuzzy_join,
                                                    blocking_keys)


def _clean(spark, n=60):
    return spark.createDataFrame(
        [(i, f"Customer#{i:09d}") for i in range(n)],
        "r_id long, r_name string")


def _dirty(spark, n=60):
    rows = []
    for i in range(0, n, 3):       # interior substitution at char 10
        nm = f"Customer#{i:09d}"
        rows.append((1000 + i, nm[:9] + "X" + nm[10:]))
    for i in range(1, n, 3):       # interior deletion of char 10
        nm = f"Customer#{i:09d}"
        rows.append((1000 + i, nm[:9] + nm[10:]))
    rows.append((9999, "Zebra#999"))   # no match within distance 1
    return spark.createDataFrame(rows, "l_id long, l_name string")


def test_blocking_keys_survive_interior_edit(spark):
    df = spark.createDataFrame([("abcdefghij",), ("abcdeXghij",)],
                               "s string")
    keys = [sorted(r[0]) for r in
            df.select(blocking_keys("s", 5).alias("k")).collect()]
    # substitution at char 6 breaks neither the 5-prefix nor 5-suffix
    assert set(keys[0]) & set(keys[1])


def test_recall_matches_unblocked_exact(spark):
    clean, dirty = _clean(spark), _dirty(spark)
    blocked = blocked_fuzzy_join(dirty, clean, max_dist=1)
    # unblocked exact NN (crossJoin allowed in test code only)
    exact = (dirty.crossJoin(clean)
             .withColumn("dist", F.levenshtein("l_name", "r_name")
                         .cast("long"))
             .filter(F.col("dist") <= 1)
             .groupBy("l_id")
             .agg(F.min(F.struct("dist", "r_id")).alias("m"))
             .select("l_id", F.col("m.r_id").alias("r_id"),
                     F.col("m.dist").alias("dist")))
    b = {(r.l_id, r.r_id, r.dist) for r in blocked.collect()}
    x = {(r.l_id, r.r_id, r.dist) for r in exact.collect()}
    assert b == x and len(b) > 0


def test_noise_rows_absent(spark):
    res = blocked_fuzzy_join(_dirty(spark), _clean(spark), max_dist=1)
    assert res.filter(F.col("l_id") == 9999).count() == 0


def test_hot_key_gate_bounds_candidates(spark):
    # 200 identical-prefix names: with max_df=10 the shared prefix key
    # is gated, so candidate pairs come only from suffix keys.
    clean = spark.createDataFrame(
        [(i, f"SamePrefix{i:06d}") for i in range(200)],
        "r_id long, r_name string")
    dirty = clean.selectExpr(
        "r_id + 1000 as l_id",
        # interior substitution at char 11 (inside the suffix-safe zone)
        "concat(substr(r_name, 1, 10), 'Z', substr(r_name, 12)) as l_name")
    res = blocked_fuzzy_join(dirty, clean, max_df=10, max_dist=1)
    got = {(r.l_id, r.r_id) for r in res.collect()}
    assert got == {(i + 1000, i) for i in range(200)}


def test_deterministic_tiebreak_min_rid(spark):
    clean = spark.createDataFrame(
        [(7, "aaaaabbbbbX"), (3, "aaaaabbbbbY")], "r_id long, r_name string")
    dirty = spark.createDataFrame(
        [(1, "aaaaabbbbbZ")], "l_id long, l_name string")
    res = blocked_fuzzy_join(dirty, clean, max_dist=1).collect()
    assert len(res) == 1 and res[0].r_id == 3
