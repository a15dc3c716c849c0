"""Unit tests for the round-3 scale-pattern operators: runtime-filter
pruning, gap-fill, TF-IDF related docs, mergeable aggregate states,
and centroid outliers."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators import aggstate as S
from sync_cosmos_db_spark.operators.profiling import centroid_outliers
from sync_cosmos_db_spark.operators.pruning import (
    apply_hash_filter, build_hash_filter, runtime_filter_semi_join)
from sync_cosmos_db_spark.operators.retrieval import tfidf_related
from sync_cosmos_db_spark.operators.temporal import gap_fill


# ---------------------------------------------------------------------------
# pruning
# ---------------------------------------------------------------------------

def test_runtime_filter_no_false_negatives_and_prunes(spark):
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    dim = spark.range(0, 1000, 100).select(F.col("id").alias("dk"))  # 10 keys

    got = runtime_filter_semi_join(fact, dim, "k", "dk", num_buckets=64)
    want = fact.join(dim.select(F.col("dk").alias("k")), "k", "left_semi")
    assert (sorted(r.k for r in got.collect())
            == sorted(r.k for r in want.collect()))

    # the hash filter really drops rows before the exact join: with 64
    # buckets and 10 keys, far fewer than 1000 fact rows survive.
    filt = build_hash_filter(dim, "dk", num_buckets=64)
    survivors = apply_hash_filter(fact, filt, "k", num_buckets=64).count()
    assert survivors < 1000
    # ...but never fewer than the true matches (no false negatives).
    assert survivors >= want.count()


def test_hash_filter_bounded_by_num_buckets(spark):
    dim = spark.range(0, 100_000).select(F.col("id").alias("k"))
    assert build_hash_filter(dim, "k", num_buckets=32).count() <= 32


def test_runtime_filter_broadcasts_the_filter(spark):
    fact = spark.range(0, 100).select(F.col("id").alias("k"))
    dim = spark.range(0, 10).select(F.col("id").alias("dk"))
    plan = runtime_filter_semi_join(
        fact, dim, "k", "dk")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# gap_fill
# ---------------------------------------------------------------------------

def test_gap_fill_fills_and_carries_forward(spark):
    d = datetime.date
    df = spark.createDataFrame(
        [("a", d(2024, 1, 1), 1.0),
         ("a", d(2024, 1, 4), 4.0),
         ("b", d(2024, 1, 2), 2.0)],
        "k string, d date, v double")
    out = {(r.k, r.d): (r.v, r.v_filled)
           for r in gap_fill(df, ["k"], "d", ["v"]).collect()}
    # dense spine per key, bounded by that key's own min/max
    assert set(out) == {("a", d(2024, 1, 1)), ("a", d(2024, 1, 2)),
                        ("a", d(2024, 1, 3)), ("a", d(2024, 1, 4)),
                        ("b", d(2024, 1, 2))}
    # observed rows keep their value; gap rows are NULL + carried forward
    assert out[("a", d(2024, 1, 2))] == (None, 1.0)
    assert out[("a", d(2024, 1, 3))] == (None, 1.0)
    assert out[("a", d(2024, 1, 4))] == (4.0, 4.0)
    assert out[("b", d(2024, 1, 2))] == (2.0, 2.0)


def test_gap_fill_no_leading_rows_before_first_observation(spark):
    d = datetime.date
    df = spark.createDataFrame([("a", d(2024, 1, 5), 1.0)],
                               "k string, d date, v double")
    rows = gap_fill(df, ["k"], "d", ["v"]).collect()
    assert len(rows) == 1 and rows[0].d == d(2024, 1, 5)


# ---------------------------------------------------------------------------
# tfidf_related
# ---------------------------------------------------------------------------

def test_tfidf_related_hand_computed(spark):
    # doc 1 and 2 share the rare term "x"; doc 3 shares nothing rare.
    df = spark.createDataFrame(
        [(1, "common x"), (2, "common x"), (3, "common y")],
        "doc_id long, text string")
    # max_df=2 prunes "common" (df=3); "x" (df=2) and "y" (df=1) survive.
    out = {r.doc_id: (r.related_id, r.cosine)
           for r in tfidf_related(df, max_df=2).collect()}
    # docs 1,2 each have a single surviving unit-weight term -> cos = 1
    assert out[1] == (2, 1.0) and out[2] == (1, 1.0)
    # doc 3's only surviving term is unshared -> no pair at all
    assert 3 not in out


def test_tfidf_df_cap_prunes_stopwords(spark):
    df = spark.createDataFrame(
        [(i, "stop every doc") for i in range(10)],
        "doc_id long, text string")
    # every term has df=10 > cap -> no surviving terms -> no pairs
    assert tfidf_related(df, max_df=5).count() == 0


# ---------------------------------------------------------------------------
# aggstate
# ---------------------------------------------------------------------------

def test_aggstate_merge_equals_full_recompute(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.5 - 100).alias("v"))
    full = S.agg_state(df, ["g"], "v")
    merged = S.merge_states(
        S.agg_state(df.where("id % 2 = 0"), ["g"], "v"),
        S.agg_state(df.where("id % 2 = 1"), ["g"], "v"), ["g"])
    f = {r.g: r for r in S.finalize(full, ["g"]).collect()}
    m = {r.g: r for r in S.finalize(merged, ["g"]).collect()}
    assert f.keys() == m.keys()
    for g in f:
        assert tuple(f[g]) == tuple(m[g])


def test_aggstate_merge_associative(spark):
    df = spark.range(0, 300).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("double").alias("v"))
    a = S.agg_state(df.where("id < 100"), ["g"], "v")
    b = S.agg_state(df.where("id >= 100 and id < 200"), ["g"], "v")
    c = S.agg_state(df.where("id >= 200"), ["g"], "v")
    left = S.merge_states(S.merge_states(a, b, ["g"]), c, ["g"])
    right = S.merge_states(a, S.merge_states(b, c, ["g"]), ["g"])
    lrows = sorted(tuple(r) for r in S.finalize(left, ["g"]).collect())
    rrows = sorted(tuple(r) for r in S.finalize(right, ["g"]).collect())
    assert lrows == rrows


def test_aggstate_merge_disjoint_group_appears_once(spark):
    base = S.agg_state(
        spark.createDataFrame([("a", 1.0)], "g string, v double"),
        ["g"], "v")
    delta = S.agg_state(
        spark.createDataFrame([("b", 2.0)], "g string, v double"),
        ["g"], "v")
    rows = {r.g: r for r in
            S.finalize(S.merge_states(base, delta, ["g"]), ["g"]).collect()}
    assert rows["a"].n == 1 and rows["b"].n == 1


# ---------------------------------------------------------------------------
# centroid_outliers
# ---------------------------------------------------------------------------

def test_centroid_outliers_planted_outlier_ranks_first(spark):
    rows = [(i, 0, [0.0, 0.0]) for i in range(10)]
    rows.append((99, 0, [100.0, 100.0]))  # far from the centroid
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    out = centroid_outliers(df, top_n=1).collect()
    assert len(out) == 1 and out[0].vec_id == 99 and out[0].rk == 1


def test_centroid_outliers_respects_labels(spark):
    rows = ([(i, 0, [0.0]) for i in range(5)]
            + [(100 + i, 1, [50.0]) for i in range(5)])
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    out = centroid_outliers(df, top_n=2)
    assert out.count() == 4  # 2 per label
    assert out.where("label = 0").count() == 2


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


# ---------------------------------------------------------------------------
# clean_text / canonicalize_url
# ---------------------------------------------------------------------------

def test_clean_text_behaviors(spark):
    from sync_cosmos_db_spark.operators.text import clean_text

    df = spark.createDataFrame(
        [("a\x01b!!!!! wow....   done\t\n ",)], "t string")
    out = df.select(clean_text("t").alias("c")).collect()[0].c
    assert out == "ab! wow. done"


def test_clean_text_preserves_short_punct_runs(spark):
    from sync_cosmos_db_spark.operators.text import clean_text

    df = spark.createDataFrame([("hi!! ok.. sure",)], "t string")
    assert (df.select(clean_text("t").alias("c")).collect()[0].c
            == "hi!! ok.. sure")


def test_canonicalize_url_variants_collapse(spark):
    from sync_cosmos_db_spark.operators.url import canonicalize_url

    variants = [
        ("https://www.ex.com/p?a=1&b=2",),
        ("HTTPS://WWW.EX.COM:443/p?b=2&a=1#f",),
        ("https://www.ex.com:443/p?a=1&b=2#x",),
    ]
    df = spark.createDataFrame(variants, "url string")
    got = {r.c for r in
           df.select(canonicalize_url("url").alias("c")).collect()}
    assert got == {"https://www.ex.com/p?a=1&b=2"}


def test_canonicalize_url_edge_cases(spark):
    from sync_cosmos_db_spark.operators.url import canonicalize_url

    df = spark.createDataFrame(
        [("http://h.io:8080",), ("not a url",), ("  http://a.b/x  ",)],
        "url string")
    got = [r.c for r in
           df.select(canonicalize_url("url").alias("c")).collect()]
    # non-default port kept, empty path becomes /, non-URL passes
    # through trimmed, surrounding whitespace stripped before parse
    assert got == ["http://h.io:8080/", "not a url", "http://a.b/x"]


def test_registrable_domain(spark):
    from sync_cosmos_db_spark.operators.url import registrable_domain

    df = spark.createDataFrame(
        [("https://news.site.com/x",), ("https://site.com/x",)],
        "url string")
    got = [r.d for r in
           df.select(registrable_domain("url").alias("d")).collect()]
    assert got == ["site.com", "site.com"]


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

def test_mg_summary_reference_guarantee():
    from sync_cosmos_db_spark.operators.sketches import _mg_summary

    # 60×"a", 25×"b", 15 singletons: n=100, k=3 -> bar n/(k+1)=25
    stream = ["a"] * 60 + ["b"] * 25 + [f"s{i}" for i in range(15)]
    counters = _mg_summary(stream, 3)
    assert "a" in counters          # 60 > 25: must survive
    assert len(counters) <= 3
    assert counters["a"] >= 60 - 100 // 4   # MG undercount bound


def test_heavy_hitters_exact_vs_groupby(spark):
    from sync_cosmos_db_spark.operators.sketches import heavy_hitters

    df = (spark.range(0, 2000)
          .select(F.when(F.col("id") % 3 == 0, "hot")
                  .when(F.col("id") % 3 == 1, "warm")
                  .otherwise(F.concat(F.lit("cold"), F.col("id")))
                  .alias("item"))
          .repartition(8))
    k = 10
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "item", k).collect()}
    want = {(r.item, r.cnt) for r in
            df.groupBy("item").agg(F.count("*").cast("long").alias("cnt"))
            .where(F.col("cnt") * (k + 1) > 2000).collect()}
    assert got == want and len(want) == 2


def test_mg_candidates_bounded_per_partition(spark):
    from sync_cosmos_db_spark.operators.sketches import mg_candidates

    df = (spark.range(0, 5000)
          .select(F.concat(F.lit("i"), (F.col("id") % 500)).alias("item"))
          .repartition(4))
    rows = mg_candidates(df, "item", 7).collect()
    # ≤ k candidates + 1 total row per partition
    assert len(rows) <= (7 + 1) * 4
    # the fused denominator reconstructs the exact input size
    assert sum(r.n_part for r in rows) == 5000
    assert all(r.n_part == 0 for r in rows if r.item is not None)


def test_heavy_hitters_no_separate_count_scan(spark, monkeypatch):
    """Round-3 verdict item 4: the denominator rides along with the
    sketch pass — no dedicated full-scan ``count()`` job remains."""
    from pyspark.sql import DataFrame as SparkDF

    from sync_cosmos_db_spark.operators.sketches import heavy_hitters

    df = (spark.range(0, 1000)
          .select(F.when(F.col("id") % 2 == 0, "hot")
                  .otherwise(F.concat(F.lit("c"), F.col("id")))
                  .alias("item"))
          .repartition(4))
    calls: list[int] = []
    orig = SparkDF.count
    monkeypatch.setattr(SparkDF, "count", lambda self: (calls.append(1),
                                                        orig(self))[1])
    out = heavy_hitters(df, "item", k=5)
    assert not calls, "heavy_hitters still runs a separate count() scan"
    k = 5
    want = {(r.item, r.cnt) for r in
            df.groupBy("item").agg(F.count("*").cast("long").alias("cnt"))
            .where(F.col("cnt") * (k + 1) > 1000).collect()}
    assert {(r.item, r.cnt) for r in out.collect()} == want == {("hot", 500)}


# ---------------------------------------------------------------------------
# expectations
# ---------------------------------------------------------------------------

def test_check_rules_counts_and_single_scan(spark):
    from sync_cosmos_db_spark.operators.expectations import check_rules

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, -1.0)],
        "k int, v double")
    out = {r.rule: r for r in check_rules(df, {
        "k_not_null": F.col("k").isNull(),
        "v_positive": F.col("v") <= 0,
    }).collect()}
    assert out["k_not_null"].n_violations == 1
    assert out["v_positive"].n_violations == 2
    assert out["v_positive"].n_rows == 4
    assert out["v_positive"].pass_rate == 0.5


def test_check_rules_one_aggregate_in_plan(spark):
    from sync_cosmos_db_spark.operators.expectations import check_rules

    df = spark.range(100).select(F.col("id").alias("k"))
    plan = check_rules(df, {
        "a": F.col("k") < 0, "b": F.col("k") > 1000,
    })._jdf.queryExecution().executedPlan().toString()
    # N rules compile into ONE aggregate pass, not N scans
    assert plan.count("Scan") <= 2  # initial + AQE re-listing at most


def test_referential_violations_finds_only_orphans(spark):
    from sync_cosmos_db_spark.operators.expectations import (
        referential_violations)

    fact = spark.createDataFrame([(1, 10), (2, 99), (3, None)],
                                 "id int, fk int")
    dim = spark.createDataFrame([(10,), (20,)], "k int")
    bad = sorted(r.id for r in
                 referential_violations(fact, "fk", dim, "k").collect())
    assert bad == [2, 3]  # missing key AND null key violate


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

def test_triangle_count_known_graphs(spark):
    from sync_cosmos_db_spark.operators.graph import triangle_count

    # K4 has 4 triangles; edges given in mixed orientation + a dup
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(k4, "src int, dst int")
    assert triangle_count(df).collect()[0].n_triangles == 4

    # a 4-cycle has none
    c4 = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0)],
                               "src int, dst int")
    assert triangle_count(c4).collect()[0].n_triangles == 0


def test_triangle_count_ignores_self_loops(spark):
    from sync_cosmos_db_spark.operators.graph import triangle_count

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (1, 1)], "src int, dst int")
    assert triangle_count(df).collect()[0].n_triangles == 1


# ---------------------------------------------------------------------------
# spatial radius join
# ---------------------------------------------------------------------------

def test_radius_join_matches_bruteforce(spark):
    from sync_cosmos_db_spark.operators.spatial import radius_join

    pts = spark.range(0, 200).select(
        F.col("id").alias("pid"),
        ((F.col("id") % 17) + (F.col("id") % 5) / 10.0).alias("x"),
        ((F.col("id") % 13) + (F.col("id") % 3) / 10.0).alias("y"))
    a = pts.select(F.col("pid").alias("a_id"), F.col("x").alias("ax"),
                   F.col("y").alias("ay"))
    b = pts.select(F.col("pid").alias("b_id"), F.col("x").alias("bx"),
                   F.col("y").alias("by"))
    got = {(r.a_id, r.b_id) for r in
           radius_join(a, b, 0.75, "ax", "ay", "bx", "by")
           .where(F.col("a_id") < F.col("b_id")).collect()}
    import itertools
    rows = pts.collect()
    want = {(p.pid, q.pid) for p, q in itertools.combinations(rows, 2)
            if ((p.x - q.x) ** 2 + (p.y - q.y) ** 2) ** 0.5 <= 0.75}
    assert got == want and want  # non-trivial and exact


def test_radius_join_finds_cross_cell_neighbors(spark):
    from sync_cosmos_db_spark.operators.spatial import radius_join

    # two points straddling a cell boundary at distance 0.2 < r=1
    a = spark.createDataFrame([(1, 0.95, 0.95)], "a_id int, ax double, ay double")
    b = spark.createDataFrame([(2, 1.05, 1.05)], "b_id int, bx double, by double")
    out = radius_join(a, b, 1.0, "ax", "ay", "bx", "by").collect()
    assert len(out) == 1 and out[0].a_id == 1 and out[0].b_id == 2


def test_radius_join_no_duplicate_pairs(spark):
    from sync_cosmos_db_spark.operators.spatial import radius_join

    # identical coordinates (same cell) must produce each pair once
    a = spark.createDataFrame([(1, 0.5, 0.5)], "a_id int, ax double, ay double")
    b = spark.createDataFrame([(2, 0.5, 0.5)], "b_id int, bx double, by double")
    assert radius_join(a, b, 1.0, "ax", "ay", "bx", "by").count() == 1


# ---------------------------------------------------------------------------
# query CLI
# ---------------------------------------------------------------------------

def test_query_cli_list_and_run(spark, sf_dir, capsys):
    from sync_cosmos_db_spark import query_cli

    assert query_cli.main(["--list"]) == 0
    names = capsys.readouterr().out.splitlines()
    assert "count_lineitem" in names and len(names) > 100

    rc = query_cli.main(["count_lineitem", "--sf-dir", sf_dir,
                         "--format", "json"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    import json as _json
    assert "n_lineitem" in _json.loads(out[0]) or _json.loads(out[0])


def test_query_cli_unknown_name(capsys):
    from sync_cosmos_db_spark import query_cli

    assert query_cli.main(["no_such_query"]) == 2

def test_check_rules_arbitrary_rule_names(spark):
    """Round-3 ADVICE: rule names with quotes/spaces/unicode must not
    break (or inject into) the long-form projection."""
    from sync_cosmos_db_spark.operators.expectations import check_rules

    df = spark.range(0, 10).select(F.col("id").alias("v"))
    names = ["has space", "quo'te", 'dou"ble', "semi;colon",
             "paren)s", "ünïcode", "back`tick"]
    rules = {n: F.col("v") >= 5 for n in names}
    out = {r.rule: r.n_violations for r in check_rules(df, rules).collect()}
    assert set(out) == set(names)
    assert all(v == 5 for v in out.values())


def test_heavy_hitters_by_group_exact_vs_groupby(spark):
    from sync_cosmos_db_spark.operators.sketches import (
        heavy_hitters_by_group,
    )

    df = (spark.range(0, 3000)
          .select((F.col("id") % 3).cast("string").alias("lang"),
                  F.when(F.col("id") % 3 == 0, "hot0")
                  .when((F.col("id") % 3 == 1) & (F.col("id") % 2 == 0),
                        "hot1")
                  .otherwise(F.concat(F.lit("c"), F.col("id")))
                  .alias("item"))
          .repartition(8))
    k = 5
    got = {(r.lang, r.item, r.cnt) for r in
           heavy_hitters_by_group(df, "lang", "item", k).collect()}
    counts = df.groupBy("lang", "item").agg(
        F.count("*").cast("long").alias("cnt"))
    tot = df.groupBy("lang").agg(F.count("*").alias("n"))
    want = {(r.lang, r.item, r.cnt) for r in
            counts.join(tot, "lang")
            .where(F.col("cnt") * (k + 1) > F.col("n")).collect()}
    assert got == want and len(want) >= 2


def test_heavy_hitters_by_group_null_group(spark):
    """A NULL group key is a real group (SQL GROUP BY semantics): its
    heavy hitters must surface exactly like any other group's
    (round-4 ADVICE: pandas groupby drops NaN keys by default)."""
    from sync_cosmos_db_spark.operators.sketches import (
        heavy_hitters_by_group,
    )

    df = (spark.range(0, 2000)
          .select(F.when(F.col("id") % 4 == 0, None)
                  .otherwise((F.col("id") % 2).cast("string"))
                  .alias("lang"),
                  F.when(F.col("id") % 5 <= 2, "hot")
                  .otherwise(F.concat(F.lit("c"), F.col("id")))
                  .alias("item"))
          .repartition(8))
    k = 5
    got = {(r.lang, r.item, r.cnt) for r in
           heavy_hitters_by_group(df, "lang", "item", k).collect()}
    counts = df.groupBy("lang", "item").agg(
        F.count("*").cast("long").alias("cnt"))
    tot = df.groupBy("lang").agg(F.count("*").alias("n"))
    want = {(r.lang, r.item, r.cnt) for r in
            counts.join(tot, counts["lang"].eqNullSafe(tot["lang"]))
            .where(F.col("cnt") * (k + 1) > F.col("n"))
            .select(counts["lang"], "item", "cnt").collect()}
    assert got == want
    assert any(g is None for g, _, _ in got), "NULL group missing"
