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


_vals = st.lists(st.floats(min_value=-1000, max_value=1000,
                           allow_nan=False, allow_infinity=False,
                           width=32),
                 min_size=5, max_size=60)


@_SETTINGS
@given(_vals)
def test_psi_ks_self_drift_is_zero(spark, vals):
    """PSI and binned KS of a sample against ITSELF are exactly 0
    for any input — the calibration invariant a drift monitor must
    satisfy before its alerts mean anything."""
    from sync_cosmos_db_spark.operators.profiling import psi_ks_drift

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    row = psi_ks_drift(df, df, "x", lo=-1000.0, hi=1000.0,
                       n_buckets=10).collect()[0]
    assert row.psi == 0.0 and row.ks == 0.0
    assert row.n_a == len(vals) == row.n_b


@_SETTINGS
@given(_vals, st.floats(min_value=-50, max_value=50, allow_nan=False))
def test_theil_sen_shift_invariance(spark, vals, shift):
    """Adding a constant to every y leaves the Theil–Sen slope
    unchanged (slopes are differences); x is the index so pairs
    always have distinct x."""
    from sync_cosmos_db_spark.operators.profiling import theil_sen_slope

    rows = [("g", float(i), float(v)) for i, v in enumerate(vals)]
    shifted = [("g", x, y + shift) for _, x, y in rows]
    df1 = spark.createDataFrame(rows, "g string, x double, y double")
    df2 = spark.createDataFrame(shifted, "g string, x double, y double")
    s1 = theil_sen_slope(df1, "g", "x", "y").collect()[0].slope
    s2 = theil_sen_slope(df2, "g", "x", "y").collect()[0].slope
    assert abs(s1 - s2) <= 2e-4  # one rounding ulp at 4 digits


@_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 9)),
                min_size=1, max_size=60))
def test_rolling_actives_bounds(spark, pairs):
    """For every day: actives ≥ that day's own distinct users and
    ≤ total distinct users; and day-1 actives equal day-1's own
    distinct users when no earlier day exists."""
    from sync_cosmos_db_spark.operators.behavioral import (
        rolling_active_users,
    )

    rows = [(i, f"2024-01-{1 + d:02d} 00:00:00", u)
            for i, (d, u) in enumerate(pairs)]
    df = (spark.createDataFrame(rows,
                                "event_id long, ts string, user_id long")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    out = {str(r.day): r.active_users for r in
           rolling_active_users(df, 7).collect()}
    per_day = {}
    for d, u in pairs:
        per_day.setdefault(d, set()).add(u)
    total = len({u for _, u in pairs})
    for d, users in per_day.items():
        day = f"2024-01-{1 + d:02d}"
        assert len(users) <= out[day] <= total
    first = min(per_day)
    assert out[f"2024-01-{1 + first:02d}"] == len(per_day[first])


@_SETTINGS
@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=30),
                min_size=1, max_size=25))
def test_hashed_features_preserves_token_mass(spark, texts):
    """Total feature mass equals total (non-empty) token count — the
    hashing trick may collide buckets but never loses or invents
    tokens."""
    from sync_cosmos_db_spark.operators.curation import hashed_features

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = hashed_features(df, "doc_id", "text", dim=8)
    got = out.agg(F.sum("n")).collect()[0][0] or 0
    want = sum(len([t for t in tx.split() if t]) for tx in texts)
    assert got == want


@_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 99), st.integers(0, 999)),
                min_size=2, max_size=80))
def test_bfs_hops_triangle_inequality(spark, edge_pairs):
    """On any random graph: hop counts from a seed are ≥ 0, ≤ max_hops,
    0 exactly for the seed, and every reached node at hop h>0 has a
    neighbor at hop h-1 (BFS level consistency)."""
    from sync_cosmos_db_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(edge_pairs, "a long, b long")
    edges = (e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(e.select(F.col("b").alias("src"),
                                   F.col("a").alias("dst")))).persist()
    try:
        seed_node = edge_pairs[0][0]
        seeds = spark.createDataFrame([(seed_node,)], "node long")
        out = {r.node: r.hops
               for r in bfs_hops(edges, seeds, 3).collect()}
    finally:
        edges.unpersist()
    adj = {}
    for a, b in edge_pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert out[seed_node] == 0
    for node, h in out.items():
        assert 0 <= h <= 3
        if h > 0:
            assert any(out.get(nb) == h - 1 for nb in adj.get(node, ()))


# --- round-6 operator properties ------------------------------------------

_word = st.text(alphabet="ab01", min_size=0, max_size=8)


@_SETTINGS
@given(st.lists(_word, min_size=2, max_size=25))
def test_fastss_editdist_matches_bruteforce(spark, words):
    """X119 d=1 completeness: the FastSS deletion-neighborhood join
    must return EXACTLY the pairs a brute-force n² levenshtein scan
    finds — over adversarially tiny alphabets where variant
    collisions are maximal."""
    from sync_cosmos_db_spark.operators.linkage import (
        _editdist_join_fastss,
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                               prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = list(enumerate(words))
    expected = {(i, j, lev(a, b))
                for i, a in rows for j, b in rows
                if i < j and lev(a, b) <= 1}
    df = spark.createDataFrame(rows, "id long, txt string")
    got = {(r.id_a, r.id_b, r.dist)
           for r in _editdist_join_fastss(df, "id", "txt").collect()}
    assert got == expected


@_SETTINGS
@given(st.lists(st.integers(0, 1000), min_size=3, max_size=40))
def test_cusum_scan_matches_sequential_recursion(spark, vals):
    """X143: the distributed prefix-scan closed form must equal the
    literal sequential recursion bit-for-bit — both run in integer
    1e-4 units, so equality is exact, not approximate."""
    import math

    from sync_cosmos_db_spark.operators.profiling import cusum

    df = spark.createDataFrame(
        [(t, float(v)) for t, v in enumerate(vals)], "t long, v double")
    out = sorted(cusum(df, "t", "v").collect(), key=lambda r: r.t)

    # pure-python sequential reference in the same integer units
    scale = 10_000
    vi = [int(math.floor(v * scale + 0.5)) for v in vals]
    mu = int(math.floor(sum(vi) / len(vi) + 0.5))
    n = len(vi)
    mean = sum(vi) / n
    var = (sum(x * x for x in vi) - n * mean * mean) / (n - 1)
    sd = math.sqrt(var) if var > 0 else 0.0
    k = int(math.floor(sd * 0.5 + 0.5))
    sp = sn = 0
    for r, x in zip(out, vi):
        sp = max(0, sp + x - mu - k)
        sn = max(0, sn + mu - x - k)
        assert r.s_pos == sp / scale, (r.t, r.s_pos, sp / scale)
        assert r.s_neg == sn / scale


def test_no_shadowed_top_level_defs():
    """A module appending a function whose name already exists
    silently SHADOWS the original (the X187/X19 cohort_retention
    incident) — scan every package module's AST for duplicate
    top-level def names."""
    import ast
    import glob
    import os

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "sync_cosmos_db_spark")
    bad = {}
    for path in glob.glob(os.path.join(root, "**", "*.py"),
                          recursive=True):
        tree = ast.parse(open(path).read())
        names = [n.name for n in tree.body
                 if isinstance(n, ast.FunctionDef)]
        dups = sorted({n for n in names if names.count(n) > 1})
        if dups:
            bad[os.path.relpath(path, root)] = dups
    assert not bad, f"shadowed defs: {bad}"
