"""Ground-truth unit tests for round-7 batch-6 families X191-X194."""

from __future__ import annotations

import datetime as dt

import pytest


# ---------------------------------------------------------------------------
# X191 — Kaplan–Meier survival
# ---------------------------------------------------------------------------

def _d(day):
    return dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=day)


def test_km_textbook_curve(spark):
    """Hand-built cohort: censored at t=0, two deaths at t=2, a
    death + a censor at t=4, last survivor dies at t=6 — S steps
    1.0 → 0.6 → 0.4 → exactly 0."""
    from sync_cosmos_db_spark.operators.behavioral import km_survival

    rows = []
    # z anchors the high-water mark at day 100 and is censored (t=0)
    rows += [("z", _d(100))]
    rows += [("u1", _d(0)), ("u1", _d(2))]     # death, t=2
    rows += [("u6", _d(30)), ("u6", _d(32))]   # death, t=2
    rows += [("u3", _d(20)), ("u3", _d(24))]   # death, t=4
    rows += [("u4", _d(90)), ("u4", _d(94))]   # censored, t=4
    rows += [("u5", _d(1)), ("u5", _d(7))]     # death, t=6
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {r["t_days"]: r for r in
           km_survival(df, censor_days=30).collect()}
    assert (out[0]["at_risk"], out[0]["deaths"],
            out[0]["censored"], out[0]["survival"]) == (6, 0, 1, 1.0)
    assert (out[2]["at_risk"], out[2]["deaths"]) == (5, 2)
    assert out[2]["survival"] == 0.6
    assert (out[4]["at_risk"], out[4]["deaths"],
            out[4]["censored"]) == (3, 1, 1)
    assert out[4]["survival"] == 0.4
    assert (out[6]["at_risk"], out[6]["deaths"]) == (1, 1)
    assert out[6]["survival"] == 0.0


def test_km_censored_users_leave_at_risk_silently(spark):
    """A censored user reduces later at-risk counts but never
    multiplies a factor in — all-censored data keeps S = 1."""
    from sync_cosmos_db_spark.operators.behavioral import km_survival

    rows = [("a", _d(0)), ("a", _d(95)),
            ("b", _d(50)), ("b", _d(100))]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = km_survival(df, censor_days=30).collect()
    assert all(r["survival"] == 1.0 for r in out)
    assert all(r["deaths"] == 0 for r in out)


# ---------------------------------------------------------------------------
# X192 — ABC classification
# ---------------------------------------------------------------------------

def test_abc_textbook_cut(spark):
    """80/15/5 value split lands exactly one key per class at the
    inclusive boundaries."""
    from sync_cosmos_db_spark.operators.profiling import (
        abc_classification,
    )

    df = spark.createDataFrame(
        [("k1", 80.0), ("k2", 15.0), ("k3", 5.0)],
        "k string, v double")
    out = {r["abc_class"]: r for r in
           abc_classification(df, "k", "v").collect()}
    assert out["A"]["n_keys"] == 1 and out["A"]["value_sum"] == 80.0
    assert out["B"]["n_keys"] == 1 and out["B"]["value_sum"] == 15.0
    assert out["C"]["n_keys"] == 1 and out["C"]["value_sum"] == 5.0
    assert out["A"]["value_share"] == 0.8
    assert out["C"]["value_share"] == 0.05


def test_abc_uniform_values_split_by_count(spark):
    """100 equal-value keys: inclusive cum-share ≤ 80% admits the
    first 80 keys to A, 15 to B, 5 to C (ties broken by key)."""
    from sync_cosmos_db_spark.operators.profiling import (
        abc_classification,
    )

    df = spark.createDataFrame(
        [(f"k{i:03d}", 1.0) for i in range(100)], "k string, v double")
    out = {r["abc_class"]: r["n_keys"] for r in
           abc_classification(df, "k", "v").collect()}
    assert out == {"A": 80, "B": 15, "C": 5}


# ---------------------------------------------------------------------------
# X193 — lexical profile
# ---------------------------------------------------------------------------

def test_lexical_profile_hand_counts(spark):
    """'a a b c': N=4 V=3 V1=2 → TTR .75, hapax 2/3, Yule's K
    10⁴·(Σc²−N)/N² = 10⁴·(6−4)/16 = 1250."""
    from sync_cosmos_db_spark.operators.text import lexical_profile

    df = spark.createDataFrame([("g", "a a b c")],
                               "source string, text string")
    r = lexical_profile(df).collect()[0]
    assert r["n_tokens"] == 4 and r["vocab"] == 3
    assert r["ttr"] == 0.75
    assert r["hapax_share"] == pytest.approx(0.666667, abs=1e-6)
    assert r["yule_k"] == 1250.0


def test_lexical_profile_repetitive_vs_diverse(spark):
    """All-same-token text maxes Yule's K; all-distinct text has
    K = 0 and TTR = hapax = 1."""
    from sync_cosmos_db_spark.operators.text import lexical_profile

    df = spark.createDataFrame(
        [("rep", "x x x x"), ("div", "a b c d")],
        "source string, text string")
    out = {r["source"]: r for r in lexical_profile(df).collect()}
    assert out["div"]["yule_k"] == 0.0
    assert out["div"]["ttr"] == 1.0 and out["div"]["hapax_share"] == 1.0
    # rep: N=4, Σc²=16 → K = 1e4·12/16 = 7500
    assert out["rep"]["yule_k"] == 7500.0
    assert out["rep"]["hapax_share"] == 0.0


# ---------------------------------------------------------------------------
# X194 — HITS
# ---------------------------------------------------------------------------

def test_hits_hand_iterated_bipartite(spark):
    """h1→{a1,a2}, h2→{a2}, unit weights, 3 iterations by hand:
    hubs (13/21, 8/21), authorities (13/34, 21/34)."""
    from sync_cosmos_db_spark.operators.graph import hits_scores

    df = spark.createDataFrame(
        [("h1", "a1", 1), ("h1", "a2", 1), ("h2", "a2", 1)],
        "src string, dst string, w long")
    out = {(r["kind"], r["node"]): r["score"] for r in
           hits_scores(df).collect()}
    assert out[("hub", "h1")] == pytest.approx(13 / 21, abs=1e-9)
    assert out[("hub", "h2")] == pytest.approx(8 / 21, abs=1e-9)
    assert out[("authority", "a1")] == pytest.approx(13 / 34, abs=1e-9)
    assert out[("authority", "a2")] == pytest.approx(21 / 34, abs=1e-9)


def test_hits_scores_sum_to_one_per_kind(spark):
    """L1 normalization: hub scores and authority scores each sum
    to 1 (to the rounding grid) on a weighted graph."""
    from sync_cosmos_db_spark.operators.graph import hits_scores

    rows = [(f"h{i}", f"a{j}", (i + j) % 3 + 1)
            for i in range(4) for j in range(3)]
    df = spark.createDataFrame(rows, "src string, dst string, w long")
    out = hits_scores(df).collect()
    hubs = sum(r["score"] for r in out if r["kind"] == "hub")
    auths = sum(r["score"] for r in out if r["kind"] == "authority")
    assert hubs == pytest.approx(1.0, abs=1e-7)
    assert auths == pytest.approx(1.0, abs=1e-7)


def test_hits_weight_sensitivity(spark):
    """Doubling one edge's weight must strictly raise its endpoints'
    shares: hub h1 and authority a1 gain when h1→a1 doubles."""
    from sync_cosmos_db_spark.operators.graph import hits_scores

    base = [("h1", "a1", 1), ("h1", "a2", 1), ("h2", "a2", 1)]
    heavy = [("h1", "a1", 2), ("h1", "a2", 1), ("h2", "a2", 1)]
    s1 = {(r["kind"], r["node"]): r["score"] for r in hits_scores(
        spark.createDataFrame(base, "src string, dst string, w long")
    ).collect()}
    s2 = {(r["kind"], r["node"]): r["score"] for r in hits_scores(
        spark.createDataFrame(heavy, "src string, dst string, w long")
    ).collect()}
    assert s2[("hub", "h1")] > s1[("hub", "h1")]
    assert s2[("authority", "a1")] > s1[("authority", "a1")]
