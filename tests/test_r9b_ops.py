"""Unit tests for the second round-9 batch (X259-X262) — each query
is re-derived independently (pure Python / pandas) and compared to the
registered Spark form, on top of the DuckDB oracle the sweep runs."""

from __future__ import annotations

import hashlib
import itertools
import math

from pyspark.sql import functions as F


def _bucket(key: int, salt: str, n: int) -> int:
    """Pure-Python twin of ``curation.hash_bucket`` (sha2 hex-digit
    trick)."""
    h = hashlib.sha256(f"{key}:{salt}".encode()).hexdigest()
    tr = str.maketrans("abcdef", "012345")
    return int(h[:6].translate(tr)) % n


def test_did_cells_partition_and_estimate(spark, sf_dir):
    """The four cells partition each event type's rows, and the DiD
    estimate equals the rounded difference-of-differences of the
    emitted (already rounded) cell means."""
    from sync_cosmos_db_spark.queries_r9 import did_event_value

    out = {r.event_type: r for r in
           did_event_value(spark, sf_dir).collect()}
    totals = {r.event_type: r.n for r in
              spark.read.parquet(f"{sf_dir}/events.parquet")
              .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert set(out) == set(totals)
    for et, r in out.items():
        assert r.n_t_pre + r.n_t_post + r.n_c_pre + r.n_c_post == totals[et]
        expect = math.floor(((r.m_t_post - r.m_t_pre)
                             - (r.m_c_post - r.m_c_pre)) * 1e6 + 0.5) / 1e6
        assert r.did == expect


def test_did_treat_assignment_matches_hash(spark, sf_dir):
    """Cell counts agree with a pure-Python replay of the sha2 user
    bucket and the cutoff split."""
    from sync_cosmos_db_spark.queries_r9 import _DID_CUTOFF, did_event_value

    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_type", "user_id", "ts").collect())
    cut = _DID_CUTOFF
    cells: dict[tuple[str, int, int], int] = {}
    for r in rows:
        t = _bucket(r.user_id, "did", 2)
        p = 1 if r.ts.strftime("%Y-%m-%d") < cut else 0
        cells[(r.event_type, t, p)] = cells.get((r.event_type, t, p), 0) + 1
    for r in did_event_value(spark, sf_dir).collect():
        et = r.event_type
        assert r.n_t_pre == cells.get((et, 1, 1), 0)
        assert r.n_t_post == cells.get((et, 1, 0), 0)
        assert r.n_c_pre == cells.get((et, 0, 1), 0)
        assert r.n_c_post == cells.get((et, 0, 0), 0)


def test_control_rules_match_pandas_replay(spark, sf_dir):
    """Every flagged day (and no other) is reproduced by a pandas
    replay of the z-score and the four Western Electric run rules."""
    from sync_cosmos_db_spark.queries_r9 import control_rules_daily_revenue

    daily = (spark.read.parquet(f"{sf_dir}/orders.parquet")
             .groupBy(F.col("o_orderpriority").alias("priority"),
                      F.to_date("o_orderdate").alias("day"))
             .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                        .cast("bigint")).alias("cents"))
             .toPandas())
    expect = {}
    for pri, g in daily.groupby("priority"):
        g = g.sort_values("day").reset_index(drop=True)
        mean = g.cents.mean()
        sd = math.sqrt(((g.cents - mean) ** 2).mean())
        z = [math.floor((c - mean) / sd * 1e6 + 0.5) / 1e6 for c in g.cents]
        for i in range(len(z)):
            r1 = int(abs(z[i]) > 3)
            w3 = z[max(0, i - 2):i + 1]
            r2 = int(i >= 2 and (sum(x > 2 for x in w3) >= 2
                                 or sum(x < -2 for x in w3) >= 2))
            w5 = z[max(0, i - 4):i + 1]
            r3 = int(i >= 4 and (sum(x > 1 for x in w5) >= 4
                                 or sum(x < -1 for x in w5) >= 4))
            w8 = z[max(0, i - 7):i + 1]
            r4 = int(i >= 7 and (sum(x > 0 for x in w8) == 8
                                 or sum(x < 0 for x in w8) == 8))
            if r1 + r2 + r3 + r4:
                expect[(pri, str(g.day[i]))] = (r1, r2, r3, r4,
                                                r1 + 2 * r2 + 4 * r3 + 8 * r4)
    got = {(r.priority, str(r.day)): (r.r1, r.r2, r.r3, r.r4, r.rule_mask)
           for r in control_rules_daily_revenue(spark, sf_dir).collect()}
    assert got == expect


def test_shapley_matches_pure_python(spark, sf_dir):
    """φ per channel equals an independent pure-Python Shapley
    computation from the per-user (touched set, converted) table."""
    from sync_cosmos_db_spark.queries_r9 import (
        _SHAP_CHANNELS,
        shapley_attribution_events,
    )

    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "event_type").collect())
    touched: dict[int, set] = {}
    conv: dict[int, int] = {}
    for r in rows:
        touched.setdefault(r.user_id, set())
        conv.setdefault(r.user_id, 0)
        if r.event_type == "purchase":
            conv[r.user_id] = 1
        else:
            touched[r.user_id].add(r.event_type)
    coal: dict[str, list[int]] = {}
    for u, s in touched.items():
        k = ",".join(sorted(s))
        n, c = coal.get(k, [0, 0])
        coal[k] = [n + 1, c + conv[u]]

    def v(key: str) -> float:
        if key not in coal:
            return 0.0
        n, c = coal[key]
        return c / n

    k = len(_SHAP_CHANNELS)
    expect = {}
    for ch in _SHAP_CHANNELS:
        others = [x for x in _SHAP_CHANNELS if x != ch]
        phi = 0.0
        for r in range(k):
            for s in itertools.combinations(others, r):
                w = (math.factorial(len(s)) * math.factorial(k - 1 - len(s))
                     / math.factorial(k))
                phi += w * (v(",".join(sorted(list(s) + [ch])))
                            - v(",".join(sorted(s))))
        expect[ch] = math.floor(phi * 1e6 + 0.5) / 1e6
    out = {r.channel: (r.shapley, r.n_exposed)
           for r in shapley_attribution_events(spark, sf_dir).collect()}
    assert set(out) == set(_SHAP_CHANNELS)
    for ch in _SHAP_CHANNELS:
        assert abs(out[ch][0] - expect[ch]) <= 2e-6, ch
        assert out[ch][1] == sum(1 for s in touched.values() if ch in s)


def test_bloom_matches_hashlib_replay(spark, sf_dir):
    """n_set_bits / fp_count / verdict equal a hashlib replay of the
    filter, and the theory column is the exact fill-cube."""
    from sync_cosmos_db_spark.queries_r9 import (
        _BLOOM_J,
        _BLOOM_M,
        _BLOOM_SOURCES,
        bloom_fpr_calibration,
    )

    rows = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source").collect())
    a = [r.doc_id for r in rows if r.source in _BLOOM_SOURCES]
    b = [r.doc_id for r in rows if r.source not in _BLOOM_SOURCES]
    bits = {_bucket(d, f"bloom{s}", _BLOOM_M)
            for d in a for s in range(_BLOOM_J)}
    fp = sum(1 for d in b
             if all(_bucket(d, f"bloom{s}", _BLOOM_M) in bits
                    for s in range(_BLOOM_J)))
    [r] = bloom_fpr_calibration(spark, sf_dir).collect()
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert r.n_set_bits == len(bits)
    assert r.fp_count == fp
    fill = len(bits) / _BLOOM_M
    assert r.fpr_theory == math.floor(fill ** 3 * 1e6 + 0.5) / 1e6
    assert r.fpr_observed == math.floor(fp / len(b) * 1e6 + 0.5) / 1e6
    assert r.verdict == ("PASS" if abs(r.fpr_observed - r.fpr_theory) <= 0.05
                         else "FAIL")


def test_shapley_no_cartesian_and_broadcast(spark, sf_dir):
    """The coalition joins are broadcast; no CartesianProduct or
    BroadcastNestedLoopJoin anywhere in the plan (the 1-row-anchor
    crossJoins in other queries are the only sanctioned BNLJ shape,
    and this query has none)."""
    from sync_cosmos_db_spark.queries_r9 import shapley_attribution_events

    plan = (shapley_attribution_events(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
