"""Unit tests for the fourth round-9 batch (X267-X270) — pure-Python
replays of each statistic from the raw parquet."""

from __future__ import annotations

import hashlib
import math
from collections import Counter


def _bucket(key: int, salt: str, n: int) -> int:
    h = hashlib.sha256(f"{key}:{salt}".encode()).hexdigest()
    return int(h[:6].translate(str.maketrans("abcdef", "012345"))) % n


def test_stylometry_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import (
        _DELTA_K,
        stylometry_delta_sources,
    )

    rows = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("source", "text").collect())
    per_src: dict[str, Counter] = {}
    for r in rows:
        per_src.setdefault(r.source, Counter()).update(r.text.split(" "))
    glob = Counter()
    for c in per_src.values():
        glob.update(c)
    topw = [w for w, _ in sorted(glob.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:_DELTA_K]]
    srcs = sorted(per_src)
    tot = {s: sum(per_src[s].values()) for s in srcs}
    f = {(s, w): per_src[s].get(w, 0) / tot[s] for s in srcs for w in topw}
    z = {}
    for w in topw:
        vals = [f[(s, w)] for s in srcs]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
        for s in srcs:
            z[(s, w)] = math.floor((f[(s, w)] - mu) / sd * 1e8 + 0.5) / 1e8
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            d = sum(abs(z[(a, w)] - z[(b, w)]) for w in topw) / len(topw)
            expect[(a, b)] = math.floor(d * 1e6 + 0.5) / 1e6
    got = {(r.source_a, r.source_b): r.delta
           for r in stylometry_delta_sources(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) <= 2e-6, k


def test_seq_monitor_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import seq_monitor_events

    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_type", "ts", "user_id").collect())
    daily: dict[tuple, list[int]] = {}
    for r in rows:
        k = (r.event_type, r.ts.strftime("%Y-%m-%d"))
        t, c = daily.get(k, [0, 0])
        if _bucket(r.user_id, "did", 2) == 1:
            t += 1
        else:
            c += 1
        daily[k] = [t, c]
    expect = {}
    cum: dict[str, list[int]] = {}
    for (et, day) in sorted(daily):
        t, c = daily[(et, day)]
        ct, cc = cum.get(et, [0, 0])
        ct, cc = ct + t, cc + c
        cum[et] = [ct, cc]
        zz = math.floor((ct - cc) / math.sqrt(ct + cc) * 1e6 + 0.5) / 1e6
        expect[(et, day)] = (ct, cc, zz, int(abs(zz) > 3.0))
    got = {(r.event_type, str(r.day)): (r.cum_t, r.cum_c, r.z, r.crossed)
           for r in seq_monitor_events(spark, sf_dir).collect()}
    assert got == expect


def test_covariate_balance_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import covariate_balance_users

    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "event_type", "value").collect())
    per: dict[int, list] = {}
    for r in rows:
        u = per.setdefault(r.user_id, [0, 0.0, set()])
        u[0] += 1
        u[1] += r.value
        u[2].add(r.event_type)
    cov = {"n_events": {}, "total_value": {}, "n_types": {},
           "mean_value": {}}
    for uid, (n, tv, types) in per.items():
        t = _bucket(uid, "did", 2)
        cov["n_events"].setdefault(t, []).append(float(n))
        cov["total_value"].setdefault(t, []).append(tv)
        cov["n_types"].setdefault(t, []).append(float(len(types)))
        cov["mean_value"].setdefault(t, []).append(tv / n)
    got = {r.covariate: r
           for r in covariate_balance_users(spark, sf_dir).collect()}
    assert set(got) == set(cov)
    for name, groups in cov.items():
        mt = sum(groups[1]) / len(groups[1])
        mc = sum(groups[0]) / len(groups[0])
        vt = sum((v - mt) ** 2 for v in groups[1]) / len(groups[1])
        vc = sum((v - mc) ** 2 for v in groups[0]) / len(groups[0])
        r = got[name]
        assert abs(r.mean_t - mt) <= 2e-6
        assert abs(r.mean_c - mc) <= 2e-6
        if vt + vc > 0:
            smd = (mt - mc) / math.sqrt((vt + vc) / 2)
            assert abs(r.smd - smd) <= 2e-6
            assert r.verdict == ("BALANCED" if abs(r.smd) < 0.1
                                 else "IMBALANCED")
        else:
            assert r.smd is None and r.verdict == "DEGENERATE"


def test_vocab_richness_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import vocab_richness_sources

    rows = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("source", "text").collect())
    per: dict[str, Counter] = {}
    for r in rows:
        per.setdefault(r.source, Counter()).update(r.text.split(" "))
    got = {r.source: r
           for r in vocab_richness_sources(spark, sf_dir).collect()}
    assert set(got) == set(per)
    for s, c in per.items():
        n = sum(c.values())
        v = len(c)
        n1 = sum(1 for x in c.values() if x == 1)
        n2 = sum(1 for x in c.values() if x == 2)
        r = got[s]
        assert (r.n_tokens, r.vocab, r.n1, r.n2) == (n, v, n1, n2)
        assert abs(r.p_unseen_gt - n1 / n) <= 2e-6
        assert abs(r.chao1 - (v + n1 * (n1 - 1) / (2 * (n2 + 1)))) <= 2e-6
        # Chao1 never estimates fewer words than observed
        assert r.chao1 >= v
