"""Unit tests for the eighth round-9 batch (X282-X285) — pure-Python
replays from the raw parquet."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict


def _bucket(key, salt: str, n: int) -> int:
    h = hashlib.sha256(f"{key}:{salt}".encode()).hexdigest()
    return int(h[:6].translate(str.maketrans("abcdef", "012345"))) % n


def _orders(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderpriority", "o_totalprice", "o_custkey")
            .collect())


def _median(values):
    s = sorted(values)
    n = len(s)
    mid = (n - 1) / 2
    lo, hi = s[int(math.floor(mid))], s[int(math.ceil(mid))]
    return lo + (hi - lo) * (mid - math.floor(mid))


def test_brown_forsythe_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import brown_forsythe_priority_var

    rows = _orders(spark, sf_dir)
    groups: defaultdict = defaultdict(list)
    for r in rows:
        groups[r.o_orderpriority].append(
            int(math.floor(float(r.o_totalprice) * 100 + 0.5)))
    devs = {g: [abs(c - _median(vs)) for c in vs]
            for g, vs in groups.items() for vs in [vs]}
    k = len(groups)
    n = sum(len(v) for v in devs.values())
    s = sum(sum(v) for v in devs.values())
    q = sum(x * x for v in devs.values() for x in v)
    bterm = sum(sum(v) ** 2 / len(v) for v in devs.values())
    f = ((bterm - s * s / n) / (k - 1)) / ((q - bterm) / (n - k))
    got = brown_forsythe_priority_var(spark, sf_dir).collect()[0]
    assert (got.k, got.n) == (k, n)
    assert abs(got.f_stat - f) <= 2e-5


def test_cvm_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import cvm_two_sample_arms
    from sync_cosmos_db_spark.cache_scope import release_persisted

    rows = _orders(spark, sf_dir)
    data = [(int(math.floor(float(r.o_totalprice) * 100 + 0.5)),
             _bucket(r.o_custkey, "did", 2)) for r in rows]
    vc: defaultdict = defaultdict(lambda: [0, 0, 0])
    for v, a in data:
        vc[v][0] += 1
        vc[v][1 if a == 1 else 2] += 1
    cum = cum1 = cum0 = 0.0
    u1 = u0 = 0.0
    for v in sorted(vc):
        t, t1, t0 = vc[v]
        cum += t
        cum1 += t1
        cum0 += t0
        mr = cum - (t - 1) / 2
        mr1 = cum1 - (t1 - 1) / 2
        mr0 = cum0 - (t0 - 1) / 2
        u1 += t1 * (mr - mr1) ** 2
        u0 += t0 * (mr - mr0) ** 2
    n1 = sum(1 for _, a in data if a == 1)
    n0 = len(data) - n1
    nn = n1 + n0
    t_cvm = (n1 * u1 + n0 * u0) / (n1 * n0 * nn) \
        - (4.0 * n1 * n0 - 1) / (6.0 * nn)
    got = cvm_two_sample_arms(spark, sf_dir).collect()[0]
    release_persisted()
    assert (got.n1, got.n0) == (n1, n0)
    assert abs(got.t_cvm - t_cvm) <= 2e-6
    assert got.verdict == ("DIFFERENT" if t_cvm > 0.461
                           else "NO_DIFFERENCE")


def test_mood_median_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import mood_median_priority

    rows = _orders(spark, sf_dir)
    cents = [int(math.floor(float(r.o_totalprice) * 100 + 0.5))
             for r in rows]
    med = _median(cents)
    ab: defaultdict = defaultdict(lambda: [0, 0])
    for r, c in zip(rows, cents):
        ab[r.o_orderpriority][0 if c > med else 1] += 1
    k = len(ab)
    ta = sum(v[0] for v in ab.values())
    tb = sum(v[1] for v in ab.values())
    n = ta + tb
    chi2 = 0.0
    for a, b in ab.values():
        ea = (a + b) * ta / n
        eb = (a + b) * tb / n
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    got = mood_median_priority(spark, sf_dir).collect()[0]
    assert (got.k, got.n) == (k, n)
    assert abs(got.chi2 - chi2) <= 2e-5


def test_hellinger_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import hellinger_arm_price_digits

    rows = _orders(spark, sf_dir)
    c: defaultdict = defaultdict(lambda: [0, 0])
    for r in rows:
        cents = int(math.floor(float(r.o_totalprice) * 100 + 0.5))
        arm = _bucket(r.o_custkey, "did", 2)
        c[len(str(cents))][1 - (1 if arm == 1 else 0)] = \
            c[len(str(cents))][1 - (1 if arm == 1 else 0)] + 1
    n1 = sum(v[0] for v in c.values())
    n0 = sum(v[1] for v in c.values())
    bc = sum(math.sqrt(v[0] * v[1]) for v in c.values()) \
        / math.sqrt(n1 * n0)
    tv = sum(abs(v[0] / n1 - v[1] / n0) for v in c.values()) / 2
    hel = math.sqrt(1 - min(bc, 1.0))
    got = hellinger_arm_price_digits(spark, sf_dir).collect()[0]
    assert got.n_buckets == len(c)
    assert (got.n1, got.n0) == (n1, n0)
    assert abs(got.bhattacharyya - bc) <= 2e-6
    assert abs(got.hellinger - hel) <= 2e-6
    assert abs(got.total_variation - tv) <= 2e-6
    assert 0 <= got.hellinger <= 1 and 0 <= got.total_variation <= 1
