"""Unit tests for the sixth round-9 batch (X275-X278) — pure-Python
replays from the raw parquet."""

from __future__ import annotations

import hashlib
import math
from collections import Counter


def _bucket(key, salt: str, n: int) -> int:
    h = hashlib.sha256(f"{key}:{salt}".encode()).hexdigest()
    return int(h[:6].translate(str.maketrans("abcdef", "012345"))) % n


def test_logrank_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import logrank_survival_arms

    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "event_type", "ts").collect())
    first: dict[int, str] = {}
    last: dict[int, str] = {}
    firstp: dict[int, str] = {}
    for r in rows:
        d = r.ts.strftime("%Y-%m-%d")
        first[r.user_id] = min(first.get(r.user_id, d), d)
        last[r.user_id] = max(last.get(r.user_id, d), d)
        if r.event_type == "purchase":
            firstp[r.user_id] = min(firstp.get(r.user_id, d), d)
    import datetime as dt

    def days(a, b):
        return (dt.date.fromisoformat(b) - dt.date.fromisoformat(a)).days

    surv = []
    for u in first:
        arm = _bucket(u, "did", 2)
        if u in firstp:
            surv.append((arm, days(first[u], firstp[u]), 1))
        else:
            surv.append((arm, days(first[u], last[u]), 0))
    times = sorted({t for _, t, d in surv if d == 1})
    o_e, var = 0.0, 0.0
    for t in times:
        at = [(a, tt, d) for a, tt, d in surv if tt >= t]
        n = len(at)
        n1 = sum(1 for a, _, _ in at if a == 1)
        d_ = sum(1 for _, tt, dd in at if dd == 1 and tt == t)
        d1 = sum(1 for a, tt, dd in at if dd == 1 and tt == t and a == 1)
        o_e += d1 - d_ * n1 / n
        if n > 1:
            var += d_ * (n1 / n) * (1 - n1 / n) * (n - d_) / (n - 1)
    chi2 = o_e * o_e / var
    [r] = logrank_survival_arms(spark, sf_dir).collect()
    assert r.n_times == len(times)
    assert abs(r.o_minus_e - o_e) <= 2e-6
    assert abs(r.var_sum - var) <= 2e-6
    assert abs(r.chi2 - chi2) <= 2e-4
    assert r.verdict == ("DIFFERENT" if chi2 > 3.841459
                         else "NO_DIFFERENCE")


def test_permutation_test_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import (
        _PERM_B,
        permutation_test_orders,
    )

    rows = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_custkey", "o_totalprice").collect())

    def diff(arm_of):
        a = [r.o_totalprice for r in rows if arm_of(r.o_custkey) == 1]
        b = [r.o_totalprice for r in rows if arm_of(r.o_custkey) == 0]
        d = sum(a) / len(a) - sum(b) / len(b)
        return math.floor(d * 1e6 + 0.5) / 1e6

    d_obs = diff(lambda k: _bucket(k, "did", 2))
    extreme = 0
    for b in range(1, _PERM_B + 1):
        d_b = diff(lambda k, b=b: _bucket(f"{k}#{b}", "perm", 2))
        if abs(d_b) >= abs(d_obs):
            extreme += 1
    p = math.floor((1 + extreme) / (1 + _PERM_B) * 1e6 + 0.5) / 1e6
    [r] = permutation_test_orders(spark, sf_dir).collect()
    assert r.n_perms == _PERM_B
    assert abs(r.diff_obs - d_obs) <= 2e-6
    assert r.n_extreme == extreme
    assert abs(r.p_value - p) <= 2e-6
    assert r.verdict == ("REJECT" if (1 + extreme) / (1 + _PERM_B) < 0.05
                         else "FAIL_TO_REJECT")


def test_mh_odds_ratio_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import mh_odds_ratio_nations

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rows = (o.join(c, c.c_custkey == o.o_custkey)
            .select("c_nationkey", "o_custkey", "o_orderstatus").collect())
    cells: dict[int, list[int]] = {}
    for r in rows:
        arm = _bucket(r.o_custkey, "did", 2)
        y = int(r.o_orderstatus == "F")
        abcd = cells.setdefault(r.c_nationkey, [0, 0, 0, 0])
        abcd[(1 - arm) * 2 + (1 - y)] += 1  # [a, b, c, d]
    rs = ss = pr = ps = qs = 0.0
    k = 0
    for a, b, c_, d in cells.values():
        if a + b == 0 or c_ + d == 0:
            continue
        k += 1
        n = a + b + c_ + d
        rs += a * d / n
        ss += b * c_ / n
        pr += (a + d) / n * a * d / n
        ps += (a + d) / n * b * c_ / n + (b + c_) / n * a * d / n
        qs += (b + c_) / n * b * c_ / n
    [r] = mh_odds_ratio_nations(spark, sf_dir).collect()
    assert r.k == k
    assert abs(r.or_mh - rs / ss) <= 2e-6
    assert abs(r.ln_or - math.log(rs / ss)) <= 2e-6
    se = math.sqrt(pr / (2 * rs * rs) + ps / (2 * rs * ss)
                   + qs / (2 * ss * ss))
    assert abs(r.se_ln_or - se) <= 2e-6


def test_cramers_v_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import cramers_v_matrix_orders

    rows = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderstatus", "o_orderpriority", "o_orderdate")
            .collect())
    cols = {"status": [r.o_orderstatus for r in rows],
            "priority": [r.o_orderpriority for r in rows],
            "yr": [str(r.o_orderdate.year) for r in rows]}
    got = {(r.col_a, r.col_b): r
           for r in cramers_v_matrix_orders(spark, sf_dir).collect()}
    assert set(got) == {("status", "priority"), ("status", "yr"),
                        ("priority", "yr")}
    for (ca, cb), r in got.items():
        joint = Counter(zip(cols[ca], cols[cb]))
        ma, mb = Counter(cols[ca]), Counter(cols[cb])
        n = len(rows)
        chi2 = 0.0
        for (va, vb), nij in joint.items():
            e = ma[va] * mb[vb] / n
            chi2 += (nij - e) ** 2 / e
        # cells absent from the joint but with nonzero margins
        for va in ma:
            for vb in mb:
                if (va, vb) not in joint:
                    chi2 += ma[va] * mb[vb] / n
        rr, cc = len(ma), len(mb)
        v = math.sqrt(chi2 / (n * (min(rr, cc) - 1)))
        assert (r.r, r.c) == (rr, cc)
        assert abs(r.chi2 - chi2) <= 2e-4, (ca, cb)
        assert abs(r.cramers_v - v) <= 2e-6, (ca, cb)
