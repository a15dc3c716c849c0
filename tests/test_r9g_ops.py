"""Unit tests for the seventh round-9 batch (X279-X281) — pure-Python
replays from the raw parquet."""

from __future__ import annotations

from collections import Counter, defaultdict


def test_kruskal_wallis_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import kruskal_wallis_priority_price

    rows = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderpriority", "o_totalprice").collect())
    data = [(r.o_orderpriority, float(r.o_totalprice)) for r in rows]
    # midranks over the sorted distinct values
    vc = Counter(v for _, v in data)
    midrank, cum = {}, 0.0
    for v in sorted(vc):
        t = vc[v]
        cum += t
        midrank[v] = cum - (t - 1) / 2
    n_g: Counter = Counter()
    rsum: defaultdict = defaultdict(float)
    for g, v in data:
        n_g[g] += 1
        rsum[g] += midrank[v]
    n = len(data)
    k = len(n_g)
    hterm = sum(rsum[g] ** 2 / n_g[g] for g in n_g)
    h_raw = 12.0 / (n * (n + 1)) * hterm - 3 * (n + 1)
    tie3 = sum(t ** 3 - t for t in vc.values() if t > 1)
    corr = 1 - tie3 / (n ** 3 - n)
    got = kruskal_wallis_priority_price(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.k, r.n) == (k, n)
    assert abs(r.h_raw - h_raw) <= 2e-6
    assert abs(r.h_corrected - h_raw / corr) <= 2e-6
    crit = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
            5: 11.070498}.get(k - 1, 12.591587)
    assert r.verdict == ("DIFFERENT" if h_raw / corr > crit
                         else "NO_DIFFERENCE")


def _daily_cents(spark, sf_dir):
    rows = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderdate", "o_totalprice").collect())
    import math

    daily: defaultdict = defaultdict(int)
    for r in rows:
        daily[r.o_orderdate] += int(math.floor(float(r.o_totalprice)
                                               * 100 + 0.5))
    return daily


def test_periodicity_scan_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import (
        _PERIODS, periodicity_scan_daily_revenue)

    daily = _daily_cents(spark, sf_dir)
    d0 = min(daily)
    n = len(daily)
    s = float(sum(daily.values()))
    q = sum(float(c) * c for c in daily.values())
    got = {r.period: r
           for r in periodicity_scan_daily_revenue(spark, sf_dir).collect()}
    assert set(got) == set(_PERIODS)
    for p in _PERIODS:
        buckets: defaultdict = defaultdict(lambda: [0, 0])
        for dt, c in daily.items():
            b = (dt - d0).days % p
            buckets[b][0] += c
            buckets[b][1] += 1
        between = sum(float(sb) ** 2 / cb for sb, cb in buckets.values())
        eta2 = (between - s * s / n) / (q - s * s / n)
        r = got[p]
        assert r.n_days == n
        assert r.n_buckets == len(buckets)
        assert abs(r.eta2 - eta2) <= 2e-6, p
        assert 0.0 <= r.eta2 <= 1.0


def test_ljung_box_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import (
        _LB_LAGS, ljung_box_daily_revenue)

    daily = _daily_cents(spark, sf_dir)
    d0 = min(daily)
    n = len(daily)
    mu = sum(daily.values()) / n
    e = {(dt - d0).days: c - mu for dt, c in daily.items()}
    s2 = sum(x * x for x in e.values())
    got = {r.lag: r for r in ljung_box_daily_revenue(spark, sf_dir).collect()}
    assert set(got) == set(range(1, _LB_LAGS + 1))
    import math

    q_cum = 0.0
    for lag in range(1, _LB_LAGS + 1):
        pairs = [(di, di + lag) for di in e if di + lag in e]
        nk = sum(e[a] * e[b] for a, b in pairs)
        rho = math.floor(nk / s2 * 1e6 + 0.5) / 1e6
        q_cum += n * (n + 2.0) * rho * rho / (n - lag)
        r = got[lag]
        assert r.n_pairs == len(pairs)
        assert abs(r.rho - rho) <= 2e-6, lag
        assert abs(r.q_lb - q_cum) <= 2e-4, lag
        crit = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
                5: 11.070498, 6: 12.591587, 7: 14.067140, 8: 15.507313,
                9: 16.918978}.get(lag, 18.307038)
        assert r.verdict == ("AUTOCORRELATED" if r.q_lb > crit else "WHITE")
