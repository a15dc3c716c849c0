"""Unit tests for the third round-9 batch (X263-X266) — each query
re-derived in pure Python from the raw parquet and compared exactly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _cents(v: float) -> int:
    return int(math.floor(v * 100 + 0.5))


def test_jackknife_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import jackknife_ratio_orders

    rows = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_custkey", "o_totalprice").collect())
    per: dict[int, list[int]] = {}
    for r in rows:
        x, y = per.get(r.o_custkey, [0, 0])
        per[r.o_custkey] = [x + _cents(r.o_totalprice), y + 1]
    sx = sum(x for x, _ in per.values())
    sy = sum(y for _, y in per.values())
    n = len(per)
    loo = [(sx - x) / (sy - y) for x, y in per.values()]
    rbar = sum(loo) / n
    vp = sum((r - rbar) ** 2 for r in loo) / n
    se = math.sqrt((n - 1) * vp)
    [r] = jackknife_ratio_orders(spark, sf_dir).collect()
    assert r.n_units == n
    assert abs(r.r_full - sx / sy) <= 2e-6
    assert abs(r.se_jack - se) <= 2e-6
    assert abs(r.ci_lo - (r.r_full - 1.96 * r.se_jack)) <= 2e-6
    assert abs(r.ci_hi - (r.r_full + 1.96 * r.se_jack)) <= 2e-6


def test_mann_kendall_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import mann_kendall_monthly_revenue

    rows = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderpriority", "o_orderdate", "o_totalprice")
            .collect())
    monthly: dict[tuple, int] = {}
    for r in rows:
        k = (r.o_orderpriority, r.o_orderdate.strftime("%Y-%m"))
        monthly[k] = monthly.get(k, 0) + _cents(r.o_totalprice)
    by_pri: dict[str, list[int]] = {}
    for (pri, mo), c in sorted(monthly.items()):
        by_pri.setdefault(pri, []).append(c)
    out = {r.priority: r
           for r in mann_kendall_monthly_revenue(spark, sf_dir).collect()}
    assert set(out) == set(by_pri)
    for pri, series in by_pri.items():
        n = len(series)
        s = sum((cj > ci) - (cj < ci)
                for i, ci in enumerate(series)
                for cj in series[i + 1:])
        counts: dict[int, int] = {}
        for c in series:
            counts[c] = counts.get(c, 0) + 1
        tie = sum(t * (t - 1) * (2 * t + 5)
                  for t in counts.values() if t > 1)
        var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        r = out[pri]
        assert r.n_months == n
        assert r.s_stat == s
        assert abs(r.var_s - var_s) <= 2e-6
        assert abs(r.z - z) <= 2e-6
        expect_trend = ("increasing" if r.z > 1.96
                        else "decreasing" if r.z < -1.96 else "none")
        assert r.trend == expect_trend


def test_ca_trend_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import ca_trend_priority_status

    rows = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderpriority", "o_orderstatus").collect())
    g: dict[int, list[int]] = {}
    for r in rows:
        w = int(r.o_orderpriority[0])
        n, x = g.get(w, [0, 0])
        g[w] = [n + 1, x + (r.o_orderstatus == "F")]
    nn = sum(n for n, _ in g.values())
    xx = sum(x for _, x in g.values())
    swx = sum(w * x for w, (_, x) in g.items())
    swn = sum(w * n for w, (n, _) in g.items())
    swwn = sum(w * w * n for w, (n, _) in g.items())
    pbar = xx / nn
    t = swx - swn * pbar
    denom = pbar * (1 - pbar) * (swwn - swn * swn / nn)
    z2 = t * t / denom
    [r] = ca_trend_priority_status(spark, sf_dir).collect()
    assert (r.n_total, r.x_total) == (nn, xx)
    assert abs(r.t_stat - t) <= 2e-6
    assert abs(r.z2 - z2) <= 2e-6
    assert r.verdict == ("TREND" if z2 > 3.841459 else "NO_TREND")


def test_eb_shrinkage_properties(spark, sf_dir):
    """Shrunk rates sit strictly between the raw rate and the prior
    mean α/(α+β), pull harder on smaller groups, and match the
    beta-binomial posterior-mean formula exactly."""
    from sync_cosmos_db_spark.queries_r9 import eb_shrunk_return_rates

    rows = eb_shrunk_return_rates(spark, sf_dir).collect()
    assert len(rows) > 1
    alpha, beta = rows[0].alpha, rows[0].beta
    assert alpha > 0 and beta > 0
    prior = alpha / (alpha + beta)
    for r in rows:
        expect = math.floor((r.x + alpha) / (r.n + alpha + beta)
                            * 1e6 + 0.5) / 1e6
        assert abs(r.shrunk_rate - expect) <= 1e-9, r.brand
        lo, hi = sorted((r.raw_rate, prior))
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6, r.brand
        # shrinkage factor n/(n+α+β) < 1: shrunk is closer to prior
        assert (abs(r.shrunk_rate - prior)
                <= abs(r.raw_rate - prior) + 1e-6), r.brand
