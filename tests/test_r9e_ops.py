"""Unit tests for the fifth round-9 batch (X271-X274) — pure-Python
replays from the raw parquet."""

from __future__ import annotations

import hashlib
import math


def _bucket(key: int, salt: str, n: int) -> int:
    h = hashlib.sha256(f"{key}:{salt}".encode()).hexdigest()
    return int(h[:6].translate(str.maketrans("abcdef", "012345"))) % n


def test_capture_recapture_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import capture_recapture_users

    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "ts").collect())
    s1 = {r.user_id for r in rows
          if r.ts.strftime("%Y-%m-%d") < "2024-01-11"}
    s2 = {r.user_id for r in rows
          if "2024-01-11" <= r.ts.strftime("%Y-%m-%d") < "2024-01-21"}
    allu = {r.user_id for r in rows}
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    n_hat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se = math.sqrt((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
                   / ((m + 1) ** 2 * (m + 2)))
    [r] = capture_recapture_users(spark, sf_dir).collect()
    assert (r.n1, r.n2, r.m, r.n_true) == (n1, n2, m, len(allu))
    assert abs(r.n_hat - n_hat) <= 2e-6
    assert abs(r.se - se) <= 2e-6
    expect_cover = int(r.n_hat - 1.96 * r.se <= len(allu)
                       <= r.n_hat + 1.96 * r.se)
    assert r.ci_covers_truth == expect_cover


def test_elasticity_matches_pure_python(spark, sf_dir):
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.queries_r9 import elasticity_brand_ols

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf_dir}/part.parquet")
    rows = (li.join(pt, pt.p_partkey == li.l_partkey)
            .select("p_brand", F.date_trunc("month", "l_shipdate")
                    .alias("mo"), "l_extendedprice", "l_quantity")
            .collect())
    agg: dict[tuple, list[int]] = {}
    for r in rows:
        k = (r.p_brand, r.mo)
        c, q = agg.get(k, [0, 0])
        agg[k] = [c + int(math.floor(r.l_extendedprice * 100 + 0.5)),
                  q + int(r.l_quantity)]
    per_brand: dict[str, list] = {}
    for (b, _), (c, q) in agg.items():
        per_brand.setdefault(b, []).append((math.log(c / q),
                                            math.log(q)))
    got = {r.brand: r for r in elasticity_brand_ols(spark, sf_dir).collect()}
    assert set(got) == set(per_brand)
    for b, xy in per_brand.items():
        n = len(xy)
        mx = sum(x for x, _ in xy) / n
        my = sum(y for _, y in xy) / n
        cov = sum((x - mx) * (y - my) for x, y in xy) / n
        vx = sum((x - mx) ** 2 for x, _ in xy) / n
        slope = cov / vx
        icept = my - slope * mx
        r = got[b]
        assert r.n_months == n
        assert abs(r.elasticity - slope) <= 2e-6, b
        assert abs(r.intercept - icept) <= 2e-6, b


def test_meta_effect_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import meta_effect_nations

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rows = (o.join(c, c.c_custkey == o.o_custkey)
            .select("c_nationkey", "o_custkey", "o_totalprice").collect())
    groups: dict[tuple, list[float]] = {}
    for r in rows:
        arm = _bucket(r.o_custkey, "did", 2)
        groups.setdefault((r.c_nationkey, arm), []).append(r.o_totalprice)
    ds = []
    for nation in {n for n, _ in groups}:
        a = groups.get((nation, 1), [])
        b = groups.get((nation, 0), [])
        if len(a) < 2 or len(b) < 2:
            continue
        mt, mc = sum(a) / len(a), sum(b) / len(b)
        vt = sum((v - mt) ** 2 for v in a) / len(a)
        vc = sum((v - mc) ** 2 for v in b) / len(b)
        d = math.floor((mt - mc) * 100 + 0.5) / 100
        vd = math.floor((vt / len(a) + vc / len(b)) * 100 + 0.5) / 100
        ds.append((d, vd))
    k = len(ds)
    pooled = sum(d / v for d, v in ds) / sum(1 / v for _, v in ds)
    se = math.sqrt(1 / sum(1 / v for _, v in ds))
    q = sum((d - pooled) ** 2 / v for d, v in ds)
    i2 = max(0.0, (q - (k - 1)) / q)
    [r] = meta_effect_nations(spark, sf_dir).collect()
    assert r.k == k
    assert abs(r.pooled_effect - pooled) <= 2e-4
    assert abs(r.se_pooled - se) <= 2e-6
    assert abs(r.q_stat - q) <= 2e-4
    assert abs(r.i2 - i2) <= 2e-6
    assert r.verdict == ("HETEROGENEOUS" if i2 > 0.5 else "HOMOGENEOUS")


def test_nb_fit_matches_pure_python(spark, sf_dir):
    from sync_cosmos_db_spark.queries_r9 import nb_fit_user_events

    rows = (spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id").collect())
    per: dict[int, int] = {}
    for r in rows:
        per[r.user_id] = per.get(r.user_id, 0) + 1
    vals = list(per.values())
    n = len(vals)
    m = math.floor(sum(vals) / n * 1e8 + 0.5) / 1e8
    v = math.floor(sum((x - sum(vals) / n) ** 2 for x in vals) / n
                   * 1e8 + 0.5) / 1e8
    [r] = nb_fit_user_events(spark, sf_dir).collect()
    assert r.n_users == n
    assert abs(r.mean_events - m) <= 2e-6
    assert abs(r.var_events - v) <= 2e-6
    assert abs(r.dispersion_index - v / m) <= 2e-6
    if v > m:
        size = m * m / (v - m)
        assert abs(r.nb_size_r - size) <= 2e-6
        assert abs(r.p_zero_nb - (size / (size + m)) ** size) <= 2e-6
        assert r.verdict == "OVERDISPERSED"
    else:
        assert r.nb_size_r is None and r.p_zero_nb is None
