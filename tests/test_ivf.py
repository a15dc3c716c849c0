"""IVF ANN (operators/ivf.py): training determinism, assignment
invariants, planted-twin guarantees, and full-probe == exact parity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators import ivf as IVF
from sync_cosmos_db_spark.operators import similarity as S
from sync_cosmos_db_spark.session import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _with_twins(spark, sf_dir):
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    twins = (emb.filter(F.col("vec_id") % 50 == 0)
             .select((F.col("vec_id") + 100000).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: (x * 1.05).cast("float"))
                     .alias("embedding")))
    return emb.unionByName(twins)


def test_train_centroids_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a = IVF.train_centroids(emb, dim=64, n_clusters=8, iters=2)
    b = IVF.train_centroids(emb, dim=64, n_clusters=8, iters=2)
    assert np.array_equal(a, b), "training must be run-reproducible"
    # spherical: every centroid unit-norm
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_assign_clusters_invariants(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = IVF.train_centroids(emb, dim=64, n_clusters=8, iters=2)
    tagged = IVF.assign_clusters(emb, cents)
    n_in = emb.count()
    stats = tagged.agg(
        F.count("*").alias("n"),
        F.countDistinct("vec_id").alias("ids"),
        F.min("cluster_id").alias("lo"),
        F.max("cluster_id").alias("hi")).collect()[0]
    assert stats.n == n_in and stats.ids == n_in  # each vector exactly once
    assert 0 <= stats.lo and stats.hi < 8


def test_ivf_twin_found_at_nprobe_1(spark, sf_dir):
    # a positively-scaled copy normalizes to the SAME unit vector →
    # identical cluster assignment → its cluster is the query's #1
    # probe → must be found even at nprobe=1
    corpus = _with_twins(spark, sf_dir)
    queries = corpus.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 100000))
    topk = IVF.ivf_topk(corpus, queries, dim=64, k=1, n_clusters=8,
                        nprobe=1, iters=2)
    rows = topk.collect()
    assert rows, "IVF returned nothing"
    for r in rows:
        assert r.neighbor_id == r.query_id + 100000


def test_fullprobe_matches_exact_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    ivf = IVF.ivf_topk(emb, queries, dim=64, k=3, n_clusters=8,
                       nprobe=8, iters=2)
    exact = S.brute_force_topk_vectorized(emb, queries, k=3)
    a = sorted(map(tuple, ivf.collect()))
    b = sorted(map(tuple, exact.collect()))
    assert a == b, "nprobe == n_clusters must equal exact brute force"


def test_partial_probe_candidates_subset(spark, sf_dir):
    """nprobe < n_clusters returns a SUBSET of pairs scored identically:
    every (query, neighbor, sim) it emits must appear in the full-probe
    scored set with the same similarity (ranks may compress)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    part = IVF.ivf_topk(emb, queries, dim=64, k=3, n_clusters=8,
                        nprobe=2, iters=2)
    exact = S.brute_force_topk_vectorized(emb, queries, k=500)
    exact_sims = {(r.query_id, r.neighbor_id): r.cosine_sim
                  for r in exact.collect()}
    for r in part.collect():
        key = (r.query_id, r.neighbor_id)
        assert key in exact_sims
        assert abs(exact_sims[key] - r.cosine_sim) < 1e-9

def test_train_centroids_single_source_scan(spark, tmp_path):
    """Round-3 verdict item 5: the normalized projection is persisted
    across Lloyd iterations — N-iteration training reads the source
    exactly once, and no cache lingers afterwards."""
    import numpy as np

    from sync_cosmos_db_spark.operators.ivf import train_centroids

    marker = str(tmp_path / "scans.txt")
    n, dim = 240, 4
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17).cast("double") + 0.5
                  for i in range(dim)]).alias("embedding"))

    def tap(batches):
        for pdf in batches:
            with open(marker, "a") as f:
                f.write(f"{len(pdf)}\n")
            yield pdf

    corpus = base.mapInPandas(
        tap, "vec_id long, embedding array<double>")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    cents = train_centroids(corpus, dim, n_clusters=4, iters=3)
    assert cents.shape == (4, dim)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    with open(marker) as f:
        scanned = sum(int(x) for x in f.read().split())
    assert scanned == n, f"source scanned {scanned/n:.1f}x, want exactly 1x"
    assert jsc.getPersistentRDDs().size() == before  # nothing lingers


def test_index_roundtrip_matches_in_place(spark, sf_dir, tmp_path):
    """save → load → probe must equal the train-in-place path at BOTH
    full and partial probe; assignments land hive-partitioned."""
    import os

    from sync_cosmos_db_spark.operators import ivf as IVF

    from sync_cosmos_db_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    cents = IVF.train_centroids(emb, dim=64, n_clusters=8, iters=3)
    path = str(tmp_path / "ivf")
    IVF.save_index(emb, cents, path)

    # identical centroids reload (order pinned by cluster_id)
    C2, assignments = IVF.load_index(spark, path)
    import numpy as np
    assert np.array_equal(C2, cents)
    # hive layout: one directory per cluster
    parts = [d for d in os.listdir(f"{path}/assignments")
             if d.startswith("cluster_id=")]
    assert len(parts) == 8

    for nprobe in (8, 2):
        direct = IVF._probe_score_rank(
            IVF.assign_clusters(emb, cents)
            .withColumnRenamed("vec_id", "neighbor_id")
            .withColumnRenamed("embedding", "__cvec"),
            queries, cents, 3, nprobe, "vec_id", "embedding", "query_id")
        served = IVF.ivf_topk_from_index(spark, path, queries,
                                         k=3, nprobe=nprobe)
        a = sorted(map(tuple, direct.collect()))
        b = sorted(map(tuple, served.collect()))
        assert a == b, f"nprobe={nprobe}"


def test_scoring_parallelism_floor_on_compact_corpus(spark, sf_dir):
    """Round-15 regression: the candidate-scoring mapInPandas must not
    inherit a compact corpus's 1-2 scan splits.  Probes are broadcast,
    so before the spread() floor the einsum scoring of EVERY candidate
    pair ran at the corpus scan's parallelism — measured at the sf2.5
    octave: 176 s single-lane vs 49 s for the same logical work served
    from the 8-way hive-partitioned index.  A 1-partition corpus must
    produce a round-robin exchange below the scoring stage (floor
    semantics: a corpus already at defaultParallelism is untouched)."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding").coalesce(1)
    queries = emb.limit(5)
    out = IVF.ivf_topk(emb, queries, dim=64, k=2, n_clusters=2,
                       nprobe=2, iters=2)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "roundrobinpartitioning" in plan, (
        "1-split corpus reached the scoring join unspread — candidate "
        "scoring would run on one core regardless of cluster size")
    assert out.count() > 0
