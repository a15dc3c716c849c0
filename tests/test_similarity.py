"""Similarity search tests (X3/X4): brute-force correctness properties +
LSH guarantees on deterministic twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators import similarity as S
from sync_cosmos_db_spark.session import load_table


def _with_twins(spark, sf_dir):
    """Embeddings ∪ scaled copies (×1.01 → cosine exactly 1)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = (emb.filter(F.col("vec_id") % 50 == 0)
             .withColumn("vec_id", F.col("vec_id") + 100000)
             .withColumn("embedding",
                         F.transform("embedding",
                                     lambda x: (x.cast("double") * 1.01)
                                     .cast("float"))))
    return emb.unionByName(twins)


def test_bruteforce_top1_is_scaled_twin(spark, sf_dir):
    corpus = _with_twins(spark, sf_dir)
    queries = corpus.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 100000))
    topk = S.brute_force_topk(corpus, queries, k=1)
    for r in topk.collect():
        assert r.neighbor_id == r.query_id + 100000, (
            f"query {r.query_id}: top-1 should be its scaled twin, "
            f"got {r.neighbor_id}")
        assert abs(r.cosine_sim - 1.0) < 1e-3


def test_lsh_guaranteed_collision_for_twins(spark, sf_dir):
    # a positively-scaled copy has IDENTICAL hyperplane signs → always
    # shares every bucket → must be found as top-1
    corpus = _with_twins(spark, sf_dir)
    queries = corpus.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 100000))
    topk = S.lsh_topk(corpus, queries, dim=64, k=1, n_planes=10, n_tables=4)
    rows = topk.collect()
    assert rows, "LSH returned nothing"
    for r in rows:
        assert r.neighbor_id == r.query_id + 100000


def test_cosine_expression_basics(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])],
        "a array<double>, b array<double>")
    vals = df.select(F.round(S.cosine(F.col("a"), F.col("b")), 6)
                     .alias("c")).collect()
    assert vals[0].c == 0.0
    assert abs(vals[1].c - 1.0) < 1e-9


def test_vectorized_topk_matches_hof_baseline(spark, sf_dir):
    """The numpy/mapInPandas path must return the same neighbor SETS as
    the Column-expression baseline (ranks can differ only on exact-tie
    reordering, which the deterministic tie-break forbids)."""
    from sync_cosmos_db_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )
    from sync_cosmos_db_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    a = {(r.query_id, r.neighbor_id, r.rank)
         for r in brute_force_topk(emb, queries, k=3).collect()}
    b = {(r.query_id, r.neighbor_id, r.rank)
         for r in brute_force_topk_vectorized(emb, queries, k=3).collect()}
    assert a == b


def test_embedding_lsh_dedup_finds_all_twins(spark, sf_dir):
    """Scaled twins (cosine 1.0) share every LSH bucket, so the blocked
    dedup must find every injected twin pair; all found pairs must also
    appear in the exact n-squared result."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    lsh = {(r.id_a, r.id_b)
           for r in q["dedup_embedding_lsh"](spark, sf_dir).collect()}
    exact = {(r.id_a, r.id_b)
             for r in q["dedup_embedding_cosine"](spark, sf_dir).collect()}
    from sync_cosmos_db_spark.session import load_table
    twins = {(r.vec_id, r.vec_id + 100000)
             for r in load_table(spark, sf_dir, "embeddings")
             .filter(F.col("vec_id") % 13 == 0).collect()}
    assert twins <= lsh          # guaranteed-collision duplicates found
    assert lsh <= exact          # no false positives vs exact verify


def test_brute_force_rejects_large_query_set(spark):
    """Round-1 verdict item 4: the documented small-query-set assumption
    of both brute-force paths is enforced — a query set over the cap
    raises with a pointer to lsh_topk instead of collecting to the
    driver."""
    import pytest

    big = spark.range(S.MAX_BRUTE_FORCE_QUERIES + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    small = big.limit(4)
    for fn in (S.brute_force_topk, S.brute_force_topk_vectorized):
        with pytest.raises(ValueError, match="lsh_topk"):
            fn(small, big, k=1)


def test_truncation_recall_rejects_large_query_set(spark):
    """Round-4 verdict item 2: the truncation probe's query set is
    capped like every other brute-force path — an unbounded probe set
    raises instead of broadcasting a corpus-sized side."""
    import pytest

    big = spark.range(S.MAX_BRUTE_FORCE_QUERIES + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    with pytest.raises(ValueError, match="lsh_topk"):
        S.truncation_recall(big.limit(4), big, prefix_dim=1, k=1)


def test_truncation_recall_full_prefix_is_perfect(spark):
    """prefix_dim == full dim ⇒ both rankings identical ⇒ recall 1.0
    for every probe."""
    emb = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 7).cast("double") + 0.1
                  for i in range(4)]).alias("embedding"))
    probes = emb.limit(5)
    out = S.truncation_recall(emb, probes, prefix_dim=4, k=3).collect()
    assert len(out) == 5
    assert all(r.n_kept == 3 and r.recall_at_3 == 1.0 for r in out)


def test_lsh_fullcollide_table_count_invariant(spark, sf_dir):
    """n_planes=0 puts every vector in bucket 0 of EVERY table, so with
    2 tables each candidate pair surfaces twice — the dropDuplicates in
    the candidate stage must collapse them and the top-k must be
    IDENTICAL to the 1-table degenerate run (and both exact)."""
    from pyspark.sql import functions as F

    from sync_cosmos_db_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    one = S.lsh_topk(emb, queries, dim=64, k=3, n_planes=0, n_tables=1)
    two = S.lsh_topk(emb, queries, dim=64, k=3, n_planes=0, n_tables=2)
    assert sorted(map(tuple, one.collect())) == \
        sorted(map(tuple, two.collect()))


def test_embedding_dup_pairs_unblocked_cap_and_edge_cases(spark):
    """Round-12 vectorized rewrite of the unblocked n² verification
    baseline: (a) a corpus over MAX_BRUTE_FORCE_QUERIES raises with a
    pointer to block_col instead of collecting unbounded rows to the
    driver; (b) zero vectors produce no pairs (NaN cosine drops,
    matching the old path's null-division behavior); (c) a hand-built
    corpus yields exactly the expected pairs with _fround4 rounding."""
    import pytest

    from sync_cosmos_db_spark.operators.dedup import embedding_dup_pairs

    big = spark.range(S.MAX_BRUTE_FORCE_QUERIES + 1).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    with pytest.raises(ValueError, match="block_col"):
        embedding_dup_pairs(big, "vec_id", "embedding", threshold=0.9)

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [2.0, 0.0]),      # cosine 1 with id 1
         (3, [0.0, 0.0]),                        # zero vector: no pairs
         (4, [1.0, 1.0]),                        # cos 0.7071 vs 1 and 2
         (5, [-1.0, 0.0])],                      # cos -1 vs 1 and 2
        "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b, r.cosine_sim)
           for r in embedding_dup_pairs(
               corpus, "vec_id", "embedding", threshold=0.7).collect()}
    assert got == {(1, 2, 1.0), (1, 4, 0.7071), (2, 4, 0.7071)}


def test_embedding_dup_pairs_unblocked_empty_and_null_rows(spark):
    """ADVICE r12 medium: the vectorized unblocked path regressed on
    legal inputs — an empty corpus hit np.linalg.norm AxisError and a
    null/empty embedding row made np.asarray ragged (ValueError) both
    driver- and executor-side.  The old join path returned empty /
    dropped those rows via a null cosine; the fixed path must match."""
    from sync_cosmos_db_spark.operators.dedup import embedding_dup_pairs

    schema = "vec_id long, embedding array<double>"
    empty = spark.createDataFrame([], schema)
    out = embedding_dup_pairs(empty, "vec_id", "embedding", threshold=0.9)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == \
        ["id_a", "id_b", "cosine_sim"]

    nullish = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, []), (4, [2.0, 0.0])], schema)
    got = {(r.id_a, r.id_b, r.cosine_sim)
           for r in embedding_dup_pairs(
               nullish, "vec_id", "embedding", threshold=0.9).collect()}
    assert got == {(1, 4, 1.0)}

    only_null = spark.createDataFrame([(1, None), (2, [])], schema)
    assert embedding_dup_pairs(
        only_null, "vec_id", "embedding", threshold=0.9).count() == 0


def test_vectorized_scoring_parallelism_floor(spark, sf_dir):
    """Round-15 regression (the IVF finding generalized): the scoring
    matmul mapInPandas must not inherit a compact corpus's single scan
    split — a 1-partition corpus must widen to a round-robin exchange
    below the scoring stage (floor-only: wide scans are untouched)."""
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", "embedding").coalesce(1))
    out = S.brute_force_topk_vectorized(emb, emb.limit(4), k=2)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "roundrobinpartitioning" in plan
    assert out.count() > 0
