"""Round-11 registrations — bounded twins for the two sf0.1-hostile
oracles, plus the JPEG roundtrip (X5 seam closure).

Round 10 left one open item (SCALING.md): during an optional sf0.1
spot sweep, an oracle among the first ~80 alphabetical names drove
DuckDB to a ~70 GB working set.  ``tools/oracle_probe.py`` (8 GB
memory limit, 150 s timeout, one subprocess per oracle) bisected the
batch and found TWO offenders, both effectively quadratic replays
that had not been flagged as such:

* ``canonical_doc_election`` — all-pairs shingle-LIST Jaccard join
  blocked only by ``lang`` (~5.5k docs at sf0.1 → millions of pairs,
  each materializing two shingle lists);
* ``curation_pipeline_stats`` — token-inverted-index self-join where
  a stopword shared by all ~5.5k survivors fans out to n²/2 pairs
  per token before the GROUP BY.

Both stay registered (their oracles are fine at the driver's sf0.01)
and are now listed in ``tools/oracle_probe.py::QUADRATIC``; the
``*_sampled`` twins below check the SAME stage-composition invariants
on a deterministically sampled sub-corpus whose oracle cost stays
bounded at ANY scale factor (measured: 24.5 s / 17.3 s at sf0.1 under
the 8 GB cap, vs >150 s timeout for the originals), so sf0.1 spot
sweeps run the twins and skip the originals.

Sampling keeps the planted duplicate structure intact because every
planted id offset is divisible by the sampling modulus: canonical's
near-copies live at ``doc_id + 200000`` (200000 % 5 = 0), curation's
copies at ``+200000`` / ``+100000`` (both ≡ 0 mod 10) — so a sampled
base doc keeps exactly its planted twins and an unsampled one drops
them, on both engines, by the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sync_cosmos_db_spark.cache_scope import scoped_local_checkpoint
from sync_cosmos_db_spark.queries import query
from sync_cosmos_db_spark.session import load_table


def _label_rounds(k: int) -> str:
    """Unrolled min-label-propagation CTE chain ``l0..l{k}`` over a
    MATERIALIZED ``edges(a, b)`` relation, plus a convergence gate.

    Round-12 verdict item 4 (the X27 trick): the twins' oracles
    replayed connected components as an OPEN-ENDED ``WITH RECURSIVE``
    transitive closure, and DuckDB re-evaluates the un-materialized
    upstream CTE chain (the expensive pair join) on every recursion
    round — measured 25.4 s / 15.5 s per oracle at sf0.1, dominating
    the sweep tail.  The unrolled form is ``k`` fixed join+group-by
    rounds of ``lbl(v) ← min(lbl(v), min over neighbours)`` — the
    same bounded iteration the Spark side's ``connected_components``
    runs — each round MATERIALIZED so nothing upstream re-executes
    (0.11 s / 0.59 s at sf0.1, identical rows at sf0.01 and sf0.1).

    ``conv`` value-checks the fixed depth: if round ``k-1`` → ``k``
    still moved a label (component diameter > k for this corpus),
    ``comp`` collapses to EMPTY and the driver's hash compare fails
    honestly — never a silently-truncated closure."""
    out = ["    l0 AS MATERIALIZED (SELECT node, node AS lbl FROM nodes)"]
    for i in range(1, k + 1):
        out.append(f"""    l{i} AS MATERIALIZED (
      SELECT n.node, least(n.lbl, coalesce(min(p.lbl), n.lbl)) AS lbl
      FROM l{i - 1} n LEFT JOIN edges e ON e.a = n.node
                    LEFT JOIN l{i - 1} p ON p.node = e.b
      GROUP BY n.node, n.lbl)""")
    out.append(f"""    conv AS (SELECT count(*) AS moved
              FROM l{k - 1} x JOIN l{k} y USING (node)
              WHERE x.lbl <> y.lbl)""")
    out.append(f"""    comp AS (SELECT node, lbl AS component FROM l{k}
             WHERE (SELECT moved FROM conv) = 0)""")
    return ",\n".join(out)


# ---------------------------------------------------------------------------
# Bounded twin 1: canonical election on a 1-in-5 sub-corpus
# ---------------------------------------------------------------------------


@query(
    "canonical_doc_election_sampled",
    """
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text || ' zz yy' AS text, lang
      FROM documents WHERE doc_id % 11 = 0 AND doc_id % 5 = 0
    ),
    sh AS MATERIALIZED (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
            FROM corpus)
    ),
    -- r13: exact Jaccard via the gram-inverted index (count matching
    -- DISTINCT grams per pair, sizes ride along) instead of
    -- list_intersect over all lang-blocked pairs: same 95 pairs at
    -- sf0.1, 8.2 s -> 0.1 s, and the same gram-keyed bound the Spark
    -- side's jaccard_pairs uses.
    ex AS MATERIALIZED (
      SELECT doc_id, lang, len(shingles) AS sz, unnest(shingles) AS g
      FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i,
             any_value(a.sz) AS sa, any_value(b.sz) AS sb
      FROM ex a JOIN ex b
        ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b FROM inter
      WHERE i::DOUBLE / (sa + sb - i) >= 0.5),
    edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
"""
    + _label_rounds(4)
    + """,
    q AS (SELECT comp.component, comp.node,
                 length(corpus.text)::BIGINT AS ql
          FROM comp JOIN corpus ON corpus.doc_id = comp.node)
    SELECT component, count(*)::BIGINT AS n_members,
           max(ql) AS best_quality,
           min(node) FILTER (WHERE ql = best) AS canonical_id
    FROM (SELECT component, node, ql,
                 max(ql) OVER (PARTITION BY component) AS best
          FROM q) t
    GROUP BY component
    """,
)
def canonical_doc_election_sampled(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Bounded twin of ``canonical_doc_election`` (see module
    docstring): the identical election invariant — exact Jaccard
    pairs → connected components → longest-member-lowest-id election
    — on the ``doc_id % 5 = 0`` sub-corpus, whose all-pairs ORACLE
    replay stays tractable at any SF.  The Spark side is the same
    blocked ``jaccard_pairs`` + ``elect_canonical`` pipeline."""
    from sync_cosmos_db_spark.operators.dedup import (
        elect_canonical, jaccard_pairs,
    )
    from sync_cosmos_db_spark.queries_llm import _corpus_with_near_dups

    corpus = scoped_local_checkpoint(
        _corpus_with_near_dups(spark, sf_dir)
        .where(F.col("doc_id") % 5 == 0)
        .withColumn("__quality", F.length("text")))
    # Checkpoint the pair frame (r13 sweep finding, 15.3 s spark side):
    # the election's CC loop and the sweep's second driver-style run
    # otherwise re-execute the all-pairs Jaccard join — the twin's
    # dominant stage — once per consumer.  The checkpointed frame is
    # ~10² rows; the unsampled operator is untouched.
    pairs = scoped_local_checkpoint(
        jaccard_pairs(corpus, id_col="doc_id", text_col="text",
                      threshold=0.5, n=3, block_col="lang"))
    out = elect_canonical(pairs.select("id_a", "id_b"), corpus,
                          id_col="doc_id", quality_col="__quality")
    return out.select("component", "n_members", "best_quality",
                      "canonical_id")


# ---------------------------------------------------------------------------
# Bounded twin 2: curation pipeline composition on a 1-in-10 sub-corpus
# ---------------------------------------------------------------------------


@query(
    "curation_pipeline_stats_sampled",
    """
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 100000, text || ' extra' FROM documents
      WHERE doc_id % 7 = 0 AND doc_id % 10 = 0),
    hashed AS MATERIALIZED (
      SELECT doc_id, text, sha256(text) AS dg FROM corpus),
    keepers AS (SELECT min(doc_id) AS doc_id, dg
                FROM hashed GROUP BY dg),
    survivors AS MATERIALIZED (
      SELECT k.doc_id, h.text
      FROM keepers k JOIN hashed h ON h.doc_id = k.doc_id),
    toks AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
             AS tok FROM survivors),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM toks a JOIN toks b USING (tok)
              WHERE a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5),
    edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
"""
    # 8 rounds: the sf0.1 pair graph (one 563-node quasi-clique)
    # converges in 5; the conv gate empties comp if 8 ever stops
    # sufficing, failing the hash compare honestly.
    + _label_rounds(8)
    + """,
    cluster_keep AS (SELECT min(node) AS kept FROM comp
                     GROUP BY component),
    final AS (
      SELECT doc_id FROM survivors
      WHERE doc_id NOT IN (SELECT node FROM comp)
      UNION ALL SELECT kept FROM cluster_keep)
    SELECT (SELECT count(*) FROM corpus)::BIGINT AS n_raw,
           (SELECT count(*) FROM survivors)::BIGINT AS n_after_exact,
           (SELECT count(*) FROM comp)::BIGINT AS n_in_near_clusters,
           (SELECT count(*) FROM cluster_keep)::BIGINT AS n_clusters,
           (SELECT count(*) FROM final)::BIGINT AS n_final,
           (SELECT sum(doc_id) FROM final)::BIGINT AS final_id_sum
    """,
)
def curation_pipeline_stats_sampled(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Bounded twin of ``curation_pipeline_stats`` (see module
    docstring): the same four-stage composition — exact dedup →
    unigram-Jaccard pairs → connected components → canonical keep —
    on the ``doc_id % 10 = 0`` sub-corpus, so the oracle's
    token-inverted-index pair join stays bounded at any SF.  Shares
    ``_planted_dup_corpus`` / ``_curation_pipeline_agg`` with the full
    query (round 16): one explode pass builds the corpus, one cached
    materialization feeds all stage-1 consumers
    (tests/test_single_pass.py pins the contract).  ``exact_mod=1``:
    every sampled doc gets an exact copy, matching the oracle's
    unconditional second branch."""
    from sync_cosmos_db_spark.queries_scale import (
        _curation_pipeline_agg, _planted_dup_corpus)

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .where(F.col("doc_id") % 10 == 0))
    return _curation_pipeline_agg(
        _planted_dup_corpus(docs, exact_mod=1, near_mod=7))


# ---------------------------------------------------------------------------
# Bounded twin 3: LSH⊆exact containment on a 1-in-5 sub-corpus
# ---------------------------------------------------------------------------
# Found by the round-11 sf0.1 full sweep (tools/sf01_sweep.py), not the
# first-85 probe: dedup_lsh_containment's oracle replays the SAME
# lang-blocked all-pairs shingle Jaccard as canonical_doc_election and
# times out identically at sf0.1.  Same treatment: original stays
# (fine at sf0.01, listed QUADRATIC), twin keeps the containment
# invariant checkable at any SF.


@query(
    "dedup_lsh_containment_sampled",
    """
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text || ' zz yy' AS text, lang
      FROM documents WHERE doc_id % 11 = 0 AND doc_id % 5 = 0
    ),
    sh AS (
      SELECT doc_id, lang,
             list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM corpus)
    )
    SELECT 0 AS n_violations, count(*) AS n_exact_pairs
    FROM sh a JOIN sh b
      ON a.doc_id < b.doc_id AND a.lang = b.lang
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5
    """,
)
def dedup_lsh_containment_sampled(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Bounded twin of ``dedup_lsh_containment``: LSH pairs ⊆ exact
    Jaccard pairs (violations must be 0) with the exact-pair count
    recomputed independently by DuckDB, on the ``doc_id % 5 = 0``
    sub-corpus (near-dup plant offset 200000 ≡ 0 mod 5, so sampling
    preserves each kept doc's planted twin)."""
    from sync_cosmos_db_spark.operators import dedup as D
    from sync_cosmos_db_spark.queries_llm import _corpus_with_near_dups

    corpus = (_corpus_with_near_dups(spark, sf_dir)
              .where(F.col("doc_id") % 5 == 0))
    langs = corpus.select(F.col("doc_id"), F.col("lang"))
    lsh = D.minhash_lsh_pairs(corpus, id_col="doc_id", text_col="text",
                              shingle_n=3, num_hashes=64, bands=16,
                              threshold=0.5)
    lsh_within = (
        lsh.select("id_a", "id_b")
        .join(langs.select(F.col("doc_id").alias("id_a"),
                           F.col("lang").alias("__la")), "id_a")
        .join(langs.select(F.col("doc_id").alias("id_b"),
                           F.col("lang").alias("__lb")), "id_b")
        .filter(F.col("__la") == F.col("__lb"))
        .select("id_a", "id_b")
        .withColumn("__l", F.lit(1))
    )
    exact = (
        D.jaccard_pairs(corpus, id_col="doc_id", text_col="text",
                        threshold=0.5, n=3, block_col="lang")
        .select("id_a", "id_b")
        .withColumn("__e", F.lit(1))
    )
    j = lsh_within.join(exact, ["id_a", "id_b"], "full_outer")
    return j.agg(
        F.sum(F.when(F.col("__l").isNotNull() & F.col("__e").isNull(), 1)
              .otherwise(0)).cast("long").alias("n_violations"),
        F.sum(F.when(F.col("__e").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_exact_pairs"))


# ---------------------------------------------------------------------------
# X5 seam closure: baseline JPEG encode→decode roundtrip
# ---------------------------------------------------------------------------


@query(
    "multimodal_jpeg_roundtrip",
    """
    WITH p AS (
      SELECT doc_id AS asset_id,
             sha256(doc_id::VARCHAR || ':' || text) AS h
      FROM documents
    ), q AS (
      SELECT asset_id,
             4 + (translate(substr(h,1,3),'abcdef','012345')::INT % 29)
               AS width,
             4 + (translate(substr(h,4,3),'abcdef','012345')::INT % 29)
               AS height,
             translate(substr(h,7,3),'abcdef','012345')::INT % 256 AS v
      FROM p
    )
    SELECT asset_id, width, height, 1 AS n_components,
           least(255.0, greatest(0.0,
             128 + 2 * floor((v - 128) / 2.0 + 0.5))) AS mean_px,
           true AS decode_ok
    FROM q
    """,
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 with the THIRD real codec (round-10 verdict item 5 — the
    baseline JPEG decoder in ``operators/jpeg.py`` closes the last X5
    capability seam): per document, derive (width, height, gray) from
    a sha2 hash, ENCODE a real baseline JFIF JPEG at quality 50
    (Annex K tables, Huffman entropy coding), then DECODE it (marker
    walk, Huffman, dequantize, IDCT) and report the decoded metadata
    and mean pixel.

    JPEG is lossy, but for solid tiles the loss has a CLOSED FORM the
    oracle recomputes: every 8×8 block is constant, so only the DC
    coefficient survives — quantized by the Annex K luminance DC step
    16 (quality 50 keeps table values unscaled), the decoded value is
    exactly ``clamp(128 + 2·floor((v−128)/2 + 0.5))``.  The hash check
    therefore proves the full entropy-coded roundtrip bit-exactly,
    same as the PNG/WAV twins — not merely "close enough".  The AC /
    gradient / chroma / 4:2:0 / restart-marker paths are pinned by
    ``tests/test_jpeg.py`` (golden bytes + PSNR bounds)."""
    from sync_cosmos_db_spark.operators import jpeg as J
    from sync_cosmos_db_spark.queries_llm import _asset_hash, _hash_digits

    docs = load_table(spark, sf_dir, "documents")
    h = _asset_hash(docs)
    params = docs.select(
        F.col("doc_id").alias("asset_id"),
        (F.lit(4) + F.pmod(_hash_digits(h, 1, 3), F.lit(29))).alias("width"),
        (F.lit(4) + F.pmod(_hash_digits(h, 4, 3), F.lit(29))).alias("height"),
        F.pmod(_hash_digits(h, 7, 3), F.lit(256)).alias("gray"),
    )
    dec = J.decode_jpeg_assets(J.synth_jpeg_assets(params, quality=50))
    return dec.select("asset_id", "width", "height", "n_components",
                      "mean_px", "decode_ok")
