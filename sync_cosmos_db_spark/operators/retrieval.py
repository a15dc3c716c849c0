"""Keyword retrieval over the document corpus: inverted index + BM25.

The reference has no text-retrieval surface (its queries are key
lookups and full scans, ``/root/reference/src/cosmos_reader.py``); this
is an extension operator for the corpus-curation posture — keyword
search over a 100 TB corpus is the classic MapReduce workload and has
an exact, fully relational Spark expression: one token explode feeding
term-keyed aggregations.  No UDFs anywhere.

Scale shape:

* ``build_inverted_index`` — explode → groupBy(term): map-side partial
  aggregation, one term-keyed shuffle.  Postings are kept as counts +
  per-term document frequency; materializing full posting *lists* is a
  ``sort_array(collect_list(...))`` away but is deliberately a separate
  opt-in (a hot term's list is unbounded — the count form is always
  safe).
* ``bm25_topk`` — query terms are a tiny inline table broadcast into
  the tf join; corpus stats (N, avgdl) are a 1-row aggregate joined
  back on a column-derived constant equi-key (BroadcastHashJoin, never
  a nested-loop join — same trick as the unigram LM operator).  The
  final top-k is a global sort of per-doc scores LIMIT k — k is small,
  Spark runs it as TakeOrderedAndProject (per-partition heaps, no full
  sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sync_cosmos_db_spark.cache_scope import scoped_persist


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col),
                     F.explode(F.split(F.col(text_col), r"\s+"))
                     .alias("term"))


def build_inverted_index(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Term statistics table: ``(term, df, tf_total)`` — document
    frequency and corpus-wide term frequency.  One explode, one
    term-keyed shuffle with map-side partials."""
    toks = _tokens(df, id_col, text_col)
    return (toks.groupBy("term")
            .agg(F.count_distinct(F.col(id_col)).cast("long").alias("df"),
                 F.count("*").cast("long").alias("tf_total")))


def posting_lists(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_postings: int = 10_000) -> DataFrame:
    """Materialized posting lists ``(term, postings: array<struct<doc_id,
    tf>>)``, each list sorted by doc_id and capped at ``max_postings``
    entries (stop-word-grade terms keep their first ``max_postings``
    postings by doc id; the cap is applied with ``slice`` AFTER an
    in-group sort so the kept prefix is deterministic)."""
    toks = _tokens(df, id_col, text_col)
    tf = toks.groupBy("term", id_col).agg(
        F.count("*").cast("long").alias("tf"))
    return (tf.groupBy("term")
            .agg(F.slice(
                F.sort_array(F.collect_list(F.struct(F.col(id_col), "tf"))),
                1, max_postings).alias("postings")))


def bm25_topk(
    spark: SparkSession,
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` documents for a bag of query terms under BM25.

    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   (the Lucene form —
    always positive, so stop-word-grade terms dilute rather than flip
    rankings); score(d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    Scores are rounded to ``round_digits`` BEFORE ranking so the
    ordering is reproducible across engines and runs (float ulp noise
    cannot flip ranks); ties break on ascending doc id.
    """
    terms = spark.createDataFrame([(t,) for t in query_terms],
                                  "term string").distinct()
    toks = _tokens(df, id_col, text_col)
    dl = df.select(F.col(id_col),
                   F.size(F.split(F.col(text_col), r"\s+"))
                   .cast("double").alias("dl"))

    tf = (toks.join(F.broadcast(terms), "term")
          .groupBy(id_col, "term")
          .agg(F.count("*").cast("double").alias("tf")))
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df_t"))
    stats = (dl.agg(F.count("*").cast("double").alias("n_docs"),
                    F.avg("dl").alias("avgdl"))
             .withColumn("__k", F.floor(F.col("n_docs") * 0)))

    idf = F.log((F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / norm

    p = 10 ** round_digits
    scored = (tf.join(dl, id_col)
              .withColumn("__k", F.floor(F.col("tf") * 0))
              .join(F.broadcast(stats), "__k")
              .join(F.broadcast(dfreq), "term")
              .groupBy(id_col)
              .agg((F.floor(F.sum(contrib) * p + F.lit(0.5)) / p)
                   .alias("score")))
    return (scored
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def tfidf_related(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_df: int = 500,
                  top_n: int = 1, round_digits: int = 6) -> DataFrame:
    """Most-similar document per document under L2-normalized TF-IDF
    cosine — "related articles" over the corpus, fully relational.

    weight(d,t) = tf(d,t) · ln(N / df(t)), L2-normalized per doc;
    cos(a,b) = Σ_t ŵ(a,t)·ŵ(b,t) accumulated by a self-join of the
    inverted index on ``term``.

    Scale shape: the self-join is term-keyed, so its cost is
    Σ_t df(t)² — bounded by dropping terms with ``df(t) > max_df``
    (stop-word-grade terms contribute near-zero idf weight but
    quadratic pairs; the cap is the same posting-list guard as
    ``posting_lists``).  Cosines are pre-rounded before ranking so
    float summation order can't flip ranks; ties break on the smaller
    partner id.  One explode, three term/doc-keyed shuffles, no UDFs
    and no n² driver work.
    """
    from pyspark.sql import Window as W

    toks = _tokens(df, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf"))
    n_docs = df.count()  # one scalar; scan is count-only (pruned)
    dfreq = (tf.groupBy("term")
             .agg(F.count("*").cast("double").alias("df_t"))
             .where(F.col("df_t") <= max_df))
    w = tf.join(dfreq, "term").withColumn(
        "w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")))
    norm = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    unit = (w.join(norm, id_col)
            .select(id_col, "term", (F.col("w") / F.col("nrm")).alias("u")))

    a = unit.select(F.col(id_col).alias("a"), "term", F.col("u").alias("ua"))
    b = unit.select(F.col(id_col).alias("b"), "term", F.col("u").alias("ub"))
    p = 10 ** round_digits
    pairs = (a.join(b, "term")
             .where(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg((F.floor(F.sum(F.col("ua") * F.col("ub")) * p
                           + F.lit(0.5)) / p).alias("cosine")))
    both = pairs.union(pairs.select(F.col("b").alias("a"),
                                    F.col("a").alias("b"), "cosine"))
    rk = W.partitionBy("a").orderBy(F.desc("cosine"), F.asc("b"))
    return (both.withColumn("rk", F.row_number().over(rk))
            .where(F.col("rk") <= top_n)
            .select(F.col("a").alias(id_col),
                    F.col("b").alias("related_id"), "cosine",
                    F.col("rk").cast("long").alias("rk")))


def rrf_fuse(
    lists: list[DataFrame],
    group_cols: list[str],
    item_col: str,
    rank_col: str = "rank",
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists:
    ``score(item) = Σ_lists 1/(k + rank)`` — the standard hybrid
    retrieval combiner (BM25 ⊕ dense ANN ⊕ anything), score-free by
    design so incomparable scoring scales fuse cleanly.

    Each input carries ``group_cols`` (e.g. the query id), ``item_col``
    and a 1-based ``rank_col``.  Returns one row per (group, item):
    ``(…group, item, n_lists, rrf_score, fused_rank)``, score
    floor-rounded to 6 decimals BEFORE ranking (ties → item ASC) so
    the DuckDB oracle ranks identically.

    Scale shape: one union (no shuffle), one (group, item)-keyed
    aggregate, one per-group rank window — and because RRF only needs
    the RANKS, the inputs are top-k lists (thousands of rows per
    query), never the full corpora being fused.
    """
    if not lists:
        raise ValueError("rrf_fuse: need at least one ranked list")
    cols = [*group_cols, item_col, rank_col]
    u = lists[0].select(*cols)
    for nxt in lists[1:]:
        u = u.unionByName(nxt.select(*cols))
    contrib = F.lit(1.0) / (F.lit(k) + F.col(rank_col))
    scores = (u.groupBy(*group_cols, item_col)
              .agg(F.count("*").cast("long").alias("n_lists"),
                   (F.floor(F.sum(contrib) * 1e6 + F.lit(0.5)) / 1e6)
                   .alias("rrf_score")))
    w = (W.partitionBy(*group_cols)
         .orderBy(F.col("rrf_score").desc(), F.col(item_col).asc()))
    out = scores.withColumn("fused_rank",
                            F.row_number().over(w).cast("long"))
    if top_n is not None:
        out = out.filter(F.col("fused_rank") <= top_n)
    return out


def phrase_search(df: DataFrame, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """X75 — exact phrase search via a positional inverted index: a doc
    matches where tokens of ``phrase`` occur at consecutive positions.

    The classic positional-index intersection, expressed relationally:
    the (doc, pos, token) explode is filtered to the phrase's k terms
    (so the shuffle carries only candidate postings, not the corpus),
    each term's postings are aligned to the phrase start
    (``pos − offset``) and k-way INNER-joined on (doc, start) — all
    equi-joins on (doc, aligned-position) keys. Degenerate phrases
    with a repeated term still work: each occurrence feeds every
    offset it can satisfy.

    Returns (id, n_matches, first_pos) per matching doc (1-based
    token positions)."""
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase_search: empty phrase")
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+"))
        .alias("pos0", "token"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "token")
    out = None
    for off, term in enumerate(terms):
        side = (toks.filter(F.col("token") == term)
                .select(F.col(id_col),
                        (F.col("pos") - off).alias("start")))
        out = side if out is None else out.join(side, [id_col, "start"])
    return (out.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_matches"),
                 F.min("start").cast("long").alias("first_pos")))


def tfidf_top_terms(df, id_col: str, text_col: str, top_k: int = 3,
                    round_digits: int = 6):
    """X150 — top-k TF-IDF keywords per document: score(t, d) =
    tf(t, d) · ln(N / df(t)), ranked per doc — the cheap extractive
    keyword / tag generator, and the per-document complement of the
    corpus-level related-docs TF-IDF (X38).

    One (doc, token) count, a token-keyed df join, a 1-row N
    broadcast, ONE doc-keyed top-k window (WindowGroupLimit ships
    only k rows per doc past the sort).  Scores are floor-rounded
    BEFORE ranking with (score desc, token asc) tie-break so the
    ranking is engine-deterministic.  Returns
    ``(doc, rank, token, score)``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    p = 10 ** round_digits
    tok = (df.select(F.col(id_col).alias("doc"),
                     F.explode(F.split(F.col(text_col), r"\s+"))
                     .alias("token"))
           .groupBy("doc", "token")
           .agg(F.count("*").cast("double").alias("tf")))
    # scope-registered: the returned plan reads tok three ways (df
    # counts, corpus N, the score join); caller releases via
    # cache_scope.release_persisted()
    tok = scoped_persist(tok)
    dfreq = (tok.groupBy("token")
             .agg(F.countDistinct("doc").cast("double").alias("df")))
    n = tok.agg(F.countDistinct("doc").cast("double").alias("n"))
    score = (F.floor(F.col("tf") * F.log(F.col("n") / F.col("df")) * p
                     + F.lit(0.5)) / p)
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(),
                                          F.col("token"))
    return (tok.join(dfreq, "token")
            .crossJoin(F.broadcast(n))
            .withColumn("score", score)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("doc", F.col("rank").cast("long").alias("rank"),
                    "token", "score"))


def ndcg_mrr(df, group_col: str, score_col: str, rel_col, id_col: str,
             k: int = 10, round_digits: int = 6):
    """X182 — NDCG@k + MRR per ranked group: rank items within each
    group by (score desc, id asc), DCG@k with the standard
    1/log2(rank+1) discount, ideal DCG from the relevance-sorted
    order, and reciprocal rank of the first relevant item — the
    ranking-eval pair every retrieval stack reports (the X? BM25 /
    RRF operators produce rankings; this grades them).

    Two per-group rank windows SHARING one shuffle (score order and
    ideal order), then one group aggregate.  Groups with zero
    relevant items get ndcg = 0 and rr = 0 (not a divide-by-zero).
    Returns ``(group, n_items, n_rel, ndcg_k, rr)``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    r = F.col(rel_col).cast("double") if isinstance(rel_col, str) \
        else rel_col.cast("double")
    d = df.select(F.col(group_col).alias("g"),
                  F.col(score_col).alias("s"), r.alias("r"),
                  F.col(id_col).alias("i"))
    w = Window.partitionBy("g").orderBy(F.col("s").desc(), F.col("i"))
    wi = Window.partitionBy("g").orderBy(F.col("r").desc(), F.col("i"))
    ranked = (d.withColumn("rn", F.row_number().over(w))
              .withColumn("ri", F.row_number().over(wi)))
    disc = lambda c: F.col("r") / F.log2(c + 1)  # noqa: E731
    dcg = F.sum(F.when(F.col("rn") <= k, disc(F.col("rn")))
                .otherwise(0.0))
    idcg = F.sum(F.when(F.col("ri") <= k, disc(F.col("ri")))
                 .otherwise(0.0))
    first_rel = F.min(F.when(F.col("r") > 0, F.col("rn")))
    agg = (ranked.groupBy(F.col("g").alias(group_col))
           .agg(F.count("*").cast("long").alias("n_items"),
                F.sum((F.col("r") > 0).cast("long")).alias("n_rel"),
                dcg.alias("__dcg"), idcg.alias("__idcg"),
                first_rel.alias("__fr")))
    ndcg = F.when(F.col("__idcg") > 0,
                  F.col("__dcg") / F.col("__idcg")).otherwise(0.0)
    rr = F.coalesce(1.0 / F.col("__fr"), F.lit(0.0))
    return agg.select(group_col, "n_items",
                      F.col("n_rel").cast("long").alias("n_rel"),
                      fr(ndcg).alias("ndcg_k"), fr(rr).alias("rr"))


def average_precision(df, group_col: str, score_col: str, rel_col,
                      id_col: str, round_digits: int = 6):
    """X183 — average precision (the area under the PR curve at the
    observed operating points) per ranked group:
    AP = mean over relevant items of precision@(its rank), rank by
    (score desc, id asc) — the order-sensitive companion of ROC-AUC
    (X179): AUC is prevalence-blind, AP collapses when positives are
    rare, which is exactly the retrieval regime.

    One per-group rank window + a cumulative positives window ON THE
    SAME SORT (one shuffle total), then a group aggregate.  Groups
    with zero relevant items report ap = 0.  Returns
    ``(group, n_items, n_rel, ap)``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    p = 10 ** round_digits
    fr = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    r = F.col(rel_col).cast("long") if isinstance(rel_col, str) \
        else rel_col.cast("long")
    d = df.select(F.col(group_col).alias("g"),
                  F.col(score_col).alias("s"), r.alias("r"),
                  F.col(id_col).alias("i"))
    w = Window.partitionBy("g").orderBy(F.col("s").desc(), F.col("i"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (d.withColumn("rn", F.row_number().over(w))
              .withColumn("cp", F.sum("r").over(cum)))
    prec_at_rel = F.sum(F.when(F.col("r") > 0,
                               F.col("cp") / F.col("rn")))
    agg = (ranked.groupBy(F.col("g").alias(group_col))
           .agg(F.count("*").cast("long").alias("n_items"),
                F.sum("r").cast("long").alias("n_rel"),
                prec_at_rel.alias("__psum")))
    ap = F.when(F.col("n_rel") > 0,
                F.col("__psum") / F.col("n_rel")).otherwise(0.0)
    return agg.select(group_col, "n_items", "n_rel",
                      fr(ap).alias("ap"))


def trigram_like_search(df, id_col: str, text_col: str,
                        pattern: str, group_col: str | None = None):
    """X221 — substring (LIKE '%pat%') search through a TRIGRAM
    index: documents are candidates only if they contain EVERY
    character trigram of the pattern, and candidates are then
    verified with the exact ``contains`` — the pg_trgm trick that
    turns an unindexable full-scan predicate into a posting-list
    intersection (at 100 TB the posting join prunes the scan; the
    verify touches candidates only).  The audit output reports both
    counts so the index's selectivity is visible — a candidate set
    barely smaller than the corpus means the pattern's trigrams are
    too common to prune.

    Scale shape: the doc→trigram projection is one in-row
    explode + distinct keyed on (trigram); the pattern's trigrams
    are a handful of literals, so the candidate join is a narrow
    filter + doc-keyed count; verification is in-row ``contains``
    over candidates.  Returns per group (or one row):
    ``(n_docs, n_candidates, n_matches)``.
    """
    if len(pattern) < 3:
        raise ValueError("pattern must be at least 3 chars")
    pats = sorted({pattern[i:i + 3]
                   for i in range(len(pattern) - 2)})
    g = (F.col(group_col) if group_col else F.lit("all")) \
        .alias("__g")
    docs = df.select(F.col(id_col).alias("__id"), g,
                     F.col(text_col).alias("__t"))
    tri = (docs.select(
        "__id", "__g",
        F.explode(F.sequence(
            F.lit(1),
            F.greatest(F.length("__t") - 2, F.lit(0)))).alias("__i"),
        "__t")
        .select("__id", "__g",
                F.expr("substring(__t, __i, 3)").alias("__tri"))
        .filter(F.col("__tri").isin(pats))
        .distinct())
    cand = (tri.groupBy("__id", "__g")
            .agg(F.count("*").alias("__hit"))
            .filter(F.col("__hit") == len(pats))
            .select("__id", "__g"))
    ver = (cand.join(docs, ["__id", "__g"])
           .select("__id", "__g",
                   F.col("__t").contains(pattern).cast("long")
                   .alias("__m")))
    nd = docs.groupBy("__g").agg(
        F.count("*").cast("long").alias("n_docs"))
    cm = (ver.groupBy("__g")
          .agg(F.count("*").cast("long").alias("n_candidates"),
               F.sum("__m").cast("long").alias("n_matches")))
    out = nd.join(cm, "__g", "left")
    return out.select(
        F.col("__g").alias(group_col or "corpus"), "n_docs",
        F.coalesce("n_candidates", F.lit(0)).cast("long")
        .alias("n_candidates"),
        F.coalesce("n_matches", F.lit(0)).cast("long")
        .alias("n_matches"))
