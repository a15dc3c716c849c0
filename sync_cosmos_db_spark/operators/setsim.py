"""Exact set-similarity join via prefix filtering (the AllPairs /
PPJoin family, Bayardo et al. 2007 / Xiao et al. 2008) — all document
pairs with token-set Jaccard >= t, EXACTLY, without the n² pair space.

Complements the dedup family: MinHash LSH (``operators/dedup.py``) is
probabilistic (recall < 1 by design); this operator is exact — the
pair set it returns is provably complete — at the cost of a candidate
space governed by the prefix bound instead of band collisions.  The
reference has no dedup surface at all (SURVEY.md §2.3).

The prefix-filter principle: order every document's distinct tokens by
a GLOBAL canonical order (ascending document frequency, then token —
rarest first).  For Jaccard threshold ``t``, two sets A, B with
J(A,B) >= t must overlap in at least
``ceil(t/(1+t) * (|A|+|B|))`` elements, which implies A's and B's
PREFIXES — the first ``|X| - ceil(t·|X|) + 1`` tokens of each — share
at least one token.  So candidates = pairs sharing ANY prefix token,
an equi-join keyed on (rare) tokens, and completeness is a theorem,
not a tuning outcome.

Scale shape, stage by stage:

* **df ranking** — one (token)-keyed aggregate over distinct
  (doc, token) pairs; output is vocabulary-sized, joined back by
  token.  Rarest-first ordering is what keeps prefix postings short:
  a stopword is in nobody's prefix, so the hot-token skew that kills
  naive token joins never enters the candidate join.
* **prefix candidates** — equi-join of prefix postings with
  ``id_a < id_b``; shuffle keys are tokens, volume is bounded by the
  per-token posting lists of PREFIX tokens only.
* **exact verify** — candidates joined back to full token sets,
  one (pair)-keyed count gives the intersection; union size follows
  from |A| + |B| − inter.  Only candidate pairs are verified.

Every shuffle key is a token or a pair id; there is no n² stage, no
driver state beyond Spark's own planning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct (id, token) pairs; single-space tokenization (the
    repo-wide SQL-portable convention)."""
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(
                          F.split(F.col(text_col), " "))).alias("tok")))


def setsim_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(tokens_a, tokens_b) >=
    ``threshold``.  Returns (id_a, id_b, inter, n_union, jaccard) with
    jaccard floor-rounded to 6 decimals AFTER the exact integer
    inter/union are fixed, so the oracle can hash-compare every pair.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = _doc_tokens(df, id_col, text_col)

    # global canonical order: ascending df, then token (deterministic)
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("__df"))
    ranked = (toks.join(dfreq, "tok")
              .withColumn("__rk", F.row_number().over(
                  W.partitionBy("id").orderBy(F.col("__df").asc(),
                                              F.col("tok").asc())))
              .withColumn("__sz", F.count("*").over(W.partitionBy("id"))))

    # prefix length: |X| - ceil(t*|X|) + 1.  The 1e-9 guard keeps a
    # float-rounded-UP product (e.g. 0.7*20 = 14.000000000000002) from
    # ceiling one too high and SHORTENING the prefix — a longer prefix
    # only adds candidates, a shorter one breaks completeness.
    prefix_len = (F.col("__sz")
                  - F.ceil(F.lit(threshold) * F.col("__sz") - 1e-9) + 1)
    prefix = ranked.filter(F.col("__rk") <= prefix_len) \
        .select("id", "tok", "__sz")

    a = prefix.select(F.col("id").alias("id_a"), "tok",
                      F.col("__sz").alias("__sza"))
    b = prefix.select(F.col("id").alias("id_b"), "tok",
                      F.col("__sz").alias("__szb"))
    cands = (a.join(b, "tok")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "__sza", "__szb")
             .distinct())

    # exact verify: intersection via the full token sets
    ta = toks.select(F.col("id").alias("id_a"), "tok")
    tb = toks.select(F.col("id").alias("id_b"), "tok")
    inter = (cands.join(ta, "id_a").join(tb, ["id_b", "tok"])
             .groupBy("id_a", "id_b", "__sza", "__szb")
             .agg(F.count("*").cast("long").alias("inter")))
    out = inter.withColumn(
        "n_union", (F.col("__sza") + F.col("__szb") - F.col("inter"))
        .cast("long"))
    jac = F.col("inter") / F.col("n_union")
    return (out.filter(jac >= threshold)
            .select("id_a", "id_b", "inter", "n_union",
                    (F.floor(jac * 1e6 + F.lit(0.5)) / 1e6)
                    .alias("jaccard")))


def prefix_length(set_size: int, threshold: float) -> int:
    """Driver-side twin of the prefix bound (for tests): the number of
    rarest-first tokens that must be indexed so no qualifying pair is
    missed."""
    return set_size - math.ceil(threshold * set_size - 1e-9) + 1
