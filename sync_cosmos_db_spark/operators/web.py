"""Web-corpus operators: hyperlink extraction and HTML boilerplate
stripping — the first two passes every web-crawl pretraining pipeline
runs before text analysis.

The reference has no web surface (SURVEY.md §2.3 absence record); these
are extension operators in the X-family series.  Both are single-pass
in-row regexes — JVM-side, whole-stage codegen, zero shuffle — and
every pattern is RE2-safe (no backreferences, no lookaround) so the
DuckDB oracle can run the identical regex and the hash check pins the
semantics byte-for-byte.

* ``extract_links`` — all ``href`` targets of anchor tags, one output
  row per (doc, link).  The pattern tolerates single/double quotes.
  Downstream this feeds the URL canonicalizer (``operators/url.py``)
  and the link graph (``operators/graph.py``) — the classic
  extract → canonicalize → rank pipeline.
* ``strip_html`` — drop script/style blocks wholesale, strip tags,
  decode the six entities that matter for text statistics
  (&amp; &lt; &gt; &quot; &#39; &nbsp;), squeeze whitespace.  NOT a
  browser-grade parser (no external libs in this container): the
  regexes implement the documented subset exactly, and the oracle
  holds both engines to it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: href of an anchor tag; group 2 is the target. RE2-safe.
HREF_PATTERN = r"""<a\s[^>]*href\s*=\s*("([^"]*)"|'([^']*)')"""


def extract_links(col: Column | str) -> Column:
    """Array of href targets (double- then single-quoted matches).

    SQL twin (DuckDB):
    ``list_concat(regexp_extract_all(c, PATTERN, 2),
    regexp_extract_all(c, PATTERN_SQ, 2))`` — two passes because each
    engine returns ONE group per call; the double/single split keeps
    group numbering identical on both sides.
    """
    c = F.col(col) if isinstance(col, str) else col
    dq = F.regexp_extract_all(
        c, F.lit(r"""<a\s[^>]*href\s*=\s*"([^"]*)\""""), 1)
    sq = F.regexp_extract_all(
        c, F.lit(r"""<a\s[^>]*href\s*=\s*'([^']*)'"""), 1)
    return F.concat(dq, sq)


_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def strip_html(col: Column | str) -> Column:
    """Visible text of an HTML fragment per the documented subset:
    remove ``<script>``/``<style>`` blocks (content included), strip
    every remaining tag, decode the six standard entities (amp LAST so
    ``&amp;lt;`` decodes to the literal ``&lt;``, matching browsers),
    collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    # Non-greedy block match (round-4 ADVICE): `.*?` spans `<` inside
    # the block (e.g. `if (a<b)` in JS), so the whole body is dropped up
    # to the closing tag — or end-of-input for an unclosed block. RE2-
    # safe: inline (?is) flags + lazy quantifier, no lookaround.
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?(</script>|$)", "")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?(</style>|$)", "")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def common_prefix_by_group(df, group_col: str, text_col: str):
    """Longest common prefix of every group's texts — the boilerplate
    detector (same-site pages share a rendered header; stripping it is
    a standard web-curation pass).

    Uses the order-statistics identity LCP(S) = LCP(min(S), max(S))
    under lexicographic order: any prefix shared by the lexicographic
    extremes is shared by every string between them.  So the whole
    operator is ONE group aggregate (min, max, count) plus in-row
    character comparison of two strings per group — no pairwise
    comparisons, no second shuffle, group-keyed exchange only.

    Returns (group, n_docs, prefix_len, prefix) — ``prefix`` is the
    common prefix itself (empty string when the group shares nothing).
    """
    from pyspark.sql import functions as F

    g = (df.groupBy(F.col(group_col).alias("grp"))
         .agg(F.count("*").cast("long").alias("n_docs"),
              F.min(F.col(text_col)).alias("lo"),
              F.max(F.col(text_col)).alias("hi")))
    lo, hi = F.coalesce(F.col("lo"), F.lit("")), \
        F.coalesce(F.col("hi"), F.lit(""))
    n = F.least(F.length(lo), F.length(hi))
    positions = F.when(n < 1, F.array().cast("array<int>")) \
        .otherwise(F.sequence(F.lit(1), n))
    mismatches = F.filter(
        positions,
        lambda i: lo.substr(i, F.lit(1)) != hi.substr(i, F.lit(1)))
    first_bad = F.array_min(mismatches)
    plen = F.coalesce(first_bad - 1, n).cast("long")
    return g.select(
        F.col("grp").alias(group_col), "n_docs",
        plen.alias("prefix_len"),
        lo.substr(F.lit(1), plen.cast("int")).alias("prefix"))
