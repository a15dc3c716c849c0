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
    c = F.regexp_replace(c, r"(?i)<script[^>]*>[^<]*(</script>)?", "")
    c = F.regexp_replace(c, r"(?i)<style[^>]*>[^<]*(</style>)?", "")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)
