"""URL canonicalization and domain extraction for web-corpus curation.

A crawl-derived 100 TB corpus keys almost everything on URLs —
dedup-by-URL, domain mixing caps, blocklists — and raw URLs are noisy:
case-varying hosts, explicit default ports, fragments, and
permutation-equivalent query strings all denote the same resource.
``canonicalize_url`` collapses those variants; exact URL dedup then
becomes ``exact_dedup`` on the canonical column (one groupBy), and
per-domain caps become ``cap_per_group`` on ``host``.

Everything is a chain of ``regexp_extract`` / array HOF Column
expressions — zero UDFs, zero shuffles, whole-stage codegen.  The
parse is deliberately regexp-based rather than ``parse_url`` so the
SAME pattern (RE2-safe: no backrefs, ASCII classes) runs in the DuckDB
oracle and the byte-exact hash comparison can hold both engines to one
pinned semantics.

Canonical form (RFC 3986 normalizations that are always safe):
lowercase scheme and host, drop ``:80``/``:443`` when they are the
scheme default, drop the fragment, sort query parameters bytewise,
drop a bare trailing ``?``.  Path case and encoding are preserved
(path is case-sensitive per the RFC).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one RE2-safe pattern, groups: 1=scheme 2=host 3=port 4=path 5=query
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?"


def _part(c: Column, idx: int) -> Column:
    return F.regexp_extract(c, _URL_RE, idx)


def url_parts(col: Column | str) -> dict[str, Column]:
    """Decompose a URL into scheme/host/port/path/query Columns (empty
    string where absent, mirroring regexp_extract semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "scheme": F.lower(_part(c, 1)),
        "host": F.lower(_part(c, 2)),
        "port": _part(c, 3),
        "path": _part(c, 4),
        "query": _part(c, 5),
    }


def registrable_domain(col: Column | str) -> Column:
    """Last two host labels ("news.bbc.co.uk" → "co.uk" caveat noted:
    a real crawler needs the public-suffix list; the two-label form is
    the standard approximation when the PSL isn't shipped)."""
    host = url_parts(col)["host"]
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)))


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL string; rows that don't parse as absolute URLs
    come back as the trimmed original (garbage in, garbage out — but
    deterministically so)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    p = url_parts(c)
    is_url = p["scheme"] != ""

    default_port = (
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
        | (p["port"] == ""))
    port = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), p["port"]))

    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])

    sorted_q = F.concat_ws(
        "&", F.array_sort(F.split(p["query"], "&")))
    query = F.when(p["query"] == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_q))

    canon = F.concat(p["scheme"], F.lit("://"), p["host"], port, path, query)
    return F.when(is_url, canon).otherwise(c)
