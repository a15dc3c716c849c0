#!/usr/bin/env python
"""Map source edits since a git ref to registered query names.

The driver's correctness sweep re-checks 50 queries per round; a query
whose body (or oracle SQL) was edited after its latest driver row needs
a fresh row before its green evidence means anything (round-10 verdict
item 2).  This tool computes, for a ``git diff <ref>``, which
``@query(...)``-registered functions in ``sync_cosmos_db_spark/
queries*.py`` were touched, by intersecting the diff's new-file line
ranges with each registered function's AST span (decorator line through
body end — so oracle-SQL string edits inside the decorator count too).

Edits to shared operator modules (``operators/``, ``streaming/``) are
NOT auto-mapped — a helper edit can affect many queries and the mapping
is semantic, not lexical.  Those must be added to ``EDITED_ROUND`` in
``queries.py`` by hand when the edit changes query-visible semantics.

Usage: ``python tools/edited_queries.py [ref]`` (default: the latest
"round N:" boundary commit).  Prints one query name per line.
"""
from __future__ import annotations

import ast
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def round_boundary_ref() -> str:
    """The most recent driver round-boundary commit (``round N: ...``)."""
    out = subprocess.run(
        ["git", "log", "--oneline", "--grep", "^round [0-9]*:", "-n", "1",
         "--format=%H"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not out:
        raise SystemExit("no round-boundary commit found")
    return out


def changed_lines(ref: str, path: str) -> set[int]:
    """New-file line numbers changed between ref and the worktree."""
    out = subprocess.run(
        ["git", "diff", "-U0", ref, "--", path],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    lines: set[int] = set()
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        # A pure deletion (count 0) still touches the seam at `start`.
        lines.update(range(start, start + max(count, 1)))
    return lines


def query_spans(path: Path) -> dict[str, tuple[int, int]]:
    """name -> (first decorator line, body end line) for @query(...) fns."""
    tree = ast.parse(path.read_text())
    spans: dict[str, tuple[int, int]] = {}
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for dec in node.decorator_list:
            if (isinstance(dec, ast.Call)
                    and isinstance(dec.func, ast.Name)
                    and dec.func.id == "query"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)):
                start = min(d.lineno for d in node.decorator_list)
                spans[dec.args[0].value] = (start, node.end_lineno or start)
    return spans


def edited_queries(ref: str) -> list[str]:
    names: list[str] = []
    for path in sorted(REPO.glob("sync_cosmos_db_spark/queries*.py")):
        rel = str(path.relative_to(REPO))
        touched = changed_lines(ref, rel)
        if not touched:
            continue
        for name, (lo, hi) in query_spans(path).items():
            if any(lo <= ln <= hi for ln in touched):
                names.append(name)
    return names


if __name__ == "__main__":
    ref = sys.argv[1] if len(sys.argv) > 1 else round_boundary_ref()
    for name in edited_queries(ref):
        print(name)
