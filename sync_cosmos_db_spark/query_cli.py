"""Run any registered analytics query from the command line.

The migrate CLI (``python -m sync_cosmos_db_spark``) deliberately
mirrors the reference's flag surface (``/root/reference/src/main.py``),
so the analytics registry gets its own entry point:

    python -m sync_cosmos_db_spark.query_cli --list
    python -m sync_cosmos_db_spark.query_cli dedup_exact_content \
        --sf-dir /root/testdata/sf0.01 --limit 20 --format json

Output goes to stdout as JSON lines (machine-readable, the engine's
summary-file convention) or an aligned text table for eyeballs.
``--limit`` caps DRIVER-side collection only — the query itself runs
distributed and unlimited; capping at the driver is the collect
discipline every operator in this repo follows.
"""

from __future__ import annotations

import argparse
import json
import sys


def get_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="sync_cosmos_db_spark.query_cli",
        description="Run a registered analytics query")
    p.add_argument("name", nargs="?", default=None,
                   help="registered query name (see --list)")
    p.add_argument("--list", action="store_true", dest="list_queries",
                   help="list registered query names and exit")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                   help="table directory (NAME.parquet per table)")
    p.add_argument("--limit", type=int, default=100,
                   help="max rows collected to the driver (query itself "
                        "is unlimited)")
    p.add_argument("--format", choices=["json", "table"], default="json",
                   help="stdout format")
    args = p.parse_args(argv)
    if not args.list_queries and args.name is None:
        p.error("a query name is required unless --list is given")
    return args


def main(argv: list[str] | None = None) -> int:
    args = get_args(argv)
    from sync_cosmos_db_spark.queries import get_queries

    queries = get_queries()
    if args.list_queries:
        for name in queries:
            print(name)
        return 0
    if args.name not in queries:
        print(f"error: unknown query {args.name!r} "
              f"({len(queries)} registered; use --list)", file=sys.stderr)
        return 2

    from sync_cosmos_db_spark.session import get_spark

    spark = get_spark(app_name=f"query:{args.name}")
    df = queries[args.name](spark, args.sf_dir)
    rows = df.limit(args.limit).collect()
    cols = df.columns
    if args.format == "json":
        for r in rows:
            print(json.dumps({c: _jsonable(v) for c, v in
                              zip(cols, r)}, default=str))
    else:
        widths = [max(len(c), *(len(str(r[i])) for r in rows), 1)
                  if rows else len(c) for i, c in enumerate(cols)]
        print("  ".join(c.ljust(w) for c, w in zip(cols, widths)))
        for r in rows:
            print("  ".join(str(v).ljust(w) for v, w in zip(r, widths)))
    print(f"# {len(rows)} row(s) shown (limit {args.limit})",
          file=sys.stderr)
    return 0


def _jsonable(v):
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


if __name__ == "__main__":
    raise SystemExit(main())
