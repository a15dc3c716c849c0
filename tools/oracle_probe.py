#!/usr/bin/env python
"""Probe DuckDB oracle cost one query at a time (SCALING.md open item).

Round 10 found that some oracle among the first ~80 alphabetical
non-quadratic names drives DuckDB to a ~70 GB working set at sf0.1
while the Spark side stays fast.  This runs each ORACLE (DuckDB only —
no Spark) in its own subprocess under a hard memory limit and wall
timeout, so the hostile one is NAMED instead of taking the sweep down.

Usage:
  python tools/oracle_probe.py [--sf DIR] [--limit-gb N] [--timeout S]
                               [--skip-quadratic] [names...]
Writes one JSON line per oracle to stdout:
  {"name":..., "sec":..., "rows":..., "status":"ok|timeout|oom|error"}
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

# Oracles that are DELIBERATE O(n²) replays (adversarial ground truth
# for blocked/bucketed Spark operators — SCALING.md documents each);
# they are expected to be slow at sf0.1 and are not the open item.
QUADRATIC = {
    "setsim_join_docs", "dedup_span_coverage", "dedup_jaccard_pairs",
    "dedup_embedding_cosine", "editdist_join_names", "entity_link_customers",
    "dedup_components", "simhash_near_dup",
    # NOT listed: sim_topk_{bruteforce,vectorized,ivf_fullprobe} — their
    # oracles are n² in EMBEDDINGS (2k rows at sf0.1, seconds), not in
    # documents; measured MATCH at sf0.1 in 8.8/2.9/3.6 s (round 11).
    # Round-11 bisect findings (the SCALING.md "~70 GB DuckDB working
    # set" open item): both replay all-pairs joins in the oracle —
    # canonical's lang-blocked shingle-list Jaccard, curation's
    # token-inverted-index pair join.  Their bounded twins
    # (queries_r11.py *_sampled) check the same invariants at any SF.
    "canonical_doc_election", "curation_pipeline_stats",
    # Found by the round-11 full sf0.1 sweep: same lang-blocked
    # all-pairs shingle-Jaccard oracle shape as canonical_doc_election
    # (timed out at 180 s / 8 GB); bounded twin
    # dedup_lsh_containment_sampled keeps the invariant sf0.1-checkable.
    "dedup_lsh_containment",
}

CHILD = r"""
import json, sys, time
import duckdb
sf_dir, sql, limit_gb = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
con.execute(f"SET memory_limit='{limit_gb}GB'")
con.execute("SET threads=8")
# spill OUTSIDE the repo — an uncapped probe once left 24 GB in ./.tmp
con.execute("SET temp_directory='/tmp/duckdb_probe.tmp'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
t0 = time.time()
rows = con.execute(sql).fetchall()
print(json.dumps({"sec": round(time.time()-t0, 2), "rows": len(rows)}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--limit-gb", type=int, default=8)
    ap.add_argument("--timeout", type=float, default=150.0)
    ap.add_argument("--skip-quadratic", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    oracles = e.oracle_sql()
    names = args.names or sorted(oracles)
    for name in names:
        if name not in oracles:
            continue
        if args.skip_quadratic and name in QUADRATIC:
            print(json.dumps({"name": name, "status": "skipped_quadratic"}),
                  flush=True)
            continue
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, args.sf, oracles[name],
                 str(args.limit_gb)],
                capture_output=True, text=True, timeout=args.timeout)
        except subprocess.TimeoutExpired:
            print(json.dumps({"name": name, "status": "timeout",
                              "sec": round(time.time() - t0, 1)}), flush=True)
            continue
        if proc.returncode != 0:
            err = (proc.stderr or "").strip().splitlines()
            tail = err[-1][:200] if err else ""
            status = "oom" if "emory" in tail else "error"
            print(json.dumps({"name": name, "status": status,
                              "sec": round(time.time() - t0, 1),
                              "err": tail}), flush=True)
            continue
        out = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps({"name": name, "status": "ok", **out}), flush=True)


if __name__ == "__main__":
    main()
