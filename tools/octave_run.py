#!/usr/bin/env python
"""Measure registered queries across the /tmp scale octaves.

Formalizes the ad-hoc protocol behind SCALING.md's "sf0.5 linearity" /
"second scale octave" tables (rounds 12-14) so the runs are
reproducible:

* slices: ``tools/sf05_upsample.py`` (sf0.5) and ``--copies 25``
  (sf2.5) — regenerated in /tmp, never committed;
* session: ``local[32]``, shuffle partitions 32, UTC, UI off — the
  bench configuration;
* timing: Spark-side only, each member at each scale runs TWICE warm
  after a shared session warm-up and the BEST is reported (the
  "best-of-2 warm, run 1 discarded" protocol); the sink is
  ``write.format("noop")`` so multi-M-row results measure the engine,
  not driver serialization (BASELINE.md round-12 note);
* rows: counted once, untimed, so the table can show output-row
  ratios next to time ratios.

Usage::

    python tools/octave_run.py --out /tmp/octave_r15.jsonl \
        pagerank_customer_supplier bellman_ford_trade_distance ...

Emits one JSON line per (query, scale): ``{"name", "sf_dir", "sec"
(best), "runs" (both), "rows"}``.  BENCH-HYGIENE: settled host, no
concurrent Spark drivers (same rule as bench.py).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dirs", nargs="+",
                    default=["/tmp/sf0.5", "/tmp/sf2.5"])
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="/dev/stdout")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.queries import get_queries

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    q = get_queries()

    out = open(args.out, "a", buffering=1)
    for name in args.names:
        fn = q[name]
        for sf_dir in args.sf_dirs:
            # warm-up run (discarded) + timed repeats, best reported —
            # one COLD execution would bill JIT/codegen/scan-planning
            # to the smallest member (the r13 sweep-mode lesson).
            runs = []
            for i in range(args.repeats + 1):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                sec = round(time.time() - t0, 2)
                release_persisted()
                if i > 0:
                    runs.append(sec)
            rows = fn(spark, sf_dir).count()
            release_persisted()
            out.write(json.dumps({
                "name": name, "sf_dir": sf_dir, "sec": min(runs),
                "runs": runs, "rows": rows}) + "\n")
    out.close()


if __name__ == "__main__":
    main()
