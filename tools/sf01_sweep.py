#!/usr/bin/env python
"""Full-registry driver-style sweep at sf0.1 (round-10 verdict item 4).

The committed CI sweep runs at the driver's sf0.01; this tool runs the
same hash compare (tests/oracle_utils.compare) at sf0.1 for every
oracle-bearing query EXCEPT the deliberately-quadratic oracles
(tools/oracle_probe.QUADRATIC — each of those has a bounded or sampled
twin that IS swept here).  Results land as JSONL, one line per query:
  {"name":..., "status":"match|mismatch|oracle_timeout|error",
   "sec":..., "spark_sec":..., "mode":"full_sweep|targeted"}

Timing comparability (r13 verdict item 2): a full sweep amortizes
Spark session/JIT warm-up across ~400 queries, while a targeted
re-run pays it on its first member — the two spark_sec populations
are NOT comparable (observed: pure oracle-side edits "regressing"
3.5 -> 9.0 s purely from cold-session startup).  Every row therefore
carries a ``mode`` stamp, and TARGETED rows re-run the Spark side
once more and report the WARM timing as ``spark_sec`` (the cold
first run is kept as ``spark_sec_cold``).  Trend regressions on
``spark_sec`` within full_sweep rows, or against a targeted row's
warm ``spark_sec`` — never against ``spark_sec_cold``.

Safety rails (the round-10 lesson — a hostile oracle took a 70 GB
working set): DuckDB runs under ``memory_limit`` (default 8 GB) with
``temp_directory`` redirected OUT of the repo (a prior run spilled
24 GB into ./.tmp), and a watchdog thread calls ``con.interrupt()``
after ``--timeout`` seconds so one slow oracle can't stall the sweep.

Resume: names already present in the output file are skipped, so a
crashed run continues where it left off.

Usage:
  python tools/sf01_sweep.py --out /tmp/sf01_sweep.jsonl [--sf DIR]
                             [--timeout S] [--limit-gb N] [names...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--timeout", type=float, default=180.0)
    ap.add_argument("--limit-gb", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # Env gate for the FULL sweep (round-11 verdict item 6: the sf0.1
    # sweep is an opt-in verify stage, gated the way the sweep budget
    # already is).  A targeted run (explicit query names) needs no
    # gate — it's minutes, not an hour.
    if not args.names and os.environ.get("SPARK_GRAFT_SF01_SWEEP") != "1":
        raise SystemExit(
            "full-registry sf0.1 sweep is ~40-60 min: set "
            "SPARK_GRAFT_SF01_SWEEP=1 to opt in, or pass explicit query "
            "names for a targeted run (see .claude/skills/verify/SKILL.md)")

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import __spark_entry__ as e
    from oracle_utils import compare, duckdb_connect
    from tools.oracle_probe import QUADRATIC

    done: set[str] = set()
    if os.path.exists(args.out):
        with open(args.out) as fh:
            done = {json.loads(l)["name"] for l in fh if l.strip()}

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb_connect(args.sf)
    con.execute(f"SET memory_limit='{args.limit_gb}GB'")
    con.execute("SET threads=8")
    con.execute("SET temp_directory='/tmp/duckdb_sf01_sweep.tmp'")

    q, o = e.queries(), e.oracle_sql()
    names = args.names or sorted(o)
    mode = "targeted" if args.names else "full_sweep"
    out = open(args.out, "a", buffering=1)
    for name in names:
        if name in done or name not in o:
            continue
        if name in QUADRATIC:
            out.write(json.dumps({"name": name,
                                  "status": "skipped_quadratic",
                                  "mode": mode}) + "\n")
            continue
        t0 = time.time()
        # The watchdog time-boxes the DUCKDB ORACLE, so it starts just
        # before compare(), not at member start (round-15, ADVICE r14):
        # with the timer covering the whole member, targeted mode's
        # extra warm Spark run burned up to 2x Spark wall time out of
        # the oracle's interrupt budget, so a slow Spark member could
        # flip a previously green oracle to a spurious oracle_timeout
        # in targeted mode only.  (compare() also re-runs the Spark
        # side, in BOTH modes — that share of the budget is inherent
        # to the compare structure and identical across modes.)
        timer = threading.Timer(args.timeout, con.interrupt)
        try:
            # Spark side first so spark_sec is attributable.
            ts = time.time()
            df = q[name](spark, args.sf)
            df.collect()
            spark_sec = round(time.time() - ts, 2)
            spark_sec_cold = None
            if mode == "targeted":
                # cold-session startup dominates a targeted first run
                # (see module docstring) — report the warm repeat as
                # the trendable spark_sec, keep the cold one.
                ts = time.time()
                q[name](spark, args.sf).collect()
                spark_sec_cold, spark_sec = (
                    spark_sec, round(time.time() - ts, 2))
            timer.start()
            compare(q[name](spark, args.sf), con, o[name], name=name)
            status = "match"
        except AssertionError as ex:
            status, detail = "mismatch", str(ex)[:300]
        except Exception as ex:  # noqa: BLE001
            msg = str(ex)[:300]
            status = ("oracle_timeout" if "INTERRUPT" in msg.upper()
                      or "interrupted" in msg.lower() else "error")
            detail = msg
        finally:
            timer.cancel()
        rec = {"name": name, "status": status,
               "sec": round(time.time() - t0, 2), "mode": mode}
        if status == "match":
            rec["spark_sec"] = spark_sec
            if spark_sec_cold is not None:
                rec["spark_sec_cold"] = spark_sec_cold
        elif status in ("mismatch", "error", "oracle_timeout"):
            rec["detail"] = detail
        out.write(json.dumps(rec) + "\n")
        try:
            from sync_cosmos_db_spark.cache_scope import release_persisted
            release_persisted()
        except Exception:
            pass
    out.close()


if __name__ == "__main__":
    main()
