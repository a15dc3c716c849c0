#!/usr/bin/env python
"""Dump ``.explain('formatted')`` for registered queries to files.

Usage::

    python tools/dump_plans.py --out-dir plans/r17 --suffix _after \
        [--sf-dir /root/testdata/sf0.1] name [name ...]

Writes ``<out-dir>/<name><suffix>.txt`` per query.  For the streaming
members the wrapper executes the stream eagerly and returns a BATCH
frame over the emitted table, so the captured plan is the post-stream
batch plan; the streaming micro-batch plan is code-visible only (the
optimization evidence for those lives in the operator diff).
"""
from __future__ import annotations

import argparse
import os
import sys
from os.path import abspath, dirname

sys.path.insert(0, dirname(dirname(abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sync_cosmos_db_spark.cache_scope import release_persisted
    from sync_cosmos_db_spark.queries import get_queries

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    q = get_queries()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in args.names:
        df = q[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(args.out_dir,
                               f"{name}{args.suffix}.txt"), "w") as fh:
            fh.write(plan)
        release_persisted()
        print("wrote", name)


if __name__ == "__main__":
    main()
