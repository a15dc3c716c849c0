"""CLI entry point: ``python -m sync_cosmos_db_spark``.

Mirrors the reference CLI (``/root/reference/src/main.py:10-28``) with
filesystem account roots standing in for Cosmos account credentials:

    python -m sync_cosmos_db_spark --source-root /data/src \
        --target-root /data/tgt [--database DB [--container C]] \
        [--sanitize] [--strong-verify] [--summary PATH]

Flag notes vs the reference:

* ``--sanitize`` is a proper ``store_true`` flag — the reference used
  ``type=bool``, which makes EVERY non-empty CLI string truthy
  (``src/main.py:23``, SURVEY.md §2.1 supporting notes); only its
  env-var default behaved as intended.
* ``--batch-size`` / ``--max-retries`` map to their Spark-native
  equivalents instead of client-side loops: ``--max-task-failures``
  sets ``spark.task.maxFailures`` (per-task retry budget, the live
  replacement for the reference's dead retry loop —
  ``src/migration.py:148`` breaks unconditionally), and
  ``--throughput-target-ru`` / ``--throughput-target-fraction`` bound
  the Cosmos connector's RU consumption via its public
  ``spark.cosmos.throughputControl.*`` options (the pacing role of
  ``--batch-size``). The throughput options are threaded into the
  orchestrator's source/target reads (live on a connector deployment;
  ignored by the parquet harness reader) and echoed in the printed
  summary so the wiring is testable without the jar.
"""

from __future__ import annotations

import argparse
import json
import sys


def get_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="sync_cosmos_db_spark",
        description="Spark-native document-container migration")
    p.add_argument("--source-root", required=True,
                   help="source account root directory")
    p.add_argument("--target-root", required=True,
                   help="target account root directory")
    p.add_argument("--database", default=None,
                   help="migrate only this database")
    p.add_argument("--container", default=None,
                   help="migrate only this container (requires --database)")
    p.add_argument("--sanitize", action="store_true",
                   help="deterministically sanitize PII fields on write")
    p.add_argument("--strong-verify", action="store_true",
                   help="content-level exceptAll verification, not just counts")
    p.add_argument("--summary", default="migration_summary.json",
                   help="summary JSON output path")
    p.add_argument("--max-parallel", type=int, default=1,
                   help="concurrent container migrations per database")
    p.add_argument("--max-task-failures", type=int, default=None,
                   help="per-task retry budget (spark.task.maxFailures)")
    p.add_argument("--throughput-target-ru", type=int, default=None,
                   help="cap connector RU/s consumption at this absolute "
                        "budget (spark.cosmos.throughputControl)")
    p.add_argument("--throughput-target-fraction", type=float, default=None,
                   help="cap connector RU/s at this fraction (0-1] of the "
                        "container's provisioned throughput")
    args = p.parse_args(argv)
    if args.container is not None and args.database is None:
        p.error("--container requires --database")
    if (args.throughput_target_ru is not None
            and args.throughput_target_fraction is not None):
        p.error("--throughput-target-ru and --throughput-target-fraction "
                "are mutually exclusive")
    return args


def connector_write_options(args: argparse.Namespace) -> dict[str, str]:
    """Cosmos connector reader/writer options implied by the CLI flags
    (empty when no throughput bound was requested)."""
    from sync_cosmos_db_spark.sources.cosmos import throughput_control

    if args.throughput_target_ru is not None:
        return throughput_control(target_ru=args.throughput_target_ru)
    if args.throughput_target_fraction is not None:
        return throughput_control(
            target_ru_fraction=args.throughput_target_fraction)
    return {}


def main(argv: list[str] | None = None) -> int:
    args = get_args(argv)
    from sync_cosmos_db_spark.orchestrator import migrate_account_path
    from sync_cosmos_db_spark.session import get_spark

    extra_conf = {}
    if args.max_task_failures is not None:
        extra_conf["spark.task.maxFailures"] = str(args.max_task_failures)
    spark = get_spark("sync_cosmos_db_spark.migrate", extra_conf=extra_conf)
    if args.max_task_failures is not None:
        # spark.task.maxFailures is a core conf fixed at SparkContext
        # start; get_spark may have REUSED an existing session (tests,
        # notebooks, shared drivers), in which case the flag silently
        # no-ops — surface that instead of pretending (round-2 advice).
        live = spark.sparkContext.getConf().get("spark.task.maxFailures",
                                                "4")
        if live != str(args.max_task_failures):
            print(f"warning: --max-task-failures={args.max_task_failures} "
                  f"not applied (existing SparkContext has "
                  f"spark.task.maxFailures={live}; core confs cannot "
                  "change after context start)", file=sys.stderr)
    wopts = connector_write_options(args)
    try:
        summary = migrate_account_path(
            spark, args.source_root, args.target_root,
            database=args.database, container=args.container,
            sanitize=args.sanitize, strong_verify=args.strong_verify,
            summary_path=args.summary, max_parallel=args.max_parallel,
            connector_options=wopts or None)
    except Exception as exc:  # reference: log + exit 1 (src/main.py:165-167)
        print(f"migration failed: {exc}", file=sys.stderr)
        return 1
    if wopts:
        summary["connector_options"] = wopts
    print(json.dumps(summary, default=str, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
