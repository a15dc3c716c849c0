"""Orchestration: account → database → container loops (O23) + summary (O24).

The reference's ``main()`` dispatches three entry points by CLI scope
(``/root/reference/src/main.py:107-152``): full account, one database
(``--database``), one container (``--database --container``; container
without database is rejected at ``src/main.py:109-110``). The loops are
driver-side Python over catalog entries; each container migration is one
distributed Spark job — set-at-a-time, not the reference's one-RTT-per-
document loop.

Divergences (documented): the reference's single-container path skips
``create_database_if_not_exists`` and requires a pre-existing target
database (``src/main.py:114``, SURVEY.md §3 entry point 3); we create it
idempotently in all three paths — strictly more robust, never wrong.

100 TB posture: each container migration is already fully distributed;
``max_parallel`` additionally submits container jobs concurrently from
driver threads (pair with fair scheduler pools on a shared cluster) so
many small containers don't serialize on job-launch latency.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from sync_cosmos_db_spark.migration import (
    MigrationResult,
    check_pk_alignment,
    migrate_container,
    verify_migration,
)
from sync_cosmos_db_spark.sinks import merge_to_parquet, write_summary
from sync_cosmos_db_spark.sources import catalog


def _prepare_merge_keys(src_df, tgt_df, pk_paths: list[str]):
    """Build the merge key (id + one column per pk path), materializing
    nested paths as extracted ``__pk_i`` columns on BOTH sides — the
    full hierarchical key list, never truncated to the first path
    (reference truncates at ``src/containers.py:16``; SURVEY.md §1.4)."""
    from sync_cosmos_db_spark.document_model import extract_pk_columns

    keys = ["id"] if "id" in src_df.columns else []
    flat, nested = [], []
    for p in pk_paths:
        parts = [x for x in p.strip("/").split("/") if x]
        if len(parts) == 1 and parts[0] != "id":
            if parts[0] in src_df.columns:
                flat.append(parts[0])
        elif len(parts) > 1:
            nested.append(p)
    if nested:
        src_df = extract_pk_columns(src_df, nested)
        tgt_df = extract_pk_columns(tgt_df, nested)
        keys += flat + [f"__pk_{i}" for i in range(len(nested))]
    else:
        keys += flat
    return src_df, tgt_df, keys


def migrate_container_path(
    spark: SparkSession,
    source_root: str,
    target_root: str,
    database: str,
    container: str,
    sanitize: bool = False,
    strong_verify: bool = False,
    connector_options: dict[str, str] | None = None,
) -> MigrationResult:
    """Migrate one container between filesystem accounts (the harness
    form of ``src/main.py:30-56``): properties (O17) → pk pre-flight
    (O18) → DDL (O16) → classify+write (O6-O14) → verify (O21).

    ``connector_options`` (e.g. the ``spark.cosmos.throughputControl.*``
    RU bound from the CLI) is applied to the source/target reads — the
    place RU consumption happens on a real connector deployment. The
    parquet reader ignores unknown options, so the harness path is
    unaffected while the wiring stays live end-to-end (round-2 advice)."""
    src_props = catalog.get_container_properties(source_root, database,
                                                 container)
    tgt_exists = catalog.container_exists(target_root, database, container)
    if tgt_exists:
        tgt_props = catalog.get_container_properties(target_root, database,
                                                     container)
        check_pk_alignment(src_props["partition_key_paths"],
                           tgt_props["partition_key_paths"])

    tgt_path = catalog.create_container_if_not_exists(
        target_root, database, container, src_props)

    reader = spark.read.options(**(connector_options or {}))
    src_df = reader.parquet(
        catalog.container_data_path(source_root, database, container))
    if tgt_exists:
        tgt_df = reader.parquet(tgt_path)
    else:
        tgt_df = spark.createDataFrame([], src_df.schema)

    src_orig = src_df
    src_df, tgt_df, keys = _prepare_merge_keys(
        src_df, tgt_df, src_props["partition_key_paths"])

    _, result = migrate_container(
        src_df, tgt_df, keys, container=container, sanitize=sanitize,
        writer=lambda tagged: merge_to_parquet(
            tagged.drop(*[c for c in tagged.columns
                          if c.startswith("__pk_")]), tgt_path),
    )

    new_tgt = spark.read.parquet(tgt_path)
    # verify on the ORIGINAL source frame (the extracted __pk_ merge
    # columns are dropped from the written target); content-level
    # verification is meaningless under sanitization (written rows are
    # deliberately different), so fall back to counts there
    ok, n_src, n_tgt = verify_migration(src_orig, new_tgt,
                                        strong=strong_verify and not sanitize)
    result.verified = ok
    result.source_count = n_src
    result.target_count = n_tgt
    if connector_options:
        result.extra["connector_options"] = dict(connector_options)
    return result


def migrate_database_path(spark: SparkSession, source_root: str,
                          target_root: str, database: str,
                          sanitize: bool = False,
                          strong_verify: bool = False,
                          max_parallel: int = 1,
                          connector_options: dict[str, str] | None = None,
                          ) -> dict:
    """One database: create it on the target (O15), loop its containers
    (reference ``src/main.py:58-81``).

    ``max_parallel > 1`` submits container migrations as concurrent
    Spark jobs from driver threads (SparkSession is thread-safe; use
    fair scheduler pools on a shared cluster). Each container touches
    disjoint paths, so concurrency is safe; results are keyed, not
    ordered. The reference is strictly sequential — one document at a
    time, let alone one container."""
    catalog.create_database_if_not_exists(target_root, database)
    containers = catalog.list_containers(source_root, database)
    if max_parallel <= 1 or len(containers) <= 1:
        return {c: migrate_container_path(
            spark, source_root, target_root, database, c,
            sanitize=sanitize, strong_verify=strong_verify,
            connector_options=connector_options)
            for c in containers}

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_parallel) as pool:
        futs = {c: pool.submit(
            migrate_container_path, spark, source_root, target_root,
            database, c, sanitize, strong_verify, connector_options)
            for c in containers}
        return {c: f.result() for c, f in futs.items()}


def migrate_account_path(
    spark: SparkSession,
    source_root: str,
    target_root: str,
    database: str | None = None,
    container: str | None = None,
    sanitize: bool = False,
    strong_verify: bool = False,
    summary_path: str | None = None,
    max_parallel: int = 1,
    connector_options: dict[str, str] | None = None,
) -> dict:
    """Scope dispatch exactly like the reference (``src/main.py:107-152``):
    no scope → every database; ``database`` → one database; ``database``
    + ``container`` → one container. ``container`` without ``database``
    is an error (``src/main.py:109-110``)."""
    if container is not None and database is None:
        raise ValueError("--container requires --database")

    start = time.monotonic()
    results: dict = {}
    if database is not None and container is not None:
        catalog.create_database_if_not_exists(target_root, database)
        results[database] = {container: migrate_container_path(
            spark, source_root, target_root, database, container,
            sanitize=sanitize, strong_verify=strong_verify,
            connector_options=connector_options)}
    elif database is not None:
        results[database] = migrate_database_path(
            spark, source_root, target_root, database,
            sanitize=sanitize, strong_verify=strong_verify,
            max_parallel=max_parallel, connector_options=connector_options)
    else:
        for db in catalog.list_databases(source_root):
            results[db] = migrate_database_path(
                spark, source_root, target_root, db,
                sanitize=sanitize, strong_verify=strong_verify,
                max_parallel=max_parallel,
                connector_options=connector_options)

    summary = {
        "source_account": source_root,
        "target_account": target_root,
        "duration_sec": round(time.monotonic() - start, 3),
        "results": results,
    }
    if summary_path:
        write_summary(summary, summary_path)
    return summary
