"""Catalog scans and DDL: the account → database → container hierarchy.

The reference walks Cosmos DB's resource tree over the network
(databases at ``/root/reference/src/clients.py:28-49``, containers at
``src/containers.py:8-89``). This engine maps the hierarchy onto a
filesystem layout the Spark harness can run anywhere:

    <account root>/<database>/<container>.parquet          -- data
    <account root>/<database>/<container>.properties.json  -- metadata

Operator map (SURVEY.md §2):

* O4  list databases             — reference ``src/clients.py:28-38``
* O5  list containers            — reference ``src/containers.py:78-89``
* O15 create database if absent  — reference ``src/clients.py:40-49``
* O16 create container if absent — reference ``src/containers.py:46-76``
* O17 container properties       — reference ``src/containers.py:8-44``

Divergence (documented, SURVEY.md §1.4): the reference keeps only the
FIRST partition-key path when recreating a container
(``src/containers.py:16``), silently truncating hierarchical keys; we
round-trip the full path list. Indexing policy and RU throughput are
carried opaquely in the properties sidecar — they configure the Cosmos
service, not the query engine (no core-Spark analog).

In production the same five operations are one-liners against the
Cosmos Spark connector's catalog API (see ``sources/cosmos.py``); this
module is the harness implementation with identical semantics.
"""

from __future__ import annotations

import json
import os

#: Default partition-key path when properties are missing or unreadable —
#: the reference's fallback at ``src/containers.py:16,37-44``.
DEFAULT_PK_PATHS = ["/id"]

_PROPS_SUFFIX = ".properties.json"
_DATA_SUFFIX = ".parquet"


def list_databases(account_root: str) -> list[str]:
    """O4 — enumerate database names (sorted for determinism; the
    reference emits server order, which is unspecified)."""
    if not os.path.isdir(account_root):
        return []
    return sorted(
        d for d in os.listdir(account_root)
        if os.path.isdir(os.path.join(account_root, d))
        and not d.startswith(".")
    )


def list_containers(account_root: str, database: str) -> list[str]:
    """O5 — enumerate container names of a database."""
    db_dir = os.path.join(account_root, database)
    if not os.path.isdir(db_dir):
        return []
    return sorted(
        f[: -len(_DATA_SUFFIX)] for f in os.listdir(db_dir)
        if f.endswith(_DATA_SUFFIX)
    )


def create_database_if_not_exists(account_root: str, database: str) -> str:
    """O15 — idempotent database creation; returns the database path."""
    path = os.path.join(account_root, database)
    os.makedirs(path, exist_ok=True)
    return path


def container_data_path(account_root: str, database: str,
                        container: str) -> str:
    return os.path.join(account_root, database, container + _DATA_SUFFIX)


def container_exists(account_root: str, database: str,
                     container: str) -> bool:
    return os.path.exists(container_data_path(account_root, database,
                                              container))


def get_container_properties(account_root: str, database: str,
                             container: str) -> dict:
    """O17 — read container metadata; on any failure fall back to the
    ``/id`` partition key exactly like the reference
    (``src/containers.py:37-44``), but keep the FULL pk path list."""
    props_path = container_data_path(
        account_root, database, container)[: -len(_DATA_SUFFIX)] + _PROPS_SUFFIX
    try:
        with open(props_path) as f:
            props = json.load(f)
        paths = props.get("partition_key_paths") or DEFAULT_PK_PATHS
        return {
            "partition_key_paths": list(paths),
            "indexing_policy": props.get("indexing_policy"),
            "throughput": props.get("throughput"),
        }
    except (OSError, ValueError):
        return {"partition_key_paths": list(DEFAULT_PK_PATHS),
                "indexing_policy": None, "throughput": None}


def create_container_if_not_exists(account_root: str, database: str,
                                   container: str,
                                   properties: dict | None = None) -> str:
    """O16 — idempotent container metadata creation carrying the FULL
    pk path list (unlike the reference's first-path truncation). Data
    lands when the first write happens; Cosmos provisions the container
    eagerly, parquet cannot represent an empty untyped table."""
    create_database_if_not_exists(account_root, database)
    props_path = container_data_path(
        account_root, database, container)[: -len(_DATA_SUFFIX)] + _PROPS_SUFFIX
    if not os.path.exists(props_path):
        props = {
            "partition_key_paths": list(
                (properties or {}).get("partition_key_paths",
                                       DEFAULT_PK_PATHS)),
            "indexing_policy": (properties or {}).get("indexing_policy"),
            "throughput": (properties or {}).get("throughput"),
        }
        with open(props_path, "w") as f:
            json.dump(props, f, indent=2)
    return container_data_path(account_root, database, container)
