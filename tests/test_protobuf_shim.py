"""Direct coverage for protobuf_shim (round 9) — the TWS parity tests
cover it end-to-end; these pin the unit-level contract."""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_install_succeeds_and_is_idempotent():
    from sync_cosmos_db_spark.protobuf_shim import install_protobuf_alias

    assert install_protobuf_alias() is True
    # second call must be a cheap no-op (real-import branch) and
    # must not stack a second meta-path finder
    import sys as _sys

    finders_before = len(_sys.meta_path)
    assert install_protobuf_alias() is True
    assert len(_sys.meta_path) == finders_before


def test_spark_tws_proto_roundtrips_under_alias():
    from sync_cosmos_db_spark.protobuf_shim import install_protobuf_alias

    assert install_protobuf_alias()
    from pyspark.sql.streaming.proto import StateMessage_pb2 as SM

    req = SM.StateRequest(version=3)
    b = req.SerializeToString()
    r2 = SM.StateRequest()
    r2.ParseFromString(b)
    assert r2.version == 3


def test_install_works_in_fresh_process_without_repo_imports():
    """The worker-side contract: the installer must be self-contained
    (cloudpickle ships the module by value), so it has to work in a
    bare interpreter with the repo on the path only to import the one
    module."""
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, "/root/repo")
        from sync_cosmos_db_spark.protobuf_shim import (
            install_protobuf_alias,
        )
        assert install_protobuf_alias() is True
        import google.protobuf.descriptor  # noqa: F401
        from google.protobuf import runtime_version
        runtime_version.ValidateProtobufRuntimeVersion(
            runtime_version.Domain.PUBLIC, 5, 29, 0, "", "probe")
        print("SHIM_OK")
    """)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SHIM_OK" in out.stdout
