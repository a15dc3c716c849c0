"""Registry-wide oracle-parity sweep (round-7 verdict item 8): the
judge-style DuckDB compare over EVERY oracle-bearing registered query in
one pytest session, chunked so (a) a failure in one chunk still reports
every failing query in that chunk, and (b) pytest-xdist workers can
split the chunks.  Each chunk asserts a runtime budget.

THIS MODULE SWEEPS AT sf0.01 BY DEFAULT — the driver's correctness
scale (round-9 verdict item 3: the effective_rate_revenue cent flip was
invisible at sf0.001, where reorder error never reaches the rounding
grids).  The rest of the suite stays on the conftest default (sf0.001);
override this module alone with SPARK_GRAFT_TEST_SF_DIR.

This file is the ONE place the full per-query sweep runs;
tests/test_oracle.py keeps the structural invariants (sweep-window
computation, entry smoke, README counts) and the rows-only queries'
execution smoke.
"""

from __future__ import annotations

import time

import pytest

from tests.oracle_utils import compare, duckdb_connect

import __spark_entry__ as entrymod

N_CHUNKS = 4
# sf0.001 CI budget; larger-SF sweeps (SPARK_GRAFT_TEST_SF_DIR) get
# proportionally more — the point of those runs is value fidelity at the
# scale where reorder-precision bugs manifest, not wall-clock.  Override
# with SPARK_GRAFT_SWEEP_BUDGET_SEC (the sf0.1 sweep needs it).
import os as _os  # noqa: E402

CHUNK_BUDGET_SEC = float(_os.environ.get(
    "SPARK_GRAFT_SWEEP_BUDGET_SEC",
    600.0 if "SPARK_GRAFT_TEST_SF_DIR" not in _os.environ else 1200.0))

#: the sweep's own scale factor: the driver checks at sf0.01, so the
#: committed sweep must too (env-overridable for sf0.1 spot sweeps)
SWEEP_SF_DIR = _os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                               "/root/testdata/sf0.01")

_Q = entrymod.queries()
_O = entrymod.oracle_sql()
NAMES = sorted(_O)
CHUNKS = [NAMES[i::N_CHUNKS] for i in range(N_CHUNKS)]


@pytest.fixture(scope="module")
def sweep_sf_dir():
    return SWEEP_SF_DIR


@pytest.fixture(scope="module")
def con(sweep_sf_dir):
    c = duckdb_connect(sweep_sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("chunk_id", range(N_CHUNKS))
def test_oracle_sweep_chunk(spark, sweep_sf_dir, con, chunk_id):
    t0 = time.monotonic()
    failures: list[str] = []
    for name in CHUNKS[chunk_id]:
        try:
            compare(_Q[name](spark, sweep_sf_dir), con, _O[name], name=name)
        except Exception as exc:  # noqa: BLE001 — oracle mismatches AND
            # execution errors (AnalysisException, Py4JJavaError) must
            # both be COLLECTED, not abort the chunk mid-loop, so one
            # run reports every failing query (advisor r8 finding).
            failures.append(f"{name}: {type(exc).__name__}: "
                            f"{str(exc)[:400]}")
    elapsed = time.monotonic() - t0
    assert not failures, (
        f"chunk {chunk_id}: {len(failures)}/{len(CHUNKS[chunk_id])} "
        "queries diverged from their DuckDB oracles:\n"
        + "\n".join(failures))
    assert elapsed < CHUNK_BUDGET_SEC, (
        f"chunk {chunk_id} took {elapsed:.0f}s (> {CHUNK_BUDGET_SEC:.0f}s "
        f"budget) for {len(CHUNKS[chunk_id])} queries — the full sweep "
        "must stay under ~20 min; profile the slowest members")
