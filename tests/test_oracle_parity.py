"""Differential tests: every oracle-backed query must match DuckDB
exactly (row count + schema + order-insensitive values) at sf0.001.

This mirrors the driver's t2 correctness gate; any failure here would
fail CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from idr_data_pipelines_spark.queries import NO_ORACLE, ORACLES, QUERIES

from .oracle_harness import compare, duck_connection

ORACLE_KEYS = sorted(ORACLES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.fixture(autouse=True)
def _no_lingering_streams(spark):
    """Every streaming query in the catalog is Trigger.AvailableNow
    and awaits termination, but a failed assertion mid-test can leave
    one active; a stray active stream holds the py4j callback server
    and has been observed wedging a LATER streaming test's
    foreachBatch under load. Stop leftovers after every test."""
    yield
    for q in spark.streams.active:
        try:
            q.stop()
        except Exception:
            pass


def test_registry_consistency():
    assert set(ORACLES) | NO_ORACLE == set(QUERIES)
    assert not (set(ORACLES) & NO_ORACLE)
    # NO_ORACLE has been empty since r11 — every registry entry is
    # fully oracled. Pin that instead of parameterizing a rows-only
    # test over the empty set, which reported a permanent "1 skipped"
    # that would camouflage a future REAL skip (r13 VERDICT item 1).
    # If a genuinely non-SQL-expressible entry ever lands, delete this
    # assert and restore a rows-only test parameterized over NO_ORACLE.
    assert not NO_ORACLE


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    res = compare(df, duck, ORACLES[name])
    assert res["rowcount_match"], f"{name}: rows {res['rows_spark']} vs {res['rows_oracle']}"
    assert res["schema_match"], f"{name}: cols {res['cols_spark']} vs {res['cols_oracle']}"
    assert res["values_match"], f"{name}: first diff {res['first_diff']}"


