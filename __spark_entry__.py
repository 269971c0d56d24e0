"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``idr_data_pipelines_spark.queries``; see
SURVEY.md §2 for the operator inventory each entry corresponds to.
Since r11 EVERY entry carries an oracle: hash-based/approximate
operators (MinHash-LSH, SimHash, LSH-ANN, DataSketches, best-fit
packing) register invariant-summary forms — the full algorithm runs,
then reduces to exact input-derived anchors + 0/1 contract flags the
SQL oracle recomputes independently — while their deterministic
md5/fixed twins keep full row-set oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from idr_data_pipelines_spark.queries import NO_ORACLE, ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The MMD-shaped warehouse chain (SURVEY.md §7.4): dedup →
    latest-per-key window → broadcast dim joins → as-of date arithmetic
    → CASE bucketing → warehouse projection.
    """
    return QUERIES["flagship_warehouse"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + llmdata."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for EVERY query (since r11)."""
    assert set(ORACLES) | NO_ORACLE == set(QUERIES)
    return dict(ORACLES)
