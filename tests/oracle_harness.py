"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a Spark query and its DuckDB oracle on the same parquet tables,
then compares row count, column-name schema, and an order-insensitive
canonical value comparison. Used by tests/test_oracle_parity.py so
oracle breakage is caught before the driver runs.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # bound DuckDB hard: its buffer manager allocates 256 KB blocks
    # that glibc serves as one mmap each, so a transient multi-GB
    # spike costs tens of thousands of memory mappings and races the
    # kernel's vm.max_map_count (65530 here). Crossing it makes
    # unrelated 16 KB mallocs and pthread_create fail process-wide
    # ("bad allocation" / "can't start new thread" — both observed in
    # long suite runs). The largest sf0.01 oracle peaks under 1 GB, so
    # 4 GB (≈16k blocks) keeps the whole process far from the map
    # limit; 8 threads bounds the number of concurrently-buffering
    # operators for the same reason.
    con.execute("SET memory_limit='4GB'")
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v: object) -> object:
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    projected = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(projected, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]

    result = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
        "rowcount_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "values_match": False,
        "first_diff": None,
    }
    if not (result["rowcount_match"] and result["schema_match"]):
        return result
    a = _sorted_rows(s_cols, s_rows)
    b = _sorted_rows(d_cols, d_rows)
    if a == b:
        result["values_match"] = True
        return result
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            result["first_diff"] = {"row": i, "spark": ra, "oracle": rb}
            break
    return result
