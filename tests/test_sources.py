"""Source-layer tests: multi-file directory reads (the reference's
``source_objects=['*']``), all-string staging, and null normalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from idr_data_pipelines_spark.sources import (
    read_parquet_all_string,
    read_parquet_dir,
)


def test_read_parquet_dir_unions_all_files(spark, sf_dir, tmp_path):
    """A directory of parquet files reads as one table (implicit
    UNION ALL, schema from footers) — dags/idr_load.py:83-114."""
    lake = str(tmp_path / "lake")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    # three "daily drops" into the same prefix
    for i in range(3):
        orders.limit(0).union(orders).coalesce(1).write.mode("append").parquet(lake)
    df = read_parquet_dir(spark, lake)
    assert df.count() == 3 * n
    assert df.schema == orders.schema


def test_read_parquet_dir_handles_partitioned_layout(spark, tmp_path):
    """Hive-partitioned datasets (files in k=v subdirectories) must
    read with partition discovery — a dir/*.parquet glob would miss
    them entirely."""
    lake = str(tmp_path / "plake")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], ["k", "v", "dt"]
    )
    df.write.partitionBy("dt").parquet(lake)
    back = read_parquet_dir(spark, lake)
    assert back.count() == 2
    assert "dt" in back.columns  # partition column discovered


def test_all_string_staging_and_null_normalize(spark, tmp_path):
    """The pandas-loader parity path: every column stringified, exact
    dups dropped, literal 'None' → real NULL
    (deps/parquet_solution.py:75-84)."""
    src = str(tmp_path / "staging")
    rows = [(1, "a", None), (1, "a", None), (2, "None", 3.5)]
    spark.createDataFrame(rows, ["k", "s", "v"]).write.parquet(src)
    df = read_parquet_all_string(spark, src)
    assert dict(df.dtypes) == {"k": "string", "s": "string", "v": "string"}
    got = sorted([tuple(r) for r in df.collect()])
    # dedup dropped the duplicate; "None" (from the source string and
    # from stringified NULL) normalized back to NULL
    assert got == [("1", "a", None), ("2", None, "3.5")]
