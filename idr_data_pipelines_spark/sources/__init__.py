"""IO layer: parquet directory sources, table sinks, catalog."""

from idr_data_pipelines_spark.sources.parquet import (
    read_parquet_dir,
    spread_small_scan,
    read_parquet_all_string,
)
from idr_data_pipelines_spark.sources.text_formats import (
    read_csv_dir,
    read_csv_all_string,
    read_json_dir,
    read_text_lines,
    write_text_lines,
)
from idr_data_pipelines_spark.sources.sinks import (
    sink_table_overwrite,
    sink_rows_append,
    compact_parquet_dir,
    sink_parquet_overwrite,
    sink_table_bucketed,
)
from idr_data_pipelines_spark.sources.catalog import Catalog

__all__ = [
    "read_parquet_dir",
    "spread_small_scan",
    "read_parquet_all_string",
    "read_csv_dir",
    "read_csv_all_string",
    "read_json_dir",
    "read_text_lines",
    "write_text_lines",
    "sink_table_overwrite",
    "sink_rows_append",
    "compact_parquet_dir",
    "sink_parquet_overwrite",
    "sink_table_bucketed",
    "Catalog",
]
