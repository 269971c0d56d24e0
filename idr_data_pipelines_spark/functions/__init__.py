"""Scalar expression layer — BigQuery-compatible helpers.

Every helper returns a ``pyspark.sql.Column`` built from built-in
functions (JVM-side, whole-stage codegen); no Python UDFs.
"""

from idr_data_pipelines_spark.functions.casts import bq_cast, safe_cast
from idr_data_pipelines_spark.functions.dates import (
    bq_date_diff,
    extract_part,
    format_date,
    as_of_date,
)
from idr_data_pipelines_spark.functions.cases import (
    case_map,
    case_flag,
    case_bucket,
    null_default,
    str_sentinel_decode,
)
from idr_data_pipelines_spark.functions.normalize import null_normalize

__all__ = [
    "bq_cast",
    "safe_cast",
    "bq_date_diff",
    "extract_part",
    "format_date",
    "as_of_date",
    "case_map",
    "case_flag",
    "case_bucket",
    "null_default",
    "str_sentinel_decode",
    "null_normalize",
]
