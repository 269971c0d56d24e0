"""Casts with BigQuery-compatible semantics.

The reference types its staging tables with explicit ``CAST``s
(idr_pipeline_from_server/dags/mmd_transforms.py:55-63,
dags/vls_transforms.py:189). Semantic gaps handled here (SURVEY.md §2.7
``expr_cast``):

- BigQuery ``CAST`` *errors* on malformed input; Spark's ``cast``
  returns null. ``bq_cast`` mirrors the strict behavior via
  ``try_cast`` + an explicit raise, so bad rows fail loudly like a BQ
  job would; ``safe_cast`` is BigQuery's ``SAFE_CAST`` (null on error),
  which is Spark's native behavior but spelled with ``try_cast`` so the
  intent is explicit and ANSI-mode-proof.
- BigQuery ``INT64``/``NUMERIC`` map to ``bigint`` / ``decimal(38,9)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BigQuery type name → Spark type name.
_BQ_TYPE_MAP = {
    "INT": "bigint",
    "INT64": "bigint",
    "INTEGER": "bigint",
    "FLOAT64": "double",
    "FLOAT": "double",
    "NUMERIC": "decimal(38,9)",
    "DECIMAL": "decimal(38,9)",
    "BIGNUMERIC": "decimal(38,18)",
    "STRING": "string",
    "DATE": "date",
    "DATETIME": "timestamp_ntz",
    "TIMESTAMP": "timestamp",
    "BOOL": "boolean",
    "BOOLEAN": "boolean",
}


def spark_type_for(bq_type: str) -> str:
    return _BQ_TYPE_MAP.get(bq_type.strip().upper(), bq_type)


def safe_cast(col: Column | str, bq_type: str) -> Column:
    """BigQuery ``SAFE_CAST``: null on malformed input."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(spark_type_for(bq_type))


def bq_cast(col: Column | str, bq_type: str, strict: bool = True) -> Column:
    """BigQuery ``CAST``: error on malformed (non-null) input.

    Implemented as: if the input is non-null but ``try_cast`` yields
    null, raise — matching a failed BQ job. ``strict=False`` degrades
    to ``safe_cast`` for pipelines that prefer Spark-native tolerance.
    """
    c = F.col(col) if isinstance(col, str) else col
    if not strict:
        return safe_cast(c, bq_type)
    t = spark_type_for(bq_type)
    tried = c.try_cast(t)
    return F.when(
        c.isNotNull() & tried.isNull(),
        F.raise_error(F.concat(F.lit(f"bq_cast to {bq_type} failed for value: "), c)),
    ).otherwise(tried)


def assign_types(mapping: dict[str, str]) -> list[Column]:
    """Column list for a typed re-cast stage.

    The analogue of the reference's ``assign_appropriate_data_types``
    (dags/mmd_transforms.py:52-72): the all-string staging table gets
    its real types back in one projection. Returns aliased columns for
    use in ``df.select(*assign_types({...}), *passthrough)``.
    """
    return [safe_cast(name, bq_type).alias(name) for name, bq_type in mapping.items()]
