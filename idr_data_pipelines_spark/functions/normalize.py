"""Ingest-time null normalization.

The reference's pandas loader stringifies frames, which turns real
nulls into the literal string ``"None"``; it then replaces those with
NaN (dags/dependencies/parquet_solution.py:81-82). Spark analogue:
``df.na.replace`` over string columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def null_normalize(
    df: DataFrame,
    sentinels: tuple[str, ...] = ("None", "nan", "NaN", ""),
    columns: list[str] | None = None,
) -> DataFrame:
    """Replace string sentinel values with real nulls.

    Only string columns are touched (``na.replace`` is type-safe); the
    default sentinel set covers pandas stringification artifacts.
    """
    string_cols = [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    target = [c for c in (columns or string_cols) if c in string_cols]
    if not target:
        return df
    return df.na.replace(list(sentinels), None, subset=target)
