"""Projection operators.

SURVEY.md §2.3: wide rename-projections (dags/hts_transforms.py:60-67,
covid:59-63, mmd:193-201) and ``SELECT *, expr AS name`` derived-column
appends (pervasive). Both are pure Catalyst projections — column
pruning pushes the select into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project_rename(df: DataFrame, mapping: dict[str, str | Column]) -> DataFrame:
    """Select + rename: ``{new_name: old_name_or_Column}``.

    ``SELECT Staging.CccNumber AS ccc_number, ...`` analogue.
    """
    cols = []
    for new, old in mapping.items():
        c = F.col(old) if isinstance(old, str) else old
        cols.append(c.alias(new))
    return df.select(*cols)


def project_star_plus(df: DataFrame, derived: dict[str, Column]) -> DataFrame:
    """``SELECT *, expr1 AS n1, expr2 AS n2`` — append derived columns.

    Uses a single ``withColumns`` call (one projection node) rather
    than chained ``withColumn`` (which stacks analyzer passes).
    """
    return df.withColumns(derived)
