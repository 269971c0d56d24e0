"""CASE-expression builders.

The reference's transforms are dominated by four CASE shapes
(SURVEY.md §2.7): value-recode maps (dags/hts_transforms.py:104-117,
131-144), boolean flags (dags/mmd_transforms.py:172-180,
dags/covid_transforms.py:79-82), numeric range buckets
(dags/hts_transforms.py:189-202, dags/vls_transforms.py:180-191) and
null-defaulting (dags/covid_transforms.py:93-118). Each becomes a
chained ``F.when`` — one Catalyst expression, fully codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def case_map(
    col: Column | str,
    mapping: dict[str, object],
    default: object | Column | None = None,
    default_to_input: bool = False,
) -> Column:
    """Value recode: ``CASE WHEN col = k THEN v ... END``.

    ``default_to_input=True`` passes unknown values through (the
    reference's entrypoint recode keeps unmatched raw strings,
    dags/hts_transforms.py:104-117). With neither default, unmatched
    rows are NULL — matching SQL CASE without ELSE.

    For very large recode tables prefer a broadcast mapping join; a
    ``when``-chain of thousands of branches stresses codegen.
    """
    c = _c(col)
    expr: Column | None = None
    for k, v in mapping.items():
        cond = c == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    if expr is None:
        raise ValueError("empty mapping")
    if default_to_input:
        return expr.otherwise(c)
    if default is not None:
        return expr.otherwise(default)
    return expr


def case_flag(
    cond: Column,
    if_true: object = 1,
    if_false: object = 0,
) -> Column:
    """Boolean flag: ``CASE WHEN cond THEN a ELSE b END``."""
    return F.when(cond, if_true).otherwise(if_false)


def case_bucket(
    col: Column | str,
    buckets: Sequence[tuple[Column, object]],
    default: object | None = None,
) -> Column:
    """Ordered condition buckets: first match wins.

    ``buckets`` are (condition, label) pairs evaluated top-down.
    With ``default=None`` uncovered rows yield NULL — this matters:
    the reference's ``vl_suppression`` CASE intentionally leaves
    combinations uncovered (dags/vls_transforms.py:181-185,
    SURVEY.md §2.11), and we preserve that.
    """
    expr: Column | None = None
    for cond, label in buckets:
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    if expr is None:
        raise ValueError("empty buckets")
    return expr if default is None else expr.otherwise(default)


def null_default(col: Column | str, default: object = "Unknown") -> Column:
    """``CASE WHEN col IS NULL THEN default ELSE col END`` ≡ COALESCE
    (dags/covid_transforms.py:93-118)."""
    return F.coalesce(_c(col), F.lit(default))


def str_sentinel_decode(
    col: Column | str,
    sentinels: dict[str, object],
    cast_to: str = "decimal(38,9)",
    strict: bool = False,
) -> Column:
    """Special-value decode then numeric cast: ``CASE WHEN col = 'LDL'
    THEN 0 ELSE CAST(col AS DECIMAL) END`` (dags/vls_transforms.py:
    187-190).

    ``strict=True`` mirrors BigQuery ``CAST`` — a non-sentinel,
    non-null, unparseable string fails the job loudly (the reference's
    behavior: a bad ``vl_test_result`` kills the BQ load rather than
    silently nulling a viral-load reading). ``strict=False`` is
    ``SAFE_CAST`` tolerance: unparseable → NULL (try_cast)."""
    c = _c(col)
    expr: Column | None = None
    for k, v in sentinels.items():
        cond = c == k
        expr = F.when(cond, F.lit(v).cast(cast_to)) if expr is None else expr.when(cond, F.lit(v).cast(cast_to))
    if expr is None:
        raise ValueError("empty sentinels")
    tried = c.try_cast(cast_to)
    if strict:
        return expr.when(
            c.isNotNull() & tried.isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"str_sentinel_decode: cast to {cast_to} failed for value: "),
                    c,
                )
            ).cast(cast_to),
        ).otherwise(tried)
    return expr.otherwise(tried)
