"""Date/time expressions with BigQuery boundary semantics.

SURVEY.md §2.7: the reference uses ``DATE_DIFF(a, b, unit)``
(dags/hts_transforms.py:84, dags/mmd_transforms.py:102-104,158,
dags/vls_transforms.py:167), ``EXTRACT`` (dags/hts_transforms.py:85-90),
``FORMAT_DATETIME`` (dags/mmd_transforms.py:218-222) and
``CURRENT_DATE`` (dags/mmd_transforms.py:158).

Key semantic gap: BigQuery ``DATE_DIFF`` counts *unit boundaries
crossed*, not elapsed intervals — ``DATE_DIFF('2024-02-01',
'2024-01-31', MONTH) = 1`` even though only one day elapsed. Spark's
``months_between`` returns fractional elapsed months, so MONTH/YEAR/
QUARTER/WEEK are computed from extracted parts instead.

``CURRENT_DATE`` is deliberately *not* wall-clock here: operators take
an injected as-of date (``as_of_date``) so runs are deterministic and
testable (SURVEY.md §5 determinism guard).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bq_date_diff(a: Column | str, b: Column | str, unit: str) -> Column:
    """BigQuery ``DATE_DIFF(a, b, unit)`` = boundaries of ``unit``
    between ``b`` (earlier) and ``a`` (later); negative when a < b."""
    a, b = _c(a), _c(b)
    unit = unit.strip().upper()
    if unit == "DAY":
        return F.datediff(a, b)
    if unit == "WEEK":
        # BQ weeks start Sunday; count Sunday boundaries crossed.
        # floor(days_from_epoch_sunday/7) difference. 1970-01-04 was a Sunday.
        anchor = F.lit("1970-01-04")
        return (F.floor(F.datediff(a, anchor) / 7) - F.floor(F.datediff(b, anchor) / 7)).cast("int")
    if unit == "MONTH":
        return ((F.year(a) - F.year(b)) * 12 + (F.month(a) - F.month(b))).cast("int")
    if unit == "QUARTER":
        return ((F.year(a) - F.year(b)) * 4 + (F.quarter(a) - F.quarter(b))).cast("int")
    if unit == "YEAR":
        return (F.year(a) - F.year(b)).cast("int")
    raise ValueError(f"unsupported DATE_DIFF unit: {unit}")


def extract_part(col: Column | str, part: str) -> Column:
    """BigQuery ``EXTRACT(part FROM d)`` → INT64."""
    c = _c(col)
    part = part.strip().upper()
    if part == "WEEK":
        # BQ WEEK is Sunday-based with week 0 before the year's first
        # Sunday — NOT Spark's ISO weekofyear, which disagrees wildly
        # (EXTRACT(WEEK FROM '2023-01-01') is 1 in BQ, 52 in ISO —
        # r09 review; the old mapping shipped the ISO number under a
        # BQ contract). Same Sunday-anchor arithmetic as bq_date_diff.
        d = F.to_date(c)
        jan1 = F.trunc(d, "year")
        first_sunday = F.date_add(jan1, (F.lit(8) - F.dayofweek(jan1)) % 7)
        return (
            F.when(d < first_sunday, F.lit(0))
            .otherwise(F.floor(F.datediff(d, first_sunday) / 7) + 1)
            .cast("long")
        )
    fns = {
        "YEAR": F.year,
        "QUARTER": F.quarter,
        "MONTH": F.month,
        "DAY": F.dayofmonth,
        "HOUR": F.hour,
        "MINUTE": F.minute,
        "SECOND": F.second,
        "DAYOFYEAR": F.dayofyear,
    }
    if part not in fns:
        raise ValueError(f"unsupported EXTRACT part: {part}")
    return fns[part](c).cast("long")


# BigQuery FORMAT_DATETIME strftime directives → JVM DateTimeFormatter.
_FMT_MAP = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%B": "MMMM",
    "%b": "MMM",
    "%A": "EEEE",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
}


def format_date(col: Column | str, fmt: str) -> Column:
    """BigQuery ``FORMAT_DATETIME(fmt, d)`` for the directives the
    reference uses ("%Y" → "2022", "%B" → "January";
    dags/mmd_transforms.py:218-222) plus the common ones.

    In strftime, non-% characters are literals; in the JVM pattern
    language, bare letters are pattern letters — so literal runs
    containing letters are single-quoted (e.g. ``%H:%M:%ST%d`` keeps
    the ``T`` literal instead of hitting an unsupported pattern).
    """
    import re as _re

    parts: list[str] = []
    i = 0
    literal = ""

    def flush() -> None:
        nonlocal literal
        if literal:
            if _re.search(r"[A-Za-z']", literal):
                parts.append("'" + literal.replace("'", "''") + "'")
            else:
                parts.append(literal)
            literal = ""

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            directive = fmt[i : i + 2]
            if directive == "%%":
                literal += "%"
                i += 2
                continue
            if directive not in _FMT_MAP:
                raise ValueError(f"unsupported FORMAT_DATETIME directive: {directive}")
            flush()
            parts.append(_FMT_MAP[directive])
            i += 2
        else:
            literal += fmt[i]
            i += 1
    flush()
    return F.date_format(_c(col), "".join(parts))


def as_of_date(value: str | _dt.date | None = None) -> Column:
    """Injectable CURRENT_DATE. Pass a fixed date for deterministic
    runs/tests; ``None`` falls back to the session's current_date."""
    if value is None:
        return F.current_date()
    if isinstance(value, _dt.date):
        value = value.isoformat()
    return F.to_date(F.lit(value))
