"""Slowly-changing-dimension (SCD type 2) history building.

The reference's warehouse keeps only latest-state tables (group-max /
latest-per-key dedup, SURVEY.md §2.2); a real warehouse also needs the
inverse — the full change history with validity intervals. Both
operators here are pure window compositions (no iteration, no state),
so they are exactly SQL-expressible and oracle-checked, and at scale
they cost one hash shuffle on the business key.

``scd2_from_events`` builds the history from an event log (the shape a
CDC feed or the reference's daily extracts produce): collapse
consecutive rows whose tracked attributes did not change, then derive
``valid_from``/``valid_to``/``is_current`` per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_events(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Event log → SCD2 history: one row per (key, attribute-state
    run), valid from the first event of the run until the next change
    (``valid_to`` NULL ⇒ still current).

    Change detection compares every tracked attribute against its
    predecessor with null-safe equality (``eqNullSafe`` — a NULL→value
    or value→NULL transition IS a change; plain ``=`` would silently
    drop it). Ties on ``ts_col`` are broken by the attribute tuple so
    the run assignment is deterministic.

    Plan: two stacked windows over the same (key × ts) ordering — one
    hash shuffle, one sort, both windows evaluated in a single Window
    node chain; no join, no second pass over the data.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc_nulls_first() for c in attr_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed: Column = F.lit(False)
    for c in attr_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~F.col(c).eqNullSafe(prev)
    # the first row of each key has lag()=NULL for every attribute:
    # eqNullSafe makes a genuinely-NULL first attribute look unchanged,
    # so force row_number()==1 to open a run
    first_row = F.row_number().over(w) == 1
    starts = df.withColumn("__new_run", first_row | changed)

    runs = starts.withColumn(
        "__run_id", F.sum(F.col("__new_run").cast("int")).over(w)
    )
    # one row per run: earliest ts opens the validity interval
    per_run = runs.groupBy(*key_cols, "__run_id", *attr_cols).agg(
        F.min(ts_col).alias(valid_from_col)
    )
    w_runs = Window.partitionBy(*key_cols).orderBy(F.col("__run_id").asc())
    return (
        per_run.withColumn(
            valid_to_col, F.lead(F.col(valid_from_col)).over(w_runs)
        )
        .withColumn(current_col, F.col(valid_to_col).isNull())
        .drop("__run_id")
    )
