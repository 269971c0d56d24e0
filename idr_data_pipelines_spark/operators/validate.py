"""Data-quality validation: declarative expectation checks compiled
into ONE aggregation pass per table.

The reference loads daily extracts into the warehouse with no explicit
QA gate; production warehouse loads put one between staging and
publish. This module provides the standard expectation classes —
completeness (null fraction), uniqueness, value ranges, set
membership, row count — evaluated the only way that survives 100 TB:
every check on a table is compiled to a conditional aggregate inside a
**single** ``agg()`` (one scan, one partial-agg shuffle of exactly one
row per partition), never one job per rule. Referential integrity is
the one exception — it needs the dimension side, and is a broadcast
anti-join count when the dimension is small.

Output is a tidy report: ``(table, rule, column, metric, threshold,
passed)`` — union across tables, trivially sinkable next to the load.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` ∈ {not_null, unique, min, max, in_set,
    row_count_min, custom}; ``threshold`` is the allowed violation
    fraction for not_null/in_set/custom (0.0 = none), the bound value
    for min/max/row_count_min."""

    kind: str
    column: str | None = None
    threshold: float | None = None
    values: tuple = field(default=())
    predicate: Column | None = None
    name: str | None = None

    @property
    def rule_name(self) -> str:
        return self.name or f"{self.kind}({self.column or '*'})"


def not_null(column: str, max_null_frac: float = 0.0) -> Rule:
    return Rule("not_null", column, max_null_frac)


def unique(column: str) -> Rule:
    return Rule("unique", column, 0.0)


def col_min(column: str, bound: float) -> Rule:
    return Rule("min", column, bound)


def col_max(column: str, bound: float) -> Rule:
    return Rule("max", column, bound)


def in_set(column: str, values: list, max_out_frac: float = 0.0) -> Rule:
    return Rule("in_set", column, max_out_frac, values=tuple(values))


def row_count_min(bound: int) -> Rule:
    return Rule("row_count_min", None, float(bound))


def custom(
    name: str,
    predicate: Column,
    max_fail_frac: float = 0.0,
    column: str | None = None,
) -> Rule:
    """Arbitrary boolean predicate over the row; NULL counts as fail.
    ``column`` only labels the report row (the predicate may span any
    columns) — e.g. a referential-integrity rule over a pre-joined hit
    marker labels the fact key it checks."""
    return Rule("custom", column, max_fail_frac, predicate=predicate, name=name)


def _frac(cond: Column) -> Column:
    """Fraction of rows violating ``cond`` (NULL-safe: NULL = violate).

    SUM over zero rows is NULL, so the violation sum is coalesced to 0:
    an empty table scores 0.0 and the report row passes/fails
    deterministically instead of emitting metric=NULL / passed=NULL
    (emptiness itself is ``row_count_min``'s job to catch)."""
    n = F.count(F.lit(1))
    bad = F.coalesce(
        F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)), F.lit(0)
    )
    return bad.cast("double") / F.greatest(n, F.lit(1)).cast("double")


def validate(df: DataFrame, rules: list[Rule], table: str = "df") -> DataFrame:
    """Evaluate every rule in ONE aggregation over ``df`` and return
    the tidy report frame. Uniqueness uses ``count - count_distinct``
    (exact; swap for approx_count_distinct at extreme cardinality)."""
    if not rules:
        # a dynamically-assembled empty rule set otherwise surfaces as
        # a bare AssertionError from inside df.agg() (r10 review) —
        # and nothing under `python -O`
        raise ValueError("validate: rules must be non-empty")
    aggs: list[Column] = []
    for i, r in enumerate(rules):
        c = F.col(r.column) if r.column else None
        if r.kind == "not_null":
            m = _frac(c.isNull())
        elif r.kind == "unique":
            m = (F.count(c) - F.count_distinct(c)).cast("double")
        elif r.kind == "min":
            m = F.min(c).cast("double")
        elif r.kind == "max":
            m = F.max(c).cast("double")
        elif r.kind == "in_set":
            m = _frac(~c.isin(list(r.values)))
        elif r.kind == "row_count_min":
            m = F.count(F.lit(1)).cast("double")
        elif r.kind == "custom":
            m = _frac(~r.predicate)
        else:
            raise ValueError(f"unknown rule kind: {r.kind}")
        aggs.append(m.alias(f"m{i}"))

    row = df.agg(*aggs)
    reports = []
    for i, r in enumerate(rules):
        m = F.col(f"m{i}")
        if r.kind in ("not_null", "in_set", "custom"):
            passed = m <= F.lit(float(r.threshold))
        elif r.kind == "unique":
            passed = m <= F.lit(0.0)
        elif r.kind == "min":
            passed = m >= F.lit(float(r.threshold))
        elif r.kind == "max":
            passed = m <= F.lit(float(r.threshold))
        else:  # row_count_min
            passed = m >= F.lit(float(r.threshold))
        # a null metric (min/max over an EMPTY or all-null table)
        # must FAIL, not float through as passed=NULL — a null-unaware
        # gate (`filter(~passed)`) reads NULL as not-failed and waves
        # an empty load through, the one thing a data-quality checker
        # exists to stop (r09 review)
        reports.append(
            F.struct(
                F.lit(table).alias("table"),
                F.lit(r.rule_name).alias("rule"),
                F.lit(r.column).cast("string").alias("column"),
                m.alias("metric"),
                F.lit(r.threshold).cast("double").alias("threshold"),
                F.coalesce(passed, F.lit(False)).alias("passed"),
            )
        )
    return row.select(
        F.explode(F.array(*reports)).alias("r")
    ).select("r.*")


def referential_integrity(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    table: str = "fact",
    max_orphan_frac: float = 0.0,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Orphan-key check: fraction of fact rows whose ``fact_key`` has
    no match in ``dim`` (NULL keys count as orphans). Fully lazy — a
    broadcast left join plus one aggregation, so it composes into the
    same report union as ``validate`` without driver-side actions."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct().withColumn(
        "__hit", F.lit(1)
    )
    if broadcast_dim:
        keys = F.broadcast(keys)
    marked = fact.select(fact_key).join(keys, fact_key, "left")
    return marked.agg(_frac(F.col("__hit").isNull()).alias("metric")).select(
        F.lit(table).alias("table"),
        F.lit(f"ref_integrity({fact_key})").alias("rule"),
        F.lit(fact_key).alias("column"),
        F.col("metric"),
        F.lit(float(max_orphan_frac)).alias("threshold"),
        (F.col("metric") <= F.lit(float(max_orphan_frac))).alias("passed"),
    )
