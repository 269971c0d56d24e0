"""Deduplication operators — the reference's signature operation.

SURVEY.md §2.2. Four shapes:

- ``dedup_distinct`` ≙ ``SELECT DISTINCT *`` opening every transform
  chain (dags/covid_transforms.py:41-54, hts:42-55, vls:40-52,
  mmd:259-270).
- ``dedup_groupby_max`` ≙ entity-level dedup via ``GROUP BY keys`` +
  ``MAX`` of every other column (dags/mmd_transforms.py:74-96).
- ``dedup_latest_per_key`` — greatest-row-per-group via a window
  (the blessed API; SURVEY.md §2.6).
- ``dedup_join_back_on_max`` ≙ the reference's join-back form with its
  exact fan-out-on-ties semantics (dags/vls_transforms.py:84-117).

Scale notes: all four are single-shuffle hash aggregates / window
sorts on the dedup key. For skewed entity keys (one mega-facility),
AQE skew handling covers joins; for the groupBy paths Spark's partial
(map-side) aggregation bounds the shuffle. ``dedup_latest_per_key``
shuffles once on the key and sorts within partitions — prefer it over
join-back (two shuffles) everywhere the fan-out semantics aren't
contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_distinct(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact-row dedup: ``SELECT DISTINCT *`` (or on a column subset)."""
    if subset:
        return df.dropDuplicates(subset)
    return df.distinct()


def dedup_groupby_max(df: DataFrame, keys: list[str]) -> DataFrame:
    """One row per key, MAX of every non-key column.

    Mirrors ``deduplicate_ART`` (dags/mmd_transforms.py:74-96): BigQuery
    MAX works on any orderable type and so does Spark's — strings,
    dates, numerics. The reference wraps the GROUP BY in an outer
    ``SELECT DISTINCT *``, a no-op after grouping; we keep the single
    aggregate. One shuffle, map-side partial max first.

    The dedup-flavored name for ``agg_groupby_max_all`` — one
    implementation, two §2 inventory entries (SURVEY §2.2 vs §2.5).
    """
    from idr_data_pipelines_spark.operators.aggregate import agg_groupby_max_all

    return agg_groupby_max_all(df, keys)


def dedup_latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_by: list,
) -> DataFrame:
    """Keep the single latest row per key (window row_number == 1).

    ``order_by`` are descending-priority Columns (pass explicit
    tie-breakers for determinism, e.g. ``[F.col("d").desc(),
    F.col("id").desc()]``). This is the idiomatic Spark form of the
    reference's group-max + join-back (dags/vls_transforms.py:84-117)
    without its tie fan-out: exactly one row per key, one shuffle.
    """
    from idr_data_pipelines_spark.operators.joins import _reserve

    _reserve("__rn", "dedup_latest_per_key", df)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_join_back_on_max(
    df: DataFrame,
    group_keys: list[str],
    max_col: str,
    join_keys: list[str] | None = None,
) -> DataFrame:
    """Reference-exact greatest-n-per-group: aggregate MAX(max_col) per
    ``group_keys``, join back to the detail on ``join_keys`` (defaults
    to ``group_keys``) and keep rows where the detail value equals the
    max. Ties fan out — and when ``join_keys ⊂ group_keys`` the join
    fans out across groups too, faithfully reproducing
    ``single_patient_records`` joining on ``ccc_number`` alone
    (dags/vls_transforms.py:106-109, SURVEY.md §2.11).
    """
    join_keys = join_keys or group_keys
    agg = df.groupBy(*group_keys).agg(F.max(max_col).alias("__max_val"))
    agg = agg.select(*[F.col(k).alias(f"__k_{k}") for k in join_keys], "__max_val")
    cond = [df[k] == agg[f"__k_{k}"] for k in join_keys]
    out = df.join(agg, cond, "left").filter(F.col(max_col) == F.col("__max_val"))
    return out.drop("__max_val", *[f"__k_{k}" for k in join_keys])
