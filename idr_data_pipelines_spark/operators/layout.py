"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Parquet/lake readers prune files and row groups on per-column min/max
statistics; a table range-partitioned on ONE key prunes only that
key's predicates. Interleaving the bits of several columns into one
Morton value and range-writing on it gives every interleaved column
locality — the technique behind lakehouse OPTIMIZE ZORDER — so a scan
filtered on ANY of the z-ordered dimensions skips most files. All
plain integer bit arithmetic: deterministic, engine-portable,
JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer columns
    (each truncated to ``bits`` low bits): output bit ``i*N + j`` is
    bit ``i`` of column ``j``. Pure integer projection; callers map
    arbitrary domains onto [0, 2^bits) first (e.g. ``pmod`` of a key,
    days-since-epoch of a date, a rank bucket)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[Column],
    n_files: int = 32,
    fmt: str = "parquet",
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Morton value of ``zcols``:
    range-repartition on the z-value (sampled range boundaries — the
    standard total-order exchange) and sort within each partition, so
    every output file covers a narrow hyper-rectangle of the z-space
    and its per-column min/max stats prune reads on ANY z-dimension.
    One range exchange; the sort is per-file, not global.

    ``bits`` is the per-column interleave width passed to
    ``zorder_value`` (r10 review: without the pass-through, 4+
    z-columns ALWAYS raised — 4×16 > 63 signed-long bits — with no
    way through this write API to lower the width; pass bits=15 for
    4 columns, 12 for 5)."""
    from idr_data_pipelines_spark.operators.joins import _reserve

    _reserve("__z", "write_zordered", df)
    z = zorder_value(zcols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def minmax_scale_bits(
    col: Column | str, cmin: float, cmax: float, bits: int = 16
) -> Column:
    """Scale a numeric column onto the FULL [0, 2^bits) range from
    known (or estimated) min/max. Interleaving only works when every
    dimension occupies comparable bit widths: an 8-bit-wide column
    interleaved with a 12-bit-wide one contributes nothing to the
    high Morton bits, so range partitioning degenerates to
    single-column clustering on the wider dimension. Scale first."""
    c = F.col(col) if isinstance(col, str) else col
    span = float(cmax - cmin)
    if span <= 0:
        return F.lit(0).cast("long")
    top = float((1 << bits) - 1)
    # clamp BOTH ends: min/max may be estimates, and a value below
    # cmin would go negative — zorder_value's arithmetic shiftright
    # would sign-extend it into all-ones Morton bits, poisoning the
    # file min/max stats the layout exists for
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(int(top)).cast("long"),
            F.floor(
                (c.cast("double") - F.lit(float(cmin))) / F.lit(span) * F.lit(top + 1.0)
            ).cast("long"),
        ),
    )
