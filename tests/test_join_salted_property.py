"""Property test (hypothesis): ``join_salted`` is result-equivalent
to a plain equi-join for ANY input — duplicates, null keys, hot keys,
unmatched rows on either side, both inner and left — and the salt
actually spreads a hot key's rows across salts (the whole point of
the operator; a regression to a content-derived salt would pass the
equivalence check while silently re-melting the hot reducer).

The r10 retry-determinism rework (sortWithinPartitions before the
position-id salt) makes this worth pinning: the sort must change the
RESULT in no way, only the salt assignment's replay stability.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from idr_data_pipelines_spark.operators import join_salted

# small key space forces duplicates and hot keys; None exercises the
# null-key path (equi-join drops null keys on both sides)
_KEYS = st.one_of(st.none(), st.integers(min_value=0, max_value=4))


@given(
    left_keys=st.lists(_KEYS, min_size=0, max_size=25),
    right_keys=st.lists(_KEYS, min_size=0, max_size=8),
    how=st.sampled_from(["inner", "left"]),
    n_salts=st.sampled_from([1, 3, 8]),
)
@settings(max_examples=8, deadline=None)
def test_join_salted_equals_plain_join(
    spark, left_keys, right_keys, how, n_salts
):
    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)] or [(None, -1)],
        "k int, lv int",
    )
    right = spark.createDataFrame(
        [(k, i * 10) for i, k in enumerate(right_keys)] or [(None, -1)],
        "j int, rv int",
    )
    nones_last = lambda t: tuple(  # noqa: E731
        (v is None, 0 if v is None else v) for v in t
    )
    got = sorted(
        (
            (r["k"], r["lv"], r["rv"])
            for r in join_salted(left, right, "k", "j", n_salts, how)
            .select("k", "lv", "rv")
            .collect()
        ),
        key=nones_last,
    )
    want = sorted(
        (
            (r["k"], r["lv"], r["rv"])
            for r in left.join(right, left["k"] == right["j"], how)
            .select("k", "lv", "rv")
            .collect()
        ),
        key=nones_last,
    )
    assert got == want


def test_join_salted_spreads_hot_key(spark):
    """A single hot key's rows must draw more than one salt value —
    the anti-regression guard for the duplicate-clumping content-hash
    salt the r09 review removed."""
    hot = spark.createDataFrame([(1, i) for i in range(64)], "k int, lv int")
    from idr_data_pipelines_spark.operators.joins import _orderable  # noqa: F401

    salted = hot.sortWithinPartitions(*hot.columns).withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int"),
    )
    n_distinct = salted.select("__salt").distinct().count()
    assert n_distinct > 1, "hot key collapsed onto a single salt"
