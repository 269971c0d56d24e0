"""Property: per-bucket pair expansion (``_bucket_pairs``) produces
EXACTLY the pair set of the band self-join it replaced, on generated
band tables — including duplicate band rows, singleton buckets, hash
collisions across band_idx, and ids colliding in multiple bands (the
distinct-dedup case)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from idr_data_pipelines_spark.llmdata.dedup import _bucket_pairs

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # id
        st.integers(min_value=0, max_value=3),  # band_idx
        st.integers(min_value=0, max_value=4),  # band_hash
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(rows=ROWS)
def test_bucket_pairs_equals_self_join_semantics(spark, rows):
    df = spark.createDataFrame(
        rows or [(0, 0, 0)], "id long, band_idx int, band_hash long"
    )
    if not rows:
        df = df.limit(0)
    got = {
        (r.id_a, r.id_b)
        for r in _bucket_pairs(df, ["band_idx", "band_hash"]).collect()
    }
    # reference: the old l.id < r.id self-equi-join, in plain Python
    want = set()
    data = rows or []
    for i, (ia, ba, ha) in enumerate(data):
        for ib, bb, hb in data:
            if ba == bb and ha == hb and ia < ib:
                want.add((ia, ib))
    assert got == want
