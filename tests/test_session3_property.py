"""Property tests (hypothesis) for the session-3 numeric kernels:
the rolling z-score window vs a numpy reference model over generated
count series, and the chunk-count formula vs a direct Python model
over generated token counts."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

from idr_data_pipelines_spark.queries import _CHUNK_S, _CHUNK_W, _zscore_daily


def _py_zscore(counts: list[int]) -> list[float | None]:
    """Reference: trailing-7 mean/std (population), z rounded to 6,
    None where the window is flat — mirroring _zscore_daily."""
    out: list[float | None] = []
    for i, n in enumerate(counts):
        win = counts[max(0, i - 6) : i + 1]
        m = sum(win) / len(win)
        var = sum(x * x for x in win) / len(win) - m * m
        out.append(round((n - m) / math.sqrt(var), 6) if var > 0 else None)
    return out


@given(
    counts=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40)
)
@settings(max_examples=12, deadline=None)
def test_zscore_daily_matches_numpy_model(counts, spark):
    base = dt.date(2024, 1, 1)
    rows = [
        ("t", base + dt.timedelta(days=i), int(n)) for i, n in enumerate(counts)
    ]
    daily = spark.createDataFrame(rows, ["event_type", "d", "n"])
    got = {
        r["d"]: r["z"]
        for r in _zscore_daily(daily).collect()
    }
    want = _py_zscore(counts)
    for i, w in enumerate(want):
        g = got[base + dt.timedelta(days=i)]
        if w is None:
            assert g is None, (i, g)
        else:
            assert g is not None and abs(g - w) <= 1e-6, (i, g, w)


@given(n=st.integers(min_value=1, max_value=5_000))
@settings(max_examples=200, deadline=None)
def test_chunk_count_formula(n):
    """1 + max(0, ceil((n-W)/S)) chunks cover tokens 0..n-1 with no gap
    and no chunk beyond the end — the pure arithmetic the Spark and
    DuckDB chunkers share."""
    nch = 1 + max(0, -(-(n - _CHUNK_W) // _CHUNK_S))
    starts = [i * _CHUNK_S for i in range(nch)]
    ends = [min(s + _CHUNK_W, n) for s in starts]
    assert starts[0] == 0
    assert ends[-1] == n, "last chunk must reach the end"
    assert all(s < n for s in starts), "no chunk starts past the end"
    for i in range(1, nch):
        assert starts[i] <= ends[i - 1], "gap between chunks"
    if nch > 1:
        # one fewer chunk would leave a tail uncovered
        assert (nch - 2) * _CHUNK_S + _CHUNK_W < n
