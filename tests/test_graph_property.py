"""Property tests (hypothesis) for PageRank: mass conservation and
numpy-reference parity on generated dangling-free graphs. Spark-side
collection per example is expensive, so examples are few but each
covers a random graph topology."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from idr_data_pipelines_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iterations, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[idx[a]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        inflow = np.zeros(n)
        for a, b in edges:
            inflow[idx[b]] += rank[idx[a]] / outdeg[idx[a]]
        rank = (1 - damping) / n + damping * inflow
    return {v: float(rank[idx[v]]) for v in nodes}


@st.composite
def sym_graphs(draw):
    """Random undirected (symmetrized) graphs: 2-12 nodes, each pair
    an edge with ~30% probability, plus a spanning path so no node is
    isolated from the edge list."""
    n = draw(st.integers(min_value=2, max_value=12))
    pairs = {(i, i + 1) for i in range(n - 1)}
    for i in range(n):
        for j in range(i + 1, n):
            if draw(st.booleans()) and draw(st.booleans()):
                pairs.add((i, j))
    return [(str(a), str(b)) for a, b in pairs] + [
        (str(b), str(a)) for a, b in pairs
    ]


@settings(max_examples=8, deadline=None)
@given(edges=sym_graphs(), iters=st.integers(min_value=1, max_value=5))
def test_pagerank_property_mass_and_reference(spark, edges, iters):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["rank"] for r in pagerank(df, iterations=iters).collect()}
    want = _numpy_pagerank(edges, iters)
    assert set(got) == set(want)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-10), v
