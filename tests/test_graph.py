"""Unit tests for iterative graph operators (operators/graph.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from idr_data_pipelines_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iterations, damping):
    """Dense power-method reference on the same fixed-iteration spec."""
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
    return {v: rank[idx[v]] for v in nodes}


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_pagerank_matches_numpy_reference(spark):
    # path + a triangle hanging off one end (symmetrized → dangling-free)
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "c")]
    edges = _sym(pairs)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["id"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    want = _numpy_pagerank(edges, iterations=4, damping=0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v


def test_pagerank_mass_conserved_and_symmetric_ring(spark):
    # dangling-free graph ⇒ total rank stays exactly 1 per iteration
    # (up to float error); on a vertex-transitive graph (ring) every
    # node must get the uniform rank.
    ring = [(str(i), str((i + 1) % 7)) for i in range(7)]
    df = spark.createDataFrame(_sym(ring), "src string, dst string")
    rows = pagerank(df, iterations=5).collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-12)
    for r in rows:
        assert r["rank"] == pytest.approx(1.0 / 7, rel=1e-12)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df, iterations=2).collect() == []


def test_pagerank_more_iterations_converge(spark):
    # star graph: hub rank grows toward its fixed point; iterating
    # longer must move ranks monotonically closer to the 20-iteration
    # proxy fixed point, and hub > leaf always.
    star = [("hub", f"l{i}") for i in range(6)]
    df = spark.createDataFrame(_sym(star), "src string, dst string")
    fixed = {r["id"]: r["rank"] for r in pagerank(df, iterations=20).collect()}
    prev_err = None
    for it in (1, 3, 6):
        got = {r["id"]: r["rank"] for r in pagerank(df, iterations=it).collect()}
        assert got["hub"] > got["l0"]
        err = max(abs(got[v] - fixed[v]) for v in fixed)
        if prev_err is not None:
            assert err <= prev_err + 1e-15
        prev_err = err


def test_pagerank_parallel_edges_count_with_multiplicity(spark):
    """Duplicate edges are integer weights: doubling a->b's edge must
    pull rank toward b vs the simple graph, and match the numpy
    reference that sums over the edge list with multiplicity."""
    base = _sym([("a", "b"), ("b", "c")])
    multi = base + [("a", "b"), ("b", "a")]  # double one undirected edge
    df = spark.createDataFrame(multi, "src string, dst string")
    got = {r["id"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    want = _numpy_pagerank(multi, iterations=4, damping=0.85)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12), v
    simple = {
        r["id"]: r["rank"]
        for r in pagerank(
            spark.createDataFrame(base, "src string, dst string"), iterations=4
        ).collect()
    }
    assert got["c"] < simple["c"]  # the doubled a-b edge starves c


def test_pagerank_dangling_guard(spark):
    """A dst-only node violates the dangling-free contract: the guard
    must fail loudly (r5 ADVICE) instead of silently dropping the node
    and leaking its mass; validate_dangling=False restores the old
    trusting behavior for pre-validated graphs."""
    # "c" never appears as a src → dangling
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="dangling-free"):
        pagerank(df, iterations=2)
    # opt-out runs (and documents the leak: c is absent, mass < 1)
    rows = pagerank(df, iterations=2, validate_dangling=False).collect()
    assert {r["id"] for r in rows} == {"a", "b"}
    assert sum(r["rank"] for r in rows) < 1.0
