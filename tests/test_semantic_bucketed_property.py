"""Property: ``decontaminate_semantic_bucketed`` matches a
from-scratch numpy reference on generated corpora — the reference
recomputes the whole contract (floor-scaled integer sign projections,
band split, candidate union over bands, exact cosines, distinct-hit
rollup, null-vec passthrough) with none of the operator's machinery,
so a bug in the Arrow bucket table / band explode / broadcast left
join / count-distinct chain cannot hide in a shared formulation.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from idr_data_pipelines_spark.llmdata.decontaminate import (
    decontaminate_semantic_bucketed,
)
from idr_data_pipelines_spark.llmdata.similarity import (
    signed_projection_signs,
)

DIM = 4
VEC = st.lists(
    st.integers(min_value=-3, max_value=3).map(lambda x: x / 2.0),
    min_size=DIM,
    max_size=DIM,
).filter(lambda v: any(x != 0 for x in v))  # zero norm -> cos undefined

CORPUS = st.lists(VEC, min_size=1, max_size=10)
BENCH = st.lists(VEC, min_size=0, max_size=4)


def _buckets(vecs, bands, r, seed=42, scale=1_000_000):
    signs = np.asarray(signed_projection_signs(DIM, bands * r, seed))
    q = np.floor(np.asarray(vecs, dtype=np.float64) * scale).astype(np.int64)
    bits = (q @ signs.T) > 0
    weights = (1 << np.arange(bands * r)).astype(np.int64)
    full = (bits.astype(np.int64) * weights[None, :]).sum(axis=1)
    return [
        [(full[i] >> (b * r)) & ((1 << r) - 1) for b in range(bands)]
        for i in range(len(vecs))
    ]


def _reference(corpus, bench, threshold, bands, r):
    out = {}
    cb = _buckets([v for _, v in corpus], bands, r) if corpus else []
    bb = _buckets([v for _, v in bench], bands, r) if bench else []
    for (cid, cv), ckeys in zip(corpus, cb):
        cands = {
            bid
            for (bid, bv), bkeys in zip(bench, bb)
            for b in range(bands)
            if ckeys[b] == bkeys[b]
        }
        best, hits = None, set()
        for bid, bv in bench:
            if bid not in cands:
                continue
            # sequential left-fold dot/norm exactly as the JVM folds
            dot = 0.0
            nc = 0.0
            nb = 0.0
            for a, b_ in zip(cv, bv):
                dot = dot + a * b_
            for a in cv:
                nc = nc + a * a
            for a in bv:
                nb = nb + a * a
            cos = dot / (math.sqrt(nc) * math.sqrt(nb))
            if best is None or cos > best:
                best = cos
            if cos >= threshold:
                hits.add(bid)
        out[cid] = (
            round(best, 6) if best is not None else None,
            len(hits),
            best is not None and best >= threshold,
        )
    return out


@settings(max_examples=10, deadline=None)
@given(corpus=CORPUS, bench=BENCH)
def test_bucketed_semantic_matches_reference(spark, corpus, bench):
    threshold, bands, r = 0.5, 2, 3
    c_rows = [(i + 100, v) for i, v in enumerate(corpus)]
    b_rows = [(i, v) for i, v in enumerate(bench)]
    cdf = spark.createDataFrame(
        c_rows, "vec_id long, embedding array<double>"
    )
    bdf = spark.createDataFrame(
        b_rows or [(0, [1.0] * DIM)],
        "vec_id long, embedding array<double>",
    )
    if not b_rows:
        bdf = bdf.filter("vec_id < 0")  # genuinely empty benchmark
    got = {
        rrow["vec_id"]: (
            rrow["max_cos_r"],
            rrow["n_bench_hits"],
            rrow["contaminated"],
        )
        for rrow in decontaminate_semantic_bucketed(
            cdf, bdf, threshold=threshold, bands=bands, planes_per_band=r
        ).collect()
    }
    want = _reference(c_rows, b_rows, threshold, bands, r)
    assert set(got) == set(want)
    for vid in want:
        gm, gh, gc = got[vid]
        wm, wh, wc = want[vid]
        assert gh == wh and gc == wc, (vid, got[vid], want[vid])
        if wm is None:
            assert gm is None, (vid, gm)
        else:
            # same fold order -> identical doubles -> identical rounds
            assert gm == wm, (vid, gm, wm)
