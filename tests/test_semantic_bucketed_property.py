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


def test_band_geometry_sizing_rule():
    """semantic_band_geometry: planes = ceil(log2(bands*n_bench/cpr)),
    int64 bit budget enforced."""
    import pytest

    from idr_data_pipelines_spark.llmdata.decontaminate import (
        semantic_band_geometry,
    )

    assert semantic_band_geometry(20, bands=4) == (4, 7)
    assert semantic_band_geometry(1000, bands=4) == (4, 12)
    # doubling the benchmark costs one plane
    assert semantic_band_geometry(2000, bands=4) == (4, 13)
    # looser candidate budget -> fewer planes
    assert semantic_band_geometry(1000, bands=4, candidates_per_row=16.0) == (
        4,
        8,
    )
    assert semantic_band_geometry(1, bands=1) == (1, 1)
    with pytest.raises(ValueError):
        semantic_band_geometry(1 << 40, bands=16)  # 16*r > 63 bits
    with pytest.raises(ValueError):
        semantic_band_geometry(0)
    with pytest.raises(ValueError):
        semantic_band_geometry(10, candidates_per_row=0.0)


def test_two_geometry_recall_candidate_trade(spark):
    """The recall-vs-candidates trade is MEASURED, not asserted (r13
    VERDICT item 3): on a clustered corpus (60 near-copies of bench
    vectors at cos >= 0.97 + 140 random rows, all seeded), the demo
    2x3 geometry and the sized semantic_band_geometry(|bench|=20) =
    4x7 geometry both recover ~all exact-twin flags, while 4x7 cuts
    candidate volume ~4x overall and to ~bands/2^r on RANDOM pairs —
    the formula the sizing helper is built on. Flags are verified to
    be SUBSETS of the exact screen's (candidates can only shrink the
    flag set)."""
    import numpy as np

    from idr_data_pipelines_spark.llmdata.decontaminate import (
        decontaminate_semantic,
        decontaminate_semantic_bucketed,
        semantic_band_geometry,
    )
    from idr_data_pipelines_spark.llmdata.similarity import (
        signed_projection_signs,
    )

    dim, n_bench, n_contam, n_rand = 16, 20, 60, 140
    rng = np.random.default_rng(7)
    bench = rng.normal(size=(n_bench, dim))
    bench /= np.linalg.norm(bench, axis=1, keepdims=True)
    contam = bench[np.arange(n_contam) % n_bench] + rng.normal(
        size=(n_contam, dim)
    ) * 0.05
    corpus = np.vstack([contam, rng.normal(size=(n_rand, dim))])

    cdf = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(corpus)],
        "vec_id long, embedding array<double>",
    )
    bdf = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(bench)],
        "vec_id long, embedding array<double>",
    )

    def flags(df):
        return {
            r["vec_id"] for r in df.collect() if r["contaminated"]
        }

    exact = flags(decontaminate_semantic(cdf, bdf, threshold=0.8))
    assert len(exact) >= n_contam  # every planted near-copy flags

    geoms = {"demo": (2, 3), "sized": semantic_band_geometry(n_bench, bands=4)}
    assert geoms["sized"] == (4, 7)
    got = {
        name: flags(
            decontaminate_semantic_bucketed(
                cdf, bdf, threshold=0.8, bands=b, planes_per_band=r
            )
        )
        for name, (b, r) in geoms.items()
    }
    for name, fl in got.items():
        assert fl <= exact, name  # bucketed flags subset of exact
        assert len(fl) / len(exact) >= 0.9, (name, len(fl), len(exact))

    # candidate volume, replayed with the operator's own sign family
    def cand_matrix(bands, r, scale=1_000_000):
        signs = np.asarray(signed_projection_signs(dim, bands * r, 42))
        keys = []
        for vecs in (corpus, bench):
            q = np.floor(vecs * scale).astype(np.int64)
            bits = (q @ signs.T) > 0
            w = (1 << np.arange(bands * r)).astype(np.int64)
            full = (bits.astype(np.int64) * w[None, :]).sum(axis=1)
            keys.append(
                np.stack(
                    [(full >> (b * r)) & ((1 << r) - 1) for b in range(bands)],
                    axis=1,
                )
            )
        ck, bk = keys
        cand = np.zeros((len(corpus), len(bench)), bool)
        for b in range(bands):
            cand |= ck[:, b][:, None] == bk[:, b][None, :]
        return cand

    cands = {name: cand_matrix(b, r) for name, (b, r) in geoms.items()}
    assert cands["sized"].sum() * 3 < cands["demo"].sum()
    for name, (b, r) in geoms.items():
        rand_frac = cands[name][n_contam:].mean()  # random rows only
        assert rand_frac < 2.0 * b / 2**r, (name, rand_frac)
