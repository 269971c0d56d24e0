"""Round-8 session operators: focused unit tests beyond the
registry-wide oracle/plan sweeps (which auto-cover every new
``QUERIES`` entry — these pin the semantics the sweeps can't see)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from idr_data_pipelines_spark.llmdata.similarity import ivfpq_topk_fixed
from idr_data_pipelines_spark.queries import QUERIES, _t


class TestIvfPqTopK:
    def _run(self, spark, sf_dir):
        emb = _t(spark, sf_dir, "embeddings")
        return ivfpq_topk_fixed(emb, emb.filter(F.col("vec_id") < 8))

    def test_shape_and_ranks(self, spark, sf_dir):
        rows = self._run(spark, sf_dir).collect()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        assert set(by_q) == set(range(8))
        for qid, grp in by_q.items():
            grp.sort(key=lambda r: r.rank)
            # dense ranks 1..k, distances non-decreasing, no self-match
            assert [r.rank for r in grp] == list(range(1, len(grp) + 1))
            dists = [r.adc_r for r in grp]
            assert dists == sorted(dists)
            assert all(r.neighbor_id != qid for r in grp)

    def test_adc_matches_numpy(self, spark, sf_dir):
        """ADC scoring is exact table lookup: for any returned pair,
        sum_s adc_s[code_s] must equal the distance recomputed from
        the query vector and the neighbor's PQ-coded centroids."""
        emb = _t(spark, sf_dir, "embeddings")
        rows = self._run(spark, sf_dir).collect()
        need = (
            set(range(16))
            | {r.query_id for r in rows}
            | {r.neighbor_id for r in rows}
        )
        vecs = {
            r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.filter(
                F.col("vec_id").isin(sorted(need))
            ).collect()
        }
        checked = 0
        for r in rows:
            nvec, qvec = vecs[r.neighbor_id], vecs[r.query_id]
            adc = 0.0
            for s in range(4):
                lo, hi = s * 16, (s + 1) * 16
                sub = nvec[lo:hi]
                dists = [
                    float(((sub - vecs[c][lo:hi]) ** 2).sum())
                    for c in range(16)
                ]
                code = int(np.argmin(dists))
                adc += float(((qvec[lo:hi] - vecs[code][lo:hi]) ** 2).sum())
            assert abs(round(adc, 6) - r.adc_r) < 1e-9, (
                r.query_id,
                r.neighbor_id,
            )
            checked += 1
        assert checked > 0


class TestIvfPqPaths:
    def test_arrow_and_expression_paths_bit_identical(self, spark, sf_dir):
        """The Arrow index build accumulates every fold dim-by-dim in
        the JVM expressions' left-associative order — results must be
        BIT-identical (same cells, codes, rounded ADC distances, same
        top-k), not merely close."""
        emb = _t(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 8)
        a = sorted(map(tuple, ivfpq_topk_fixed(emb, q, vectorized=True).collect()))
        b = sorted(map(tuple, ivfpq_topk_fixed(emb, q, vectorized=False).collect()))
        assert a == b and len(a) > 0


class TestMarkovAttribution:
    def test_single_gateway_channel_gets_full_credit(self, spark):
        """If every conversion flows through one channel, removing it
        kills ALL conversion probability: removal effect 1.0, share
        1.0; a channel never on a converting path gets drop 0."""
        from idr_data_pipelines_spark.streaming.events import (
            markov_removal_attribution,
        )

        rows = []
        eid = 0
        for u in range(6):  # view -> click -> purchase
            for t, typ in enumerate(["view", "click", "purchase"]):
                rows.append((eid, u, typ, t))
                eid += 1
        for u in range(6, 9):  # error -> nothing (never converts)
            rows.append((eid, u, "error", 0))
            eid += 1
        df = spark.createDataFrame(
            [(e, u, t, float(p)) for e, u, t, p in rows],
            "event_id long, user_id long, event_type string, ts double",
        )
        out = {
            r.channel: r
            for r in markov_removal_attribution(df, n_iter=32).collect()
        }
        assert set(out) == {"view", "click", "error"}
        for ch in ("view", "click"):
            assert out[ch].removal_effect_r == 1.0
            assert out[ch].attribution_share_r == 0.5
        assert out["error"].removal_effect_r == 0.0
        assert out["error"].attribution_share_r == 0.0

    def test_fixture_invariants(self, spark, sf_dir):
        rows = QUERIES["evt_attribution_markov"](spark, sf_dir).collect()
        assert rows
        share = sum(r.attribution_share_r for r in rows)
        assert abs(share - 1.0) < 1e-5  # rounding of 4-6 terms
        for r in rows:
            assert 0.0 <= r.removal_effect_r <= 1.0
            assert 0.0 <= r.attribution_share_r <= 1.0
            assert r.n_touches > 0


class TestClusterSafeSplit:
    def test_no_cluster_straddles_splits(self, spark, sf_dir):
        """The whole point of the operator: every dedup cluster lands
        entirely in one split, and singletons reproduce the plain
        hash split (same salt → byte-identical to
        split_train_holdout on unclustered docs)."""
        rows = QUERIES["split_cluster_safe"](spark, sf_dir).collect()
        assert len(rows) == len({r.doc_id for r in rows})
        by_key: dict[int, set] = {}
        n_clustered = 0
        for r in rows:
            by_key.setdefault(r.split_key, set()).add(r.split)
            n_clustered += r.is_clustered
        assert all(len(s) == 1 for s in by_key.values())
        assert n_clustered > 0  # fixture has near-dups by design

        plain = {
            r.doc_id: r.split
            for r in QUERIES["split_train_holdout"](
                spark, sf_dir
            ).collect()
        }
        for r in rows:
            if not r.is_clustered:
                assert plain[r.doc_id] == r.split
