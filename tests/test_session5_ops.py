"""Semantic invariants for the round-7 session-5 operators (DSIR
weights, kNN label agreement, Zipf/lexical profile, norm outliers,
hard-negative mining, power-iteration top eigenvector) — what the
DuckDB value-hash oracle can't express by itself (the oracle proves
engine agreement; these prove the SEMANTICS are intended)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from idr_data_pipelines_spark.queries import QUERIES


def _vecs(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    labels = np.array([r["label"] for r in rows])
    order = np.argsort(ids)
    return ids[order], V[order], labels[order]


def test_docs_dsir_weights_separates_target(spark, sf_dir):
    """The weights mean the right thing: the target slice (lang='en')
    averages a strictly higher importance weight than the rest, every
    text-bearing document gets exactly one row, and every weight is
    finite (smoothing forbids ±inf)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = QUERIES["docs_dsir_weights"](spark, sf_dir)
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r["n_feats"] > 0 and np.isfinite(r["weight_r"]) for r in rows)
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["is_en"]: r["m"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("weight_r").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_emb_label_agreement_matches_graph(spark, sf_dir):
    """agree_r is exactly (same-label edges)/(edges) of the registry's
    own emb_knn_graph; lone-in-cell vectors report 0 neighbors with a
    null ratio; every corpus row appears exactly once."""
    ids, _, labels = _vecs(spark, sf_dir)
    lbl = dict(zip(ids.tolist(), labels.tolist()))
    edges = QUERIES["emb_knn_graph"](spark, sf_dir).collect()
    n_nb, n_same = {}, {}
    for e in edges:
        s, d = e["src_id"], e["dst_id"]
        n_nb[s] = n_nb.get(s, 0) + 1
        n_same[s] = n_same.get(s, 0) + (lbl[s] == lbl[d])
    out = {r["vec_id"]: r for r in QUERIES["emb_label_agreement"](spark, sf_dir).collect()}
    assert set(out) == set(ids.tolist())
    for vid, r in out.items():
        assert r["label"] == lbl[vid]
        assert r["n_neighbors"] == n_nb.get(vid, 0)
        assert r["n_same"] == n_same.get(vid, 0)
        if r["n_neighbors"] == 0:
            assert r["agree_r"] is None
        else:
            assert abs(r["agree_r"] - round(r["n_same"] / r["n_neighbors"], 6)) < 1e-9
        assert 0 <= r["n_same"] <= r["n_neighbors"] <= 3


def test_docs_zipf_lexical_matches_python(spark, sf_dir):
    """Counts, ratios, and the OLS slope replay exactly from a pure
    Python recount of one source's tokens; slope is negative for
    every source (frequencies are non-increasing in rank)."""
    from collections import Counter

    rows = {r["source"]: r for r in QUERIES["docs_zipf_lexical"](spark, sf_dir).collect()}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("source", "text")
        .collect()
    )
    assert rows and all(r["zipf_slope_r"] < 0 for r in rows.values())
    src = sorted(rows)[0]
    cnt = Counter()
    for d in docs:
        if d["source"] == src:
            for tok in d["text"].strip().lower().split():
                cnt[tok] += 1
    r = rows[src]
    assert r["n_tokens"] == sum(cnt.values())
    assert r["n_types"] == len(cnt)
    assert r["n_hapax"] == sum(1 for v in cnt.values() if v == 1)
    assert abs(r["ttr_r"] - round(len(cnt) / sum(cnt.values()), 6)) < 1e-9
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([v for _, v in top], dtype=float))
    n = float(len(top))
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    assert abs(r["zipf_slope_r"] - slope) < 1e-5


def test_emb_norm_outliers_matches_numpy(spark, sf_dir):
    """The flagged set and z values equal a numpy replay of the
    e6-quantized integer norms with per-label population moments."""
    ids, V, labels = _vecs(spark, sf_dir)
    Q = np.floor(V * 1e6 + 0.5).astype(np.int64)
    n2 = (Q * Q).sum(axis=1)  # exact: |component·1e6| ≤ ~1e6 ⇒ fits int64
    expected = {}
    for l in np.unique(labels):
        sel = labels == l
        x = [int(v) for v in n2[sel]]  # exact Python ints — the group
        n = len(x)  # moments mirror the engines' DECIMAL(38,0) sums
        mean = float(sum(x)) / n
        var = float(sum(v * v for v in x)) / n - mean * mean
        if var <= 0:
            continue
        std = var**0.5
        for vid, xi in zip(ids[sel], x):
            zi = (float(xi) - mean) / std
            if abs(zi) > 2.0:
                expected[int(vid)] = (round(zi, 6), round(xi**0.5 / 1e6, 6))
    got = {r["vec_id"]: r for r in QUERIES["emb_norm_outliers"](spark, sf_dir).collect()}
    assert set(got) == set(expected), (
        set(got) ^ set(expected)
    )
    for vid, (z_r, norm_r) in expected.items():
        assert abs(got[vid]["z_r"] - z_r) < 1e-5
        assert abs(got[vid]["norm_r"] - norm_r) < 1e-6


def test_emb_hard_negatives_semantics(spark, sf_dir):
    """Every mined negative carries a different label than its anchor,
    lives in the anchor's cell (it appears in the knn candidate set or
    is farther-ranked), and is the TRUE cell-local different-label
    top-3 by a numpy replay."""
    ids, V, labels = _vecs(spark, sf_dir)
    lbl = dict(zip(ids.tolist(), labels.tolist()))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn[ids < 16]
    cell = np.argmax(Vn @ C.T, axis=1)
    S = Vn @ Vn.T
    got = {}
    for r in QUERIES["emb_hard_negatives"](spark, sf_dir).collect():
        assert lbl[r["anchor_id"]] != lbl[r["negative_id"]]
        got[(r["anchor_id"], r["rank"])] = r["negative_id"]
    expected_n = 0
    for si, s in enumerate(ids):
        cands = [
            di
            for di in range(len(ids))
            if cell[di] == cell[si] and labels[di] != labels[si]
        ]
        ranked = sorted(cands, key=lambda di: (-S[si, di], ids[di]))[:3]
        expected_n += len(ranked)
        for rk, di in enumerate(ranked, start=1):
            assert got[(s, rk)] == ids[di], (s, rk)
    assert len(got) == expected_n


def test_emb_power_iteration_matches_numpy(spark, sf_dir):
    """The iterate and Rayleigh estimate replay from a numpy power
    iteration over the identically-rounded covariance; the iterate is
    unit-norm; with enough iterations the estimate approaches the true
    top eigenvalue from below (Rayleigh bound)."""
    _, V, _ = _vecs(spark, sf_dir)
    Q = np.floor(V * 1e6 + 0.5)
    n = len(Q)
    s = Q.sum(axis=0)
    C = np.round(((Q.T @ Q) / n - np.outer(s / n, s / n)) / 1e12, 9)
    v1r = C @ np.ones(C.shape[0])
    v1 = v1r / np.linalg.norm(v1r)
    v2r = C @ v1
    lam = float(v2r @ v1)
    v2 = v2r / np.linalg.norm(v2r)
    rows = sorted(
        QUERIES["emb_power_iteration"](spark, sf_dir).collect(),
        key=lambda r: r["dim"],
    )
    got = np.array([r["v_r"] for r in rows])
    assert len(rows) == C.shape[0]
    assert abs(np.linalg.norm(got) - 1.0) < 1e-4
    assert np.abs(got - v2).max() < 1e-5
    assert abs(rows[0]["eig_r"] - lam) < 1e-5
    assert all(r["eig_r"] == rows[0]["eig_r"] for r in rows)
    top = float(np.linalg.eigvalsh(C)[-1])
    assert rows[0]["eig_r"] <= top + 1e-6
