"""Semantic invariants for the round-6 session-3 operators — the
properties the DuckDB value-hash can't express by itself (the oracle
proves engine agreement; these prove the SEMANTICS are the intended
ones)."""

from __future__ import annotations

from pyspark.sql import functions as F

from idr_data_pipelines_spark.queries import (
    _CHUNK_S,
    _CHUNK_W,
    QUERIES,
)


def test_chunk_windows_cover_and_reassemble(spark, sf_dir):
    """Every token of every doc is covered; stripping each chunk's
    overlap prefix and concatenating reproduces the document exactly;
    chunk sizes never exceed W and only the last chunk may be short."""
    chunks = QUERIES["text_chunk_windows"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["toks"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
        )
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    overlap = _CHUNK_W - _CHUNK_S
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        toks = docs[doc_id]
        rebuilt: list[str] = []
        for i, r in enumerate(rows):
            ctoks = r["chunk_text"].split(" ")
            assert len(ctoks) == r["n_tok"] <= _CHUNK_W
            if i < len(rows) - 1:
                assert r["n_tok"] == _CHUNK_W, "only the last chunk may be short"
            rebuilt.extend(ctoks if i == 0 else ctoks[overlap:])
        assert rebuilt == toks, f"doc {doc_id} failed reassembly"


def test_graph_khop_bfs_invariants(spark, sf_dir):
    """Hops are 0..3; hop-0 is exactly the seed set; every hop-k node
    has an edge from some hop-(k-1) node (frontier soundness); and no
    node appears twice (minimal-distance uniqueness)."""
    reach = QUERIES["graph_khop"](spark, sf_dir).collect()
    ids = [r["id"] for r in reach]
    assert len(ids) == len(set(ids)), "a node was expanded twice"
    by_hop: dict[int, set] = {}
    for r in reach:
        assert 0 <= r["hop"] <= 3
        by_hop.setdefault(r["hop"], set()).add(r["id"])
    seeds = {
        f"c{r['c_custkey']}"
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") < 10)
        .collect()
    }
    assert by_hop[0] == seeds
    from idr_data_pipelines_spark.queries import _cs_edges

    edges = {
        (r["src"], r["dst"]) for r in _cs_edges(spark, sf_dir).collect()
    }
    for k in (1, 2, 3):
        for node in by_hop.get(k, ()):
            assert any(
                (prev, node) in edges for prev in by_hop.get(k - 1, ())
            ), f"hop-{k} node {node} unreachable from hop-{k - 1}"


def test_scd4_outputs_partition_the_keyspace(spark, sf_dir):
    """current keys == base ∪ update keys (one row each); history keys
    are EXACTLY base ∩ update (the displaced versions) — recomputed
    here from the raw orders table, independent of the operator."""
    out = QUERIES["scd4_current_history"](spark, sf_dir)
    cur = [r["o_custkey"] for r in out.filter("tbl = 'current'").collect()]
    hist = {r["o_custkey"] for r in out.filter("tbl = 'history'").collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    base_keys = {
        r["o_custkey"]
        for r in orders.filter(F.col("d") <= "1995-01-01").distinct().collect()
    }
    upd_keys = {
        r["o_custkey"]
        for r in orders.filter(F.col("d") > "1995-01-01").distinct().collect()
    }
    assert len(cur) == len(set(cur)), "current must be one row per key"
    assert set(cur) == base_keys | upd_keys, "current must cover base ∪ update"
    assert hist == base_keys & upd_keys, "history must be exactly base ∩ update"


def test_bm25_prefers_rare_term_docs(spark, sf_dir):
    """Docs containing the rare query term ('dup' ≈ 26 corpus hits vs
    ~900 for the common terms) must dominate the top ranks — the IDF
    weighting sanity check."""
    top = QUERIES["text_bm25_topk"](spark, sf_dir).collect()
    assert len(top) == 50
    docs = dict(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.lower(F.col("text")).alias("t"))
        .collect()
    )
    top10_with_dup = sum(
        1 for r in sorted(top, key=lambda r: r["rk"])[:10]
        if " dup " in f" {docs[r['doc_id']]} "
    )
    assert top10_with_dup >= 5, "rare-term docs should dominate the top ranks"
