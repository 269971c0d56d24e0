"""The retrieval-index example (examples/retrieval_index_pipeline.py)
must keep working as the library evolves — it is the ANN-family
composed-usage surface a new user copies."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from retrieval_index_pipeline import (  # noqa: E402
    _semantic_dedup,
    _validate,
    audit_reports,
    build_pipeline,
)


def test_retrieval_index_builds_and_lints(spark, sf_dir):
    p = build_pipeline(sf_dir)
    index = p.build(spark, lint=True, observe=True)
    rows = index.collect()
    assert rows
    assert set(index.columns) == {"vec_id", "cell", "codes"}
    assert len({r.vec_id for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.cell < 16
        assert len(r.codes) == 4 and all(0 <= c < 16 for c in r.codes)
    metrics = p.stage_metrics()
    # dedup is monotone; the index keeps every surviving vector
    assert metrics["semantic_dedup"] <= metrics["validate"]
    assert metrics["build_index"] == metrics["semantic_dedup"]


def test_retrieval_audits_shapes(spark, sf_dir):
    from idr_data_pipelines_spark.sources.parquet import read_parquet_dir

    pruned = _semantic_dedup(
        _validate(read_parquet_dir(spark, f"{sf_dir}/embeddings.parquet"))
    )
    reports = audit_reports(pruned)
    assert set(reports) == {
        "cell_balance",
        "pq_error",
        "recall",
        "hard_negatives",
    }
    balance = reports["cell_balance"].collect()
    assert sum(r.n_vectors for r in balance) == pruned.count()
    recall = reports["recall"].collect()
    assert recall and all(0.0 <= r.recall <= 1.0 for r in recall)
    pq = reports["pq_error"].collect()
    assert {r.subspace for r in pq} == {0, 1, 2, 3}
    assert all(r.mean_dist >= 0.0 for r in pq)
