"""The end-to-end example (examples/train_data_pipeline.py) must keep
working as the library evolves — it is the composed-usage surface a
new user copies first."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from train_data_pipeline import build_pipeline  # noqa: E402


def test_example_pipeline_builds_lints_and_shards(spark, sf_dir, tmp_path):
    from idr_data_pipelines_spark.sources.sinks import sink_training_shards

    p = build_pipeline(sf_dir)
    packed = p.build(spark, lint=True, observe=True)
    rows = packed.count()
    assert rows > 0
    assert {"doc_id", "source", "n_tokens", "pack_id", "pack_offset"} <= set(
        packed.columns
    )
    # the funnel must actually filter: fewer docs than the 500 raw
    assert rows < 500
    metrics = p.stage_metrics()
    assert set(metrics) == {
        "quality_gate", "exact_dedup", "near_dedup", "decontaminate",
        "train_split", "source_mix", "pack",
    }
    # monotone funnel on the doc-level stages (pack keeps row count
    # but its observation can tally a second plan pass — compare the
    # doc-level ones only)
    assert metrics["near_dedup"] <= metrics["exact_dedup"]
    assert metrics["decontaminate"] <= metrics["near_dedup"]
    assert metrics["source_mix"] <= metrics["train_split"]

    out = str(tmp_path / "shards")
    sink_training_shards(
        packed.withColumn("order_key", F.md5(F.col("doc_id").cast("string"))),
        out,
        n_shards=4,
        order_col="order_key",
    )
    shards = spark.read.parquet(out)
    assert shards.count() == rows
    assert shards.select("shard").distinct().count() == 4
    # contiguous global ids
    ids = [r["example_id"] for r in shards.select("example_id").collect()]
    assert sorted(ids) == list(range(rows))
