"""End-to-end retrieval-index pipeline: the ANN family composed the
way a user would wire it to build and audit a vector index.

    raw embeddings
      → validate (null / wrong-dim / zero-norm vectors out)
      → semantic dedup (SemDeDup prune, lowest-id representative)
      → IVF-PQ index build: coarse cell + 4-byte PQ codes per vector
        — the stored layout a FAISS-style index scans at query time

    published audits (run on the same pruned frame):
      → cell balance (hot cells = slow probes)
      → PQ reconstruction error per subspace (quantization quality)
      → recall@5 of the full ADC query path vs exact brute force
      → hard negatives per anchor (the retriever's contrastive
        fine-tune draws negatives from the index's own buckets)

Every step is a named `Pipeline` stage, so `build(lint=True)`
pre-flights the composed physical plan before anything executes.

At 100 TB the index table is written ONCE, partitioned/bucketed by
``cell``: queries read ``nprobe`` buckets (partition pruning) and
score candidates from 4-byte codes — the corpus float vectors are
never touched at query time, which is the entire point of the
layout.

Run directly:

    python examples/retrieval_index_pipeline.py /root/testdata/sf0.01 /tmp/idx

or import `build_pipeline` / `audit_reports` (see
tests/test_example_retrieval.py).
"""

from __future__ import annotations

import os
import sys

# runnable directly (`python examples/retrieval_index_pipeline.py …`)
# without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idr_data_pipelines_spark.llmdata.similarity import (
    assign_fixed_clusters,
    cosine_topk_bruteforce,
    hard_negatives_fixed_cells,
    ivfpq_topk_fixed,
    pq_assign_fixed,
    semdedup_prune,
)
from idr_data_pipelines_spark.plans.pipeline import Pipeline
from idr_data_pipelines_spark.sources.parquet import read_parquet_dir

DIM = 64


def _validate(df: DataFrame) -> DataFrame:
    """Drop rows no index can serve: null / wrong-dimension vectors
    and zero vectors (cosine undefined). Pure projection-filter."""
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return df.filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == DIM)
        & (sq > 0.0)
    )


def _semantic_dedup(df: DataFrame) -> DataFrame:
    """SemDeDup prune: near-identical vectors (cosine ≥ 0.95 within a
    coarse cell) collapse to their lowest-id representative BEFORE
    indexing — duplicate index entries waste probe budget and skew
    recall evals.

    The fixed-seed quantizers downstream take rows with id < 16 as
    their codebook, so those seed rows are PINNED through the prune —
    if the prune dropped one (two near-identical vectors among ids
    0..15), every later stage would find a short codebook and raise.
    Production trains codebooks first and prunes second; pinning
    reproduces that ordering with the fixture's deterministic seed."""
    keep = semdedup_prune(df, n_clusters=16, threshold=0.95).select(
        "vec_id"
    )
    seeds = df.select("vec_id").filter(F.col("vec_id") < 16)
    return df.join(keep.union(seeds).distinct(), "vec_id", "semi")


def _build_index(df: DataFrame) -> DataFrame:
    """The stored index rows: (vec_id, cell, codes[4]) — coarse cell
    from the fixed-seed quantizer, 4 one-byte PQ codes instead of 64
    floats (64× scoring-payload compression). Both assignments are
    map-only projections; the rollup of the PQ long format to one
    codes array is an id-keyed aggregate."""
    cells = assign_fixed_clusters(df, n_clusters=16).select(
        F.col("id").alias("vec_id"), F.col("cluster_id").alias("cell")
    )
    codes = (
        pq_assign_fixed(df, n_centroids=16, n_subspaces=4, dim=DIM)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code"))),
                lambda x: x["code"],
            ).alias("codes")
        )
    )
    return cells.join(codes, "vec_id")


def audit_reports(pruned: DataFrame) -> dict[str, DataFrame]:
    """The audits a team publishes ALONGSIDE a new index build (run
    them on the post-dedup frame the index was built from):

    - ``cell_balance``: vectors per coarse cell — hot cells mean slow
      probes; fix by raising n_centroids or re-seeding;
    - ``pq_error``: mean/max squared reconstruction error per
      subspace — rising error means the codebook no longer fits the
      data distribution;
    - ``recall``: recall@5 of the REAL query path (cell probe + ADC
      code scoring) against exact brute force on a bounded query
      sample — the number that gates shipping the index;
    - ``hard_negatives``: top same-cell different-label neighbors per
      anchor, mined from the index's own buckets.
    All are audit-sized outputs."""
    queries = pruned.filter(F.col("vec_id") < 8)
    gt = cosine_topk_bruteforce(pruned, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    ap = ivfpq_topk_fixed(pruned, queries, k=5).select(
        "query_id", "neighbor_id", F.lit(1).alias("__hit")
    )
    recall = (
        gt.join(ap, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"))
        .withColumn("recall", F.round(F.col("n_hits") / F.lit(5.0), 6))
    )
    pq = pq_assign_fixed(pruned, n_centroids=16, n_subspaces=4, dim=DIM)
    return {
        "cell_balance": (
            assign_fixed_clusters(pruned, n_clusters=16)
            .groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n_vectors"))
        ),
        "pq_error": pq.groupBy("subspace").agg(
            F.round(F.avg("dist_r"), 6).alias("mean_dist"),
            F.max("dist_r").alias("max_dist"),
        ),
        "recall": recall,
        "hard_negatives": hard_negatives_fixed_cells(
            pruned, k=3, n_clusters=16
        ),
    }


def build_pipeline(sf_dir: str) -> Pipeline:
    p = Pipeline(
        "retrieval_index",
        source=lambda spark: read_parquet_dir(
            spark, f"{sf_dir}/embeddings.parquet"
        ),
    )
    p.stage("validate", _validate)
    p.stage("semantic_dedup", _semantic_dedup)
    p.stage("build_index", _build_index)
    return p


def main(sf_dir: str, out_dir: str) -> None:
    from idr_data_pipelines_spark.session import get_spark

    spark = get_spark(app_name="retrieval-index-example", master="local[*]")
    p = build_pipeline(sf_dir)
    index = p.build(spark, lint=True, observe=True)
    # write-once, partitioned by cell: probes prune to nprobe buckets
    index.write.mode("overwrite").partitionBy("cell").parquet(
        f"{out_dir}/index"
    )
    print(p.stage_metrics())
    pruned = _semantic_dedup(
        _validate(read_parquet_dir(spark, f"{sf_dir}/embeddings.parquet"))
    )
    for name, report in audit_reports(pruned).items():
        print(name, report.limit(5).collect())


if __name__ == "__main__":
    import sys

    main(sys.argv[1], sys.argv[2])
