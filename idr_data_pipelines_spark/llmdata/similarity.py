"""Embedding similarity search over an ``array<float>`` column.

Two plans:

- ``cosine_topk_bruteforce`` — exact: query×corpus equi-free join with
  the small query side broadcast, dot products as array expressions
  (JVM-side ``zip_with`` + ``aggregate`` fold — no Python), window
  top-k. The right baseline whenever |queries| is small; scales
  linearly in corpus size with zero shuffle of the corpus (broadcast
  join + per-partition top-k via AQE/window on query id).
- ``cosine_topk_lsh`` — approximate: random-hyperplane (sign) LSH.
  Signatures are a projection; candidates come from an equi-join on
  (table, bucket); exact cosine re-ranks candidates. This is the
  100 TB path: the corpus is bucketed once (can be written bucketed-by
  signature), each query probes its own bucket — no full scan per
  query.

``embedding_near_dup_pairs`` is the semantic-dedup variant: all pairs
above a cosine threshold, blocked by LSH bucket.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank), self-matches
    excluded, ties broken by neighbor id for determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed seed)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(plane_i · vec)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(vec, plane_col) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    re-ranked by exact cosine. Recall rises as n_planes falls (bigger
    buckets); 8 planes → 256 buckets. At scale, persist the corpus
    bucketed by this id (``.write.bucketBy``) so probes are
    partition-pruned instead of joined."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cvec")
    ).withColumn("bucket", lsh_bucket(F.col("cvec"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qvec")
    ).withColumn("bucket", lsh_bucket(F.col("qvec"), planes))
    scored = (
        c.join(F.broadcast(q), (c.bucket == q.bucket) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cosine", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Semantic near-dup pairs: cosine ≥ threshold, id_a < id_b.

    Blocking: either a caller-supplied column (e.g. a cluster/label
    id) or sign-LSH buckets — the self-join runs inside blocks only.
    """
    vecs = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("vec"))
    if block_col is not None:
        vecs = vecs.join(
            df.select(F.col(id_col).alias("id"), F.col(block_col).alias("block")),
            "id",
        )
    else:
        dim = len(df.select(vec_col).first()[0])
        planes = _hyperplanes(dim, n_planes, seed)
        vecs = vecs.withColumn("block", lsh_bucket(F.col("vec"), planes))
    l, r = vecs.alias("l"), vecs.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block")) & (F.col("l.id") < F.col("r.id")),
        )
        .withColumn("cosine", cosine(F.col("l.vec"), F.col("r.vec")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            "cosine",
        )
    )
