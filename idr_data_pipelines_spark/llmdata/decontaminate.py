"""Benchmark decontamination: flag / drop training documents whose
word n-grams overlap a held-out benchmark set.

The standard guard against train/test leakage in LLM data pipelines
(GPT-3 appendix C, PaLM §6.1 use 8–13-gram collision tests): extract
every word n-gram from the benchmark corpus, then score each training
document by how many of its distinct n-grams appear in that set.

Scale design (100 TB corpus, benchmark ≪ corpus):

- The benchmark n-gram set is built once and **broadcast** — the
  corpus side never shuffles its n-grams; the only shuffle is the
  per-document count aggregation (one row per doc after map-side
  partial aggregation).
- N-grams stay inside one JVM projection (``word_shingles`` — array
  HOFs over a single tokenize) until the explode; no Python, no UDFs.
- For benchmark sets too big to broadcast, pass ``broadcast_bench=
  False`` to fall back to a hash join on the n-gram key; corpus
  n-grams then shuffle once — still linear, never quadratic.

Reference: the reference pipeline has no decontamination stage (it is
a warehouse ETL, not a training-data pipeline); this module is part of
the LLM-data extension surface alongside ``llmdata.dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idr_data_pipelines_spark.llmdata.dedup import word_shingles


def benchmark_ngrams(
    bench: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Distinct word k-grams of the benchmark corpus — one ``ngram``
    string column, globally deduplicated (one shuffle over the — small
    — benchmark side only)."""
    return (
        bench.select(F.explode(word_shingles(text_col, k)).alias("ngram"))
        .distinct()
    )


def contamination_scores(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination: ``(id_col, n_ngrams, n_matched,
    contam_ratio)`` where ``contam_ratio = n_matched / n_ngrams`` over
    the document's *distinct* k-grams.

    Documents shorter than ``k`` tokens contribute their whole text as
    a single "n-gram" (same convention as ``word_shingles``), so every
    document gets a score; zero-match documents appear with
    ``n_matched = 0``.

    Single corpus pass: totals and matches ride the same explode —
    each n-gram row carries its document's ``n_ngrams``, the broadcast
    LEFT join marks benchmark hits, and one doc-keyed aggregation
    (map-side combined) counts the marks. The earlier formulation
    computed totals and matches as separate branches re-joined on the
    id — two corpus scans and an extra join, pure waste at 100 TB.
    """
    ngrams = benchmark_ngrams(bench, text_col, k).withColumn(
        "__hit", F.lit(1)
    )
    if broadcast_bench:
        ngrams = F.broadcast(ngrams)

    exploded = corpus.select(
        F.col(id_col), word_shingles(text_col, k).alias("__ngrams")
    ).select(
        id_col,
        F.size("__ngrams").alias("n_ngrams"),
        F.explode_outer("__ngrams").alias("ngram"),
    )
    return (
        exploded.join(ngrams, "ngram", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_ngrams").alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
        )
        .withColumn(
            "contam_ratio",
            F.col("n_matched").cast("double") / F.col("n_ngrams").cast("double"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_ratio: float = 0.0,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Drop every corpus document whose contamination ratio exceeds
    ``max_ratio`` (default 0.0 — any shared n-gram disqualifies).
    Returns the surviving corpus rows with their original columns.

    The *contaminated* id set (small — contamination is the exception)
    is broadcast and anti-joined, so the surviving 99%+ of the corpus
    never shuffles."""
    scores = contamination_scores(
        corpus, bench, id_col, text_col, k, broadcast_bench
    )
    bad = scores.filter(F.col("contam_ratio") > F.lit(max_ratio)).select(id_col)
    return corpus.join(F.broadcast(bad) if broadcast_bench else bad, id_col, "left_anti")
