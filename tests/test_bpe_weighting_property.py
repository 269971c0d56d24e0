"""Property: the r10 word-frequency-weighted BPE merge round equals
the token-stream formulation it replaced.

q_text_bpe_merge_round (queries.py) aggregates pair statistics over
the DISTINCT-WORD frequency table weighted by word count (one
vocab-collapsing shuffle — the 100 TB shape) instead of exploding
pairs over the raw token stream. The two are equal by construction
(sum of word frequencies = token count), but the equality has edge
cases worth pinning independently of the parquet corpora the oracle
parity suite checks: repeated words, single-pair words, corpora where
the elected merge pair ties, and merges that collapse whole words
below the 2-symbol floor. Hypothesis generates small corpora and this
test runs BOTH formulations through Spark, comparing full sorted
outputs (not just the top-20 cut).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from idr_data_pipelines_spark.queries import _bpe_reseg

# words over a 3-letter alphabet maximize pair collisions and merge
# ties at small sizes
_word = st.text(alphabet="abc", min_size=2, max_size=6)
_doc = st.lists(_word, min_size=1, max_size=8).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _stream_form(words):
    """The pre-r10 token-stream formulation (reference semantics)."""
    p1 = (
        words.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = (
        p1.orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("bp"))
    )
    seg = (
        words.crossJoin(F.broadcast(best))
        .withColumn("syms", _bpe_reseg("word", "bp"))
        .filter(F.size("syms") >= 2)
    )
    return (
        seg.select(
            "bp",
            F.explode(
                F.zip_with(
                    F.expr("slice(syms, 1, size(syms) - 1)"),
                    F.expr("slice(syms, 2, size(syms) - 1)"),
                    lambda x, y: F.concat(x, F.lit("+"), y),
                )
            ).alias("pair"),
        )
        .groupBy("bp", "pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _weighted_form(words):
    """The r10 vocab-weighted formulation (engine shape under test)."""
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    p1 = (
        wf.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "wn",
        )
        .groupBy("pair")
        .agg(F.sum("wn").alias("n"))
    )
    best = (
        p1.orderBy(F.desc("n"), F.asc("pair"))
        .limit(1)
        .select(F.col("pair").alias("bp"))
    )
    seg = (
        wf.crossJoin(F.broadcast(best))
        .withColumn("syms", _bpe_reseg("word", "bp"))
        .filter(F.size("syms") >= 2)
    )
    return (
        seg.select(
            "bp",
            F.explode(
                F.zip_with(
                    F.expr("slice(syms, 1, size(syms) - 1)"),
                    F.expr("slice(syms, 2, size(syms) - 1)"),
                    lambda x, y: F.concat(x, F.lit("+"), y),
                )
            ).alias("pair"),
            "wn",
        )
        .groupBy("bp", "pair")
        .agg(F.sum("wn").alias("n"))
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_weighted_bpe_round_equals_stream_form(spark, corpus):
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    words = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .filter(F.length("word") >= 2)
    )
    got = {
        (r["bp"], r["pair"]): r["n"]
        for r in _weighted_form(words).collect()
    }
    want = {
        (r["bp"], r["pair"]): r["n"]
        for r in _stream_form(words).collect()
    }
    assert got == want
