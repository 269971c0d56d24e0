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

import numpy as np
import pandas as pd
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


def _exploded_ngrams(corpus, id_col, text_col, k):
    """(id, n_ngrams, ngram) — one row per document n-gram, each row
    carrying its document's total. The ONE corpus-side explode both
    scorers run (r09 review: previously copy-pasted in exact + bloom,
    where the documented "final counts are IDENTICAL" contract was
    enforced by nothing structural)."""
    return corpus.select(
        F.col(id_col), word_shingles(text_col, k).alias("__ngrams")
    ).select(
        id_col,
        F.size("__ngrams").alias("n_ngrams"),
        F.explode_outer("__ngrams").alias("ngram"),
    )


def _contam_rollup(marked: DataFrame, id_col: str) -> DataFrame:
    """Doc-keyed contamination rollup over hit-marked n-gram rows
    (``__hit`` non-null on benchmark matches) — the shared scoring
    contract of the exact and bloom operators."""
    return (
        marked.groupBy(id_col)
        .agg(
            F.max("n_ngrams").alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
        )
        .withColumn(
            "contam_ratio",
            F.col("n_matched").cast("double") / F.col("n_ngrams").cast("double"),
        )
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

    exploded = _exploded_ngrams(corpus, id_col, text_col, k)
    return _contam_rollup(exploded.join(ngrams, "ngram", "left"), id_col)


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_ratio: float = 0.0,
    broadcast_bench: bool = True,
    broadcast_flagged: bool = True,
) -> DataFrame:
    """Drop every corpus document whose contamination ratio exceeds
    ``max_ratio`` (default 0.0 — any shared n-gram disqualifies).
    Returns the surviving corpus rows with their original columns.

    Two INDEPENDENT broadcast decisions, driven by different sizes
    (r10 review — one flag coupling them penalized the common
    huge-benchmark/low-contamination regime):

    - ``broadcast_bench`` governs the n-gram probe join and is sized
      by the BENCHMARK's distinct k-grams — pass False when the
      benchmark n-gram set exceeds the broadcast ceiling.
    - ``broadcast_flagged`` governs the final anti-join and is sized
      by the FLAGGED id set, which is corpus-bounded: contamination
      is normally the exception (ids broadcast, the surviving 99%+
      of the corpus never shuffles — keep the default True even with
      a huge benchmark), but with ``max_ratio=0.0`` against a
      high-overlap benchmark a large corpus fraction can be flagged
      past the ceiling (ADVICE r09) — pass False to run the
      anti-join as a plain shuffle that scales with the flagged
      fraction instead of capping it."""
    scores = contamination_scores(
        corpus, bench, id_col, text_col, k, broadcast_bench
    )
    bad = scores.filter(F.col("contam_ratio") > F.lit(max_ratio)).select(id_col)
    if broadcast_flagged:
        bad = F.broadcast(bad)
    return corpus.join(bad, id_col, "left_anti")


# ------------------------------------------------ Bloom-filter variant

def bloom_positions(col, n_bits: int = 1 << 20, n_hashes: int = 3):
    """The ``n_hashes`` md5-derived bit positions of a string — the
    same engine-portable md5 hash family as ``sampling.hash_bucket``,
    salted per hash index. Pure JVM projection."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"bloom{i}:"), col)), 1, 15
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(n_bits),
            )
            for i in range(n_hashes)
        ]
    )


def bloom_bitmap(
    ngrams: DataFrame,
    col: str = "ngram",
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
):
    """Build the Bloom bitmap (packed ``numpy.uint8``, ``n_bits/8``
    bytes) from the benchmark n-gram set. Positions are combined into
    64-bit WORDS cluster-side (``bit_or`` per word index, map-side
    combined), so what crosses to the driver is one (index, word) row
    per 64-bit word containing any set bit — ≤ n_bits/64 rows and in
    practice |positions|/densityϵ far fewer; the raw position set
    never materializes driver-side. A benchmark whose n-gram strings
    are tens of GB still compresses to the 128 MB bitmap at
    ``n_bits = 2^30`` (≤ 16.7M word rows at full saturation — at that
    density grow n_bits instead). NULL inputs hash to NULL positions
    and are dropped: a NULL key never matches an exact join."""
    if n_bits % 8:
        # validate BEFORE the cluster-side aggregation: failing after
        # the full explode/bit_or/collect wastes an entire Spark job
        raise ValueError("n_bits must be a multiple of 8")
    words = (
        ngrams.select(
            F.explode(bloom_positions(F.col(col), n_bits, n_hashes)).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .select(
            F.expr("p >> 6").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    bm = np.zeros(n_bits >> 3, dtype=np.uint8)
    if words:
        idx = np.array([r["w"] for r in words], dtype=np.int64)
        vals = np.array([r["bits"] for r in words], dtype=np.int64).view(np.uint64)
        # scatter each word into its 8 bytes explicitly (bit p ->
        # byte p>>3, bit p&7) — endian-independent, unlike a uint64
        # view of the byte array, and safe for n_bits that end in a
        # partial final word (out-of-range byte slots are masked;
        # their bits are provably zero since every p < n_bits)
        byte_idx = (idx[:, None] * 8 + np.arange(8)[None, :]).ravel()
        byte_val = (
            (vals[:, None] >> (8 * np.arange(8, dtype=np.uint64))[None, :])
            & np.uint64(0xFF)
        ).astype(np.uint8).ravel()
        ok = byte_idx < bm.shape[0]
        np.bitwise_or.at(bm, byte_idx[ok], byte_val[ok])
    return bm


def make_bloom_probe(bbm):
    """Vectorized membership pandas UDF over JVM-computed position
    arrays against a broadcast bitmap ``bbm`` — the ONE shared probe
    used by every bloom consumer (decontamination, join prefilter).
    NULL inputs (null elements inside a non-null position array) route
    to False instead of garbage-indexing."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        m = bbm.value
        out = np.zeros(len(pos), dtype=bool)
        ok = pos.notna().to_numpy()
        if ok.any():
            P = np.stack(pos[ok].to_numpy()).astype(np.float64)
            good = np.isfinite(P).all(axis=1)
            res = np.zeros(P.shape[0], dtype=bool)
            if good.any():
                Pi = P[good].astype(np.int64)
                res[good] = ((m[Pi >> 3] >> (Pi & 7)) & 1).all(axis=1)
            out[ok] = res
        return pd.Series(out)

    return might_contain


def contamination_scores_bloom(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """``contamination_scores`` with a Bloom-filter prefilter — the
    100 TB shape when the benchmark n-gram set itself is too large to
    broadcast as strings: corpus n-grams first probe a broadcast
    bitmap (no false negatives, so final counts are IDENTICAL to the
    exact operator — the oracle is the exact SQL), and ONLY the
    bloom-candidate subset reaches the exact verify, which runs as a
    plain SHUFFLE semi-join against the benchmark n-grams. (r10
    review: the old plan broadcast the full benchmark string set as
    the verify side and left-joined every corpus n-gram against it —
    the exact OOM and per-row cost this operator exists to avoid, so
    the prefilter saved nothing. The candidate FILTER is what a
    left-join condition could never do: prune left rows before the
    join.)

    The probe is the one justified Python stage: bitmap membership has
    no built-in, so it runs as an Arrow-batched pandas UDF over the
    JVM-computed position arrays (vectorized ``(bm[p>>3] >> (p&7)) & 1``
    — never per-row Python). The price of the pruning is a second
    doc-keyed aggregate (totals ride the pre-filter frame, matches the
    post-verify one, re-joined on the id) — two candidate-sized
    shuffles instead of an unbounded broadcast."""
    bench_ng = benchmark_ngrams(bench, text_col, k)
    bm = bloom_bitmap(bench_ng, "ngram", n_bits, n_hashes)
    bbm = corpus.sparkSession.sparkContext.broadcast(bm)
    might_contain = make_bloom_probe(bbm)

    exploded = _exploded_ngrams(corpus, id_col, text_col, k)
    # totals ride the RAW exploded frame — the probe lives only on
    # the candidate branch, so the plan carries exactly ONE Arrow
    # stage (the totals branch re-evaluates the cheap tokenize, not
    # the bitmap probe)
    totals = exploded.groupBy(id_col).agg(
        F.max("n_ngrams").alias("n_ngrams")
    )
    matched = (
        exploded.withColumn(
            "__cand",
            might_contain(
                bloom_positions(F.col("ngram"), n_bits, n_hashes)
            ),
        )
        .filter(F.col("__cand"))
        .join(bench_ng, "ngram", "semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        totals.join(matched, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce(F.col("n_matched"), F.lit(0).cast("bigint")).alias(
                "n_matched"
            ),
        )
        .withColumn(
            "contam_ratio",
            F.col("n_matched").cast("double")
            / F.col("n_ngrams").cast("double"),
        )
    )


def decontaminate_semantic(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """SEMANTIC decontamination: flag corpus embeddings whose cosine
    against ANY benchmark embedding reaches ``threshold`` — the
    embedding-space twin of the n-gram collision screen above, for
    leakage that survives paraphrase (n-gram overlap near zero, cosine
    near one). Returns one row per corpus vector:
    ``(id_col, max_cos_r, n_bench_hits, contaminated)``.

    Scale shape (100 TB corpus, benchmark ≪ corpus — the same
    asymmetry contract as ``decontaminate``): the benchmark side is
    BROADCAST, the corpus never shuffles its vectors, and the per-id
    rollup map-side combines |bench| scored rows per document down to
    one before the single exchange. Cost is |corpus|·|bench| JVM
    array-fold cosines — exact by construction; for benchmark sets
    too large to brute-force, pre-bucket both sides with
    ``similarity.lsh_bucket`` and screen per bucket (the candidate
    recall trade documented on ``cosine_topk_lsh``).

    A LEFT broadcast join keeps every corpus row when the benchmark
    is EMPTY (``max_cos_r`` null, zero hits, not contaminated) — a
    vacuously-clean screen stays visible instead of returning zero
    rows. Cosines are the module's sequential JVM folds (``dot`` /
    ``norm``), so a SQL oracle replays every value bit-for-bit
    (``list_reduce`` left fold); the flag compares the UNROUNDED max.
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [-1, 1] (a cosine)")
    from idr_data_pipelines_spark.llmdata.similarity import (
        _as_double,
        dot_ref,
        norm,
    )

    c = corpus.select(
        F.col(id_col), _as_double(vec_col).alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    b = bench.filter(F.col(vec_col).isNotNull()).select(
        _as_double(vec_col).alias("__bv")
    ).withColumn("__bn", norm(F.col("__bv")))
    scored = c.join(F.broadcast(b), F.lit(True), "left").withColumn(
        "__cos",
        dot_ref("__cv", "__bv") / (F.col("__cn") * F.col("__bn")),
    )
    hit = F.when(F.col("__cos") >= F.lit(threshold), 1).otherwise(0)
    out = scored.groupBy(id_col).agg(
        F.max("__cos").alias("__maxc"),
        F.sum(hit).cast("long").alias("n_bench_hits"),
    )
    return out.select(
        id_col,
        F.round(F.col("__maxc"), 6).alias("max_cos_r"),
        "n_bench_hits",
        F.coalesce(
            F.col("__maxc") >= F.lit(threshold), F.lit(False)
        ).alias("contaminated"),
    )


def semantic_band_geometry(
    n_bench: int,
    bands: int = 4,
    candidates_per_row: float = 1.0,
) -> tuple[int, int]:
    """Size ``(bands, planes_per_band)`` for
    ``decontaminate_semantic_bucketed`` so the screen actually SCREENS
    (r13 VERDICT item 3).

    For sign-LSH over roughly isotropic embeddings, an UNRELATED pair
    collides in one r-plane band with probability ~2^-r, so the
    expected candidate volume is ~|corpus| * |bench| * bands / 2^r.
    Holding expected candidates per corpus row to
    ``candidates_per_row`` therefore needs

        planes_per_band = ceil(log2(bands * n_bench / candidates_per_row))

    — i.e. planes grow with the LOG of the benchmark size; doubling
    the benchmark costs one extra plane per band. ``bands`` buys
    recall (a true near-pair survives the OR over bands); 4 is a
    sound default, raise it and re-derive planes when the measured
    recall (``decontaminate_semantic_recall``-style eval against the
    exact twin on a sample) is short.

    The demo default on the operator (2x3 bits -> 8 band keys) is
    deliberately WEAK screening for tiny test fixtures: at
    |bench|=1000 it would pass ~a quarter of brute force, while this
    helper returns (4, 12) -> expected ~1 candidate per corpus row.
    """
    if n_bench < 1:
        raise ValueError("n_bench must be >= 1")
    if bands < 1:
        raise ValueError("bands must be >= 1")
    if candidates_per_row <= 0:
        raise ValueError("candidates_per_row must be > 0")
    import math

    r = max(
        1, math.ceil(math.log2(max(1.0, bands * n_bench / candidates_per_row)))
    )
    if bands * r > 63:
        raise ValueError(
            f"geometry {bands}x{r} needs {bands * r} sign bits; the "
            "int64 bucket holds 63 — lower bands or accept more "
            "candidates per row"
        )
    return bands, r


def decontaminate_semantic_bucketed(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    bands: int = 2,
    planes_per_band: int = 3,
    seed: int = 42,
    scale: int = 1_000_000,
) -> DataFrame:
    """``decontaminate_semantic`` at scale: LSH-pre-bucketed candidate
    generation instead of the exact |corpus|x|bench| broadcast scan.
    Both sides get ``bands x planes_per_band`` integer-exact sign-LSH
    bits (``similarity.int_lsh_bucket`` semantics, computed as one
    int64 matmul per Arrow batch); each vector explodes into ``bands``
    ``(band_idx, band_key)`` rows and candidates come from a broadcast
    EQUI-join on the band key — never all pairs, lint-clean. Exact
    cosine is computed on candidates only; the per-id rollup takes
    ``max(cos)`` and counts DISTINCT benchmark hits (a pair seen in
    two bands is scored twice but counted once).

    Recall trade (documented, measured in tests against the exact
    twin): a pair at cosine ``t`` collides in one r-plane band with
    probability ``(1 - acos(t)/pi)^r`` and survives the OR over
    ``bands`` bands — more/narrower bands raise recall at more
    candidate volume. Expected RANDOM-pair candidate volume is
    ~|corpus| * |bench| * bands / 2^planes_per_band; size the
    geometry with ``semantic_band_geometry`` (planes grow with
    log2(bands * |bench| / candidates_per_row)) — the 2x3 default
    here is a demo geometry for tiny fixtures, NOT a production
    screen (at |bench|=1000 it passes ~a quarter of brute force).
    ``tests/test_semantic_bucketed_property.py`` measures the trade
    at two geometries on clustered data: the sized geometry cuts
    random-pair candidates by orders of magnitude while matching or
    beating the demo geometry's recall. Flags are a SUBSET of the exact screen's
    (candidates are a subset of all pairs), so this is the
    high-recall-not-perfect screen a 100 TB corpus with a large
    benchmark actually runs; the exact twin stays the recall baseline.

    Scale shape: corpus vectors never shuffle (bucketing is a
    projection, the band explode a generate, the bench side broadcast);
    the single exchange is the per-id rollup's. A LEFT join keeps
    every corpus row — no-candidate rows surface as
    ``(max_cos_r null, 0 hits, not contaminated)`` — and corpus rows
    with NULL embeddings (unbucketable) are unioned back as the same
    vacuously-clean shape, matching the exact twin's contract.

    Buckets are exact bigint arithmetic end to end, so a SQL oracle
    replays candidate generation AND cosines bit-for-bit — the same
    full value-hash contract as ``cosine_topk_lsh_exact_bucket``.
    """
    if not -1.0 <= threshold <= 1.0:
        raise ValueError("threshold must be in [-1, 1] (a cosine)")
    if bands < 1 or planes_per_band < 1:
        raise ValueError("bands and planes_per_band must be >= 1")
    from idr_data_pipelines_spark.llmdata.similarity import (
        _int_lsh_bucket_table,
        dot_ref,
        norm,
    )

    n_planes = bands * planes_per_band
    mask = (1 << planes_per_band) - 1

    def band_rows(tbl, id_alias, vec_alias, nrm_alias):
        t = tbl.withColumn(nrm_alias, norm(F.col("__vec")))
        bexpr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    (
                        F.shiftright(F.col("bucket"), b * planes_per_band)
                        .bitwiseAND(F.lit(mask))
                    ).alias("band_key"),
                )
                for b in range(bands)
            ]
        )
        return t.select(
            F.col("id").alias(id_alias),
            F.col("__vec").alias(vec_alias),
            nrm_alias,
            F.explode(bexpr).alias("__band"),
        ).select(
            id_alias,
            vec_alias,
            nrm_alias,
            F.col("__band.band_idx").alias("band_idx"),
            F.col("__band.band_key").alias("band_key"),
        )

    c = band_rows(
        _int_lsh_bucket_table(corpus, id_col, vec_col, n_planes, seed, scale),
        "__cid",
        "__cv",
        "__cn",
    )
    b = band_rows(
        _int_lsh_bucket_table(bench, id_col, vec_col, n_planes, seed, scale),
        "__bid",
        "__bv",
        "__bn",
    )
    scored = c.join(
        F.broadcast(b), ["band_idx", "band_key"], "left"
    ).withColumn(
        "__cos",
        dot_ref("__cv", "__bv") / (F.col("__cn") * F.col("__bn")),
    )
    rollup = scored.groupBy("__cid").agg(
        F.max("__cos").alias("__maxc"),
        F.count_distinct(
            F.when(F.col("__cos") >= F.lit(threshold), F.col("__bid"))
        ).cast("long").alias("n_bench_hits"),
    )
    out = rollup.select(
        F.col("__cid").alias(id_col),
        F.round(F.col("__maxc"), 6).alias("max_cos_r"),
        "n_bench_hits",
        F.coalesce(
            F.col("__maxc") >= F.lit(threshold), F.lit(False)
        ).alias("contaminated"),
    )
    null_vec = corpus.filter(F.col(vec_col).isNull()).select(
        F.col(id_col),
        F.lit(None).cast("double").alias("max_cos_r"),
        F.lit(0).cast("long").alias("n_bench_hits"),
        F.lit(False).alias("contaminated"),
    )
    return out.unionByName(null_vec)
