"""Repetition / quality filters for training-data curation
(Gopher-style, Rae et al. 2021 §A1.1; C4, Raffel et al. 2020 §2.2).

Repetitious documents (boilerplate, scraped navigation, generated
spam) are the classic low-quality signal. All metrics here are
computed per document with array higher-order functions inside one
JVM projection — **no shuffle, no Python**: at 100 TB this stage is a
pure map over the corpus scan, pipelined with whatever filter
consumes the flags.

The per-document mode computation (``top k-gram count``) is O(d·n)
array work per doc (d = distinct k-grams); documents are bounded
(split upstream), so this beats the explode → groupBy → window
alternative, which would shuffle the whole exploded corpus twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from idr_data_pipelines_spark.llmdata.dedup import _let, _tokens


def _sql_ref(col: Column | str) -> str | None:
    """Backtick-quoted SQL reference for a plain column NAME; ``None``
    for a ``Column`` input, which keeps the general builder path.

    Why a string path exists at all: building these metric trees
    through the Python Column API costs one py4j round-trip per node —
    ~0.33 s per ``repetition_metrics`` call and ~0.4 s per
    ``gopher_repetition_pass`` call, measured r14 — which puts the
    DRIVER in the hot path of every consumer (the flagship recipe and
    the repetition query pay it on every build). Rendering the SAME
    expression tree as one parsed SQL string costs ~1 ms. Both paths
    are pinned value-identical by
    ``test_repetition_metrics_sql_path_matches_column_path``.

    Guards (r15, shared with ``dedup._sql_ref``): only simple
    identifiers (dotted names resolve differently under backticks)
    and only when ``spark.sql.parser.escapedStringLiterals`` is off
    (that conf re-interprets the twins' regex literals)."""
    from idr_data_pipelines_spark.llmdata.dedup import _sql_ref as _d

    return _d(col)


def _tokens_sql(ref: str) -> str:
    """SQL text of ``_tokens``: whitespace-split lowered trimmed text."""
    return r"split(lower(trim(" + ref + r")), '\\s+')"


def _dup_frac_sql(arr_sql: str) -> str:
    """SQL text of ``_dup_frac`` over an array expression — the same
    let-bound ``1 - distinct/total`` tree ``_dup_frac`` builds."""
    return (
        "element_at(transform(array(" + arr_sql + "), __a -> "
        "CASE WHEN size(__a) <= 1 THEN 0.0D "
        "ELSE 1.0D - CAST(size(array_distinct(__a)) AS DOUBLE)"
        " / CAST(size(__a) AS DOUBLE) END), 1)"
    )


def _top_ngram_sql(ref: str, k: int) -> str:
    """SQL text of ``top_ngram_fraction`` — the identical let-bound
    grams + sorted-run-fold tree (the ``run`` subexpression appears
    twice below because the Column form references the same Column
    object twice, which inlines the subtree twice)."""
    run = (
        "CASE WHEN __acc.prev IS NULL OR __acc.prev != __x "
        "THEN 1 ELSE __acc.run + 1 END"
    )
    agg = (
        "aggregate(array_sort(__g), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        f"(__acc, __x) -> named_struct('prev', __x, 'run', {run}, "
        f"'best', greatest(__acc.best, {run}))).best"
    )
    grams = (
        f"transform(sequence(0, size(__t) - {k}), "
        f"__i -> array_join(slice(__t, __i + 1, {k}), ' '))"
    )
    inner = (
        f"element_at(transform(array({grams}), __g -> "
        f"CAST({agg} AS DOUBLE) / CAST(size(__g) AS DOUBLE)), 1)"
    )
    return (
        f"element_at(transform(array({_tokens_sql(ref)}), __t -> "
        f"CASE WHEN size(__t) < {k} THEN 0.0D ELSE {inner} END), 1)"
    )


def _dup_frac(arr: Column) -> Column:
    """1 - distinct/total over a non-empty array; 0.0 for empty/size-1.

    ``arr`` is usually an inline split expression, which projection
    collapsing would otherwise inline into all three references (two
    sizes + array_distinct = three tokenizations per row) — bind it
    once (the r13 word_shingles lens; constant-factor here, not the
    O(n²) shape, but free to fix)."""

    def frac(a: Column) -> Column:
        n = F.size(a)
        return F.when(n <= 1, F.lit(0.0)).otherwise(
            F.lit(1.0)
            - F.size(F.array_distinct(a)).cast("double") / n.cast("double")
        )

    return _let(arr, frac)


def dup_word_fraction(col: Column | str = "text") -> Column:
    """Fraction of word occurrences that are repeats of an earlier
    word: ``1 - distinct_words / words``."""
    ref = _sql_ref(col)
    if ref is not None:
        return F.expr(_dup_frac_sql(_tokens_sql(ref)))
    return _dup_frac(_tokens(col))


def dup_line_fraction(col: Column | str = "text") -> Column:
    """Fraction of duplicate lines (Gopher: drop if > 0.30). Lines are
    verbatim ``\\n`` splits — no normalization, matching the paper."""
    ref = _sql_ref(col)
    if ref is not None:
        return F.expr(_dup_frac_sql(r"split(" + ref + r", '\\n')"))
    c = F.col(col) if isinstance(col, str) else col
    return _dup_frac(F.split(c, r"\n"))


def top_ngram_fraction(col: Column | str = "text", k: int = 2) -> Column:
    """Fraction of k-gram occurrences taken by the single most common
    k-gram (Gopher: drop if top-2-gram fraction > 0.20). Documents
    with < k tokens score 0.0."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ref = _sql_ref(col)
    if ref is not None:
        return F.expr(_top_ngram_sql(ref, k))

    def frac(toks: Column) -> Column:
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )

        def top_count(g: Column) -> Column:
            # mode COUNT = longest equal-run of the sorted gram array,
            # one O(n) fold — the naive per-distinct filter scan is
            # O(d·n) string compares per document, which dominated the
            # whole recipe's runtime (~160k compares for a 400-token
            # doc vs ~400 here); the count is identical by definition
            def step(acc: Column, x: Column) -> Column:
                fresh = acc["prev"].isNull() | (acc["prev"] != x)
                run = F.when(fresh, F.lit(1)).otherwise(acc["run"] + 1)
                return F.struct(
                    x.alias("prev"),
                    run.alias("run"),
                    F.greatest(acc["best"], run).alias("best"),
                )

            return F.aggregate(
                F.array_sort(g),
                F.struct(
                    F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0).alias("best"),
                ),
                step,
            )["best"]

        return F.when(n < F.lit(k), F.lit(0.0)).otherwise(
            _let(grams, lambda g: top_count(g).cast("double") / F.size(g).cast("double"))
        )

    return _let(_tokens(col), frac)


def repetition_metrics(text_col: Column | str = "text") -> dict[str, Column]:
    """All repetition signals as named columns (compose with
    ``text.quality_score`` for the full Gopher filter set)."""
    return {
        "dup_word_frac": dup_word_fraction(text_col),
        "dup_line_frac": dup_line_fraction(text_col),
        "top_bigram_frac": top_ngram_fraction(text_col, 2),
        "top_trigram_frac": top_ngram_fraction(text_col, 3),
    }


def _gopher_pass_from(
    m: dict[str, Column],
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
    max_top_trigram_frac: float = 0.18,
) -> Column:
    """The Gopher repetition rule over ALREADY-BUILT metric columns
    (thresholds from Rae et al. 2021 table A1; tune per corpus)."""
    return (
        (m["dup_line_frac"] <= F.lit(max_dup_line_frac))
        & (m["top_bigram_frac"] <= F.lit(max_top_bigram_frac))
        & (m["top_trigram_frac"] <= F.lit(max_top_trigram_frac))
    )


def gopher_repetition_pass(
    text_col: Column | str = "text",
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
    max_top_trigram_frac: float = 0.18,
) -> Column:
    """Boolean pass flag for the Gopher repetition rules, built from
    fresh metric expressions — standalone-use form; composers that
    already hold the metric columns should apply ``_gopher_pass_from``
    over those instead of paying the n-gram machinery twice."""
    return _gopher_pass_from(
        repetition_metrics(text_col),
        max_dup_line_frac,
        max_top_bigram_frac,
        max_top_trigram_frac,
    )


def add_repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append every repetition metric plus the Gopher pass flag. The
    flag compares the APPENDED columns (r10 review: building it from
    fresh expressions ran the whole tokenize + n-gram + array_sort
    machinery twice per row — bigram and trigram each — in the same
    projection)."""
    out = df.withColumns(repetition_metrics(text_col))
    return out.withColumn(
        "gopher_rep_pass",
        _gopher_pass_from({k: F.col(k) for k in (
            "dup_line_frac", "top_bigram_frac", "top_trigram_frac"
        )}),
    )


def score_buckets(
    df: DataFrame,
    score_col: str,
    group_col: str,
    bucket_col: str = "bucket",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet-style per-group quantile bucketing (Wenzek et al. 2020
    §4.3: head/middle/tail by per-language perplexity terciles):
    label every row ``low`` / ``mid`` / ``high`` by where its score
    falls against its OWN group's quantiles — the fair way to
    threshold heterogeneous sources, where one source's median would
    be another's tail.

    Scale shape: one exact-percentile aggregate collapses to |groups|
    threshold rows, broadcast back onto the corpus — the corpus never
    shuffles (the aggregate's exchange moves score values only). Ties
    at a cut go to the lower bucket (``<=``), identically in SQL.

    Null handling (r09 review): a null ``group_col`` is its own group
    (null-safe join — a plain inner join silently DROPPED every
    null-group row), and a null score gets a null bucket (the old
    ``otherwise`` chain landed null-perplexity docs in 'high', the
    best CCNet bucket, surviving every tail filter)."""
    thr = df.groupBy(group_col).agg(
        F.percentile(score_col, F.lit(cuts[0])).alias("__p1"),
        F.percentile(score_col, F.lit(cuts[1])).alias("__p2"),
    )
    thr = thr.withColumnRenamed(group_col, "__g")
    s = F.col(score_col)
    return (
        df.join(
            F.broadcast(thr), F.col(group_col).eqNullSafe(F.col("__g"))
        )
        .withColumn(
            bucket_col,
            F.when(s.isNull(), F.lit(None).cast("string"))
            .when(s <= F.col("__p1"), F.lit("low"))
            .when(s <= F.col("__p2"), F.lit("mid"))
            .otherwise(F.lit("high")),
        )
        .drop("__g", "__p1", "__p2")
    )
