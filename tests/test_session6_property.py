"""Property tests (hypothesis) for the session-6 numeric/string
kernels: the lag-algebra EWMA vs a pure-Python replay over generated
value streams (nulls, duplicates, any length), and the replace-based
BPE re-segmentation vs a pure-Python greedy merger over generated
words and merge pairs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from idr_data_pipelines_spark.queries import (
    _EWMA_WEIGHTS,
    _bpe_reseg,
    _ewma_lag_algebra,
)


def _py_ewma(values: list[float | None]) -> list[float | None]:
    out: list[float | None] = []
    for i in range(len(values)):
        num = den = 0.0
        for j, wt in enumerate(_EWMA_WEIGHTS):
            if i - j < 0:
                break
            v = values[i - j]
            if v is not None:
                num += wt * v
                den += wt
        out.append(round(num / den, 6) if den > 0 else None)
    return out


@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None)
def test_ewma_lag_algebra_matches_python_model(values, spark):
    rows = [(i, float(v) if v is not None else None) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "pos long, value double")
    w = Window.partitionBy(F.lit(1)).orderBy("pos")
    got = {
        r["pos"]: r["ewma"]
        for r in df.select(
            "pos", _ewma_lag_algebra(w, "value").alias("ewma")
        ).collect()
    }
    want = _py_ewma(values)
    for i, wv in enumerate(want):
        if wv is None:
            assert got[i] is None, i
        else:
            assert got[i] is not None and abs(got[i] - wv) < 1e-6, i


def _py_greedy_merge(word: str, bp: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(word):
        if word[i : i + 2] == bp:
            out.append(bp)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return out


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=2, max_size=16),
        min_size=1,
        max_size=12,
    ),
    bp=st.text(alphabet="abcd", min_size=2, max_size=2),
)
@settings(max_examples=10, deadline=None)
def test_bpe_reseg_matches_greedy_python(words, bp, spark):
    """The replace-based re-segmentation IS greedy left-to-right
    non-overlapping pairing — including the overlap traps ('aaa' with
    'aa', 'abab' with 'ba') — for every generated word and pair."""
    df = spark.createDataFrame(
        [(w,) for w in words], "word string"
    ).withColumn("bp", F.lit(bp))
    got = {
        r["word"]: r["syms"]
        for r in df.select("word", _bpe_reseg("word", "bp").alias("syms")).collect()
    }
    # duplicate words collapse in the dict; compare per distinct word
    for w in set(words):
        assert got[w] == _py_greedy_merge(w, bp), (w, bp, got[w])
