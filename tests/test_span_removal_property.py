"""Property: ``remove_duplicate_spans`` matches a direct Python
reference on generated corpora — tiny vocab so cross-doc k-gram
collisions are common, uneven doc lengths so the shorter-than-k and
all-removed edges appear, duplicate texts so whole docs vanish.

The reference recomputes the contract from scratch (token k-grams,
document frequency over distinct ids, covered-position union, rejoin)
with none of the operator's machinery, so a bug in the explode /
semi-join / collect_set / HOF-filter chain cannot hide in the oracle
the way a shared SQL formulation could.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from idr_data_pipelines_spark.llmdata.dedup import remove_duplicate_spans

VOCAB = ["a", "b", "c", "d"]

DOCS = st.lists(
    st.one_of(
        st.none(),  # NULL text: pass-through contract (r14)
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(
            lambda toks: " ".join(toks)
        ),
    ),
    min_size=1,
    max_size=8,
)


def _reference(texts: list[str | None], k: int, min_df: int):
    # empty text splits to [''] like Spark's split on the empty string;
    # None text yields all-None outputs and joins no gram
    toked = {
        i: (t.strip().lower().split() or [""])
        for i, t in enumerate(texts)
        if t is not None
    }
    df_count: dict[tuple, set] = {}
    for i, toks in toked.items():
        for p in range(len(toks) - k + 1):
            df_count.setdefault(tuple(toks[p : p + k]), set()).add(i)
    dup = {g for g, ids in df_count.items() if len(ids) >= min_df}
    out = {
        i: (None, None, None) for i, t in enumerate(texts) if t is None
    }
    for i, toks in toked.items():
        removed = set()
        for p in range(len(toks) - k + 1):
            if tuple(toks[p : p + k]) in dup:
                removed.update(range(p, p + k))
        kept = [t for j, t in enumerate(toks) if j not in removed]
        out[i] = (" ".join(kept), len(toks), len(removed))
    return out


@settings(max_examples=10, deadline=None)
@given(texts=DOCS, k=st.integers(min_value=1, max_value=3).map(lambda x: x + 1))
def test_remove_duplicate_spans_matches_reference(spark, texts, k):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(
            df, "doc_id", "text", k=k, min_df=2
        ).collect()
    }
    assert got == _reference(texts, k, 2)
