"""Property tests (hypothesis) for the deterministic sampling layer's
round-7 additions: shuffle_shards against an exact pure-Python md5
model (the operator's whole value is bit-reproducibility, so the test
is equality, not approximation), and temperature_mix_shares against
the closed-form share formula."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from idr_data_pipelines_spark.llmdata.sampling import (
    shuffle_shards,
    temperature_mix_shares,
)


def _py_shuffle_shards(
    keys: list[int], n_shards: int, epoch: int
) -> dict[int, tuple[int, int]]:
    """Reference model: shard = 60-bit md5 prefix mod n_shards; pos =
    1-based rank of (full md5 hex, key) within the shard."""
    seed = f"shuffle:{epoch}:"
    h = {k: hashlib.md5((seed + str(k)).encode()).hexdigest() for k in keys}
    shard = {k: int(h[k][:15], 16) % n_shards for k in keys}
    out: dict[int, tuple[int, int]] = {}
    for s in set(shard.values()):
        members = sorted(
            (k for k in keys if shard[k] == s), key=lambda k: (h[k], k)
        )
        for i, k in enumerate(members):
            out[k] = (s, i + 1)
    return out


@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    n_shards=st.integers(min_value=1, max_value=7),
    epoch=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=8, deadline=None)
def test_shuffle_shards_matches_md5_model_exactly(keys, n_shards, epoch, spark):
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_shards(df, "doc_id", n_shards, epoch=epoch).collect()
    }
    assert got == _py_shuffle_shards(keys, n_shards, epoch)


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=500), min_size=1, max_size=6
    ),
    alpha=st.sampled_from([0.0, 0.3, 0.5, 1.0]),
)
@settings(max_examples=8, deadline=None)
def test_temperature_mix_shares_closed_form(counts, alpha, spark):
    rows = [(f"s{i}",) for i, n in enumerate(counts) for _ in range(n)]
    df = spark.createDataFrame(rows, ["source"])
    got = {
        r.source: r
        for r in temperature_mix_shares(df, "source", alpha=alpha).collect()
    }
    tot = float(sum(counts))
    wtot = sum(float(n) ** alpha for n in counts)
    for i, n in enumerate(counts):
        r = got[f"s{i}"]
        assert r.n == float(n)
        assert abs(r.nat_share - n / tot) < 1e-12
        want_temp = (float(n) ** alpha) / wtot
        assert abs(r.temp_share - want_temp) < 1e-12
        assert abs(r.boost - want_temp * tot / n) < 1e-9
    assert abs(sum(r.temp_share for r in got.values()) - 1.0) < 1e-9
