"""Registry hygiene: keep the README's coverage claims and the
NO_ORACLE verification policy mechanically honest as the query
catalog grows (VERDICT r07 item 8).

Three invariants:

1. The registry partitions exactly: every ``QUERIES`` key is oracled
   XOR rows-only, with no dangling ``ORACLES`` entries.
2. The README's headline counts (total / oracled) match the code —
   docs cannot silently drift from the registry.
3. Every ``NO_ORACLE`` entry's docstring states its verification
   story: either it names its value-hash-oracled portable twin
   (``see <name>`` where ``<name>`` is an ``ORACLES`` key) or it
   explicitly says its bounds/invariants are pinned by tests. A
   rows-only entry with neither is unverifiable surface — exactly
   what the round-6 portable-twin strategy exists to prevent.
"""

from __future__ import annotations

import os
import re

from idr_data_pipelines_spark.queries import NO_ORACLE, ORACLES, QUERIES

README = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")


def test_registry_partitions_exactly():
    assert set(ORACLES) | set(NO_ORACLE) == set(QUERIES)
    assert not (set(ORACLES) & set(NO_ORACLE))
    assert set(ORACLES) <= set(QUERIES)


def test_every_oracle_self_caps():
    """r10 policy (VERDICT r09 item 2): every oracle carries its own
    ``SET memory_limit`` prefix, bounding DuckDB buffer-manager mmap
    churn in any driver topology (the r08 vm.max_map_count OOM class)
    and making shared-connection state leakage moot. A registry
    addition that bypasses the policy block (e.g. a late
    ``ORACLES[...] =`` after it) would silently reopen the class —
    pin it here."""
    for name, sql in ORACLES.items():
        assert sql.lstrip().startswith("SET memory_limit="), (
            f"{name} oracle is not self-capped — it was probably "
            "assigned after the self-cap policy block in queries.py"
        )
        # exactly one cap: a second embedded SET would indicate the
        # policy block wrapped an already hand-prefixed oracle
        assert sql.count("SET memory_limit") == 1, name


def test_readme_counts_match_registry():
    text = open(README).read()
    m = re.search(
        r"\((\d+) `queries\(\)` entries total, (\d+)\s*\n?oracle-checked", text
    )
    assert m, "README registry-count claim not found"
    assert int(m.group(1)) == len(QUERIES), (
        f"README claims {m.group(1)} entries, registry has {len(QUERIES)} — "
        "update README.md"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"README claims {m.group(2)} oracled, registry has {len(ORACLES)} — "
        "update README.md"
    )


def test_no_oracle_docstrings_state_verification():
    oracled = set(ORACLES)
    for name in sorted(NO_ORACLE):
        doc = QUERIES[name].__doc__ or ""
        twins = [
            t
            for t in re.findall(r"see\s+`{0,2}(\w+)`{0,2}", doc)
            if t in oracled
        ]
        pinned = re.search(r"(pinned|asserted|invariants?).{0,60}test", doc, re.S) or re.search(
            r"test.{0,60}(pinned|asserted|bound)", doc, re.S
        )
        assert twins or pinned, (
            f"{name}: rows-only entry must name its oracled twin "
            f"('see <name>') or state that its bounds are test-pinned; "
            f"docstring: {doc[:200]!r}"
        )


def test_frozen_forms_contract():
    """bench.py times queries.FROZEN_FORMS for the three frozen
    headline names whose registry slots became invariant-summary
    wrappers in r11. The frozen series stays honest only if (a) every
    FROZEN_FORMS key is a live registry name, (b) the frozen callable
    is NOT the registry callable (else the override is dead code and
    the series silently re-times the wrapper), and (c) the frozen
    names are exactly the headline-frozen trio — additions would
    change what BENCH_r{N} measures without a visible diff in
    bench.py."""
    from idr_data_pipelines_spark.queries import FROZEN_FORMS, QUERIES

    assert set(FROZEN_FORMS) == {
        "text_winnow_fingerprint",
        "dedup_minhash_lsh",
        "dedup_simhash",
    }
    for name, fn in FROZEN_FORMS.items():
        assert name in QUERIES
        assert fn is not QUERIES[name], name


def test_table_handle_cache_is_per_app_and_plan_only(spark):
    """r14: ``_t`` caches the RESOLVED scan handle per
    (applicationId, sf_dir, table) — a catalog-style resolution
    cache, not a data/result cache. Pin (a) same key → same handle,
    (b) different sf_dir → different handle, (c) the cached object is
    a plain unresolved-scan DataFrame whose actions still read the
    files (row count matches a fresh read)."""
    from idr_data_pipelines_spark import queries as Q

    sf1, sf2 = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    a = Q._t(spark, sf1, "region")
    b = Q._t(spark, sf1, "region")
    c = Q._t(spark, sf2, "region")
    assert a is b
    assert a is not c
    fresh = spark.read.parquet(f"{sf1}/region.parquet")
    assert a.count() == fresh.count()
    assert a.schema == fresh.schema
