"""Registry-wide scalability gate (VERDICT r07 item 7): every entry
in ``QUERIES`` must plan without a fatal ``plans.lint`` finding —
cartesian products, row-at-a-time Python UDFs, uncollapsed global
windows — at sf0.001, with an explicit, individually justified waiver
list. ``tests/test_plans.py`` pins richer per-shape properties for
the headline queries; this gate is the breadth complement: no entry
can regress into a scale-killer plan unnoticed, including ones added
after this test was written.

Marked ``plan_gate`` so the sweep can be split out of quick runs:
``pytest -m plan_gate`` / ``-m "not plan_gate"``.
"""

from __future__ import annotations

import pytest

from idr_data_pipelines_spark.plans.lint import lint_plan
from idr_data_pipelines_spark.queries import QUERIES

# Waivers: entries whose fatal finding is a documented, deliberate
# design the linter cannot prove safe from plan text alone. Each value
# is the justification the waiver asserts against (the finding's rule
# must match, so a DIFFERENT fatal appearing in a waived query still
# fails the gate).
WAIVERS: dict[str, str] = {
    # Brute-force cosine top-k: the broadcast side is the QUERY SET
    # (vec_id < 8 pushed to the scan) — O(corpus × |queries|) with
    # |queries| a small constant. This is the documented exact
    # baseline the LSH/IVF entries are measured against; the linter
    # cannot see the filter's selectivity, a human can.
    "ann_topk_bruteforce": "cartesian-product",
    "ann_topk_quantized": "cartesian-product",
    "ann_recall_eval": "cartesian-product",
    "ann_ivfpq_recall": "cartesian-product",
    # r11 invariant form: embeds the same brute-force baseline
    # (broadcast 8-query set × corpus) to pin the subset-max bound
    # ivf_top1 <= brute_top1 — the identical waived shape as
    # ann_topk_bruteforce above.
    "ann_topk_ivf": "cartesian-product",
    # Deliberate demo of the Python UDTF API surface (SURVEY §2.9);
    # the hot-path text operators use JVM expressions instead.
    "udtf_split_sentences": "python-row-udf",
    # r12 semantic decontamination: the broadcast side is the
    # BENCHMARK embedding set (vec_id < 8 pushed to the scan) —
    # O(corpus × |bench|) by design, the same exact-screen family as
    # ann_topk_bruteforce; LEFT keeps corpus rows under an empty
    # benchmark. The LSH-bucketed composition is the scale path for
    # large benchmarks (operator docstring).
    "decontaminate_semantic": "cartesian-product",
    # r13 recall eval: embeds the exact twin as ground truth — the
    # identical waived shape as ann_recall_eval.
    "decontaminate_semantic_recall": "cartesian-product",
}


@pytest.mark.plan_gate
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_fatal_plan_findings(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    fatals = [f for f in lint_plan(df) if f.severity == "fatal"]
    waived_rule = WAIVERS.get(name)
    fatals = [f for f in fatals if f.rule != waived_rule]
    assert not fatals, (
        f"{name}: fatal plan finding(s) "
        + "; ".join(f"{f.rule}: {f.detail}" for f in fatals)
    )


def test_waivers_are_known():
    assert set(WAIVERS) <= set(QUERIES)


@pytest.mark.plan_gate
@pytest.mark.parametrize("name", sorted(WAIVERS))
def test_waivers_are_live(name, spark, sf_dir):
    """A waiver whose query no longer trips its waived fatal is stale
    — the gate must fail it so the list shrinks with the code (ADVICE
    r08: the old form only checked the keys existed, so a stale
    waiver would pass forever, eroding the gate's tightness)."""
    df = QUERIES[name](spark, sf_dir)
    rules = {f.rule for f in lint_plan(df) if f.severity == "fatal"}
    assert WAIVERS[name] in rules, (
        f"stale waiver: {name} no longer trips '{WAIVERS[name]}' "
        f"(fatals now: {sorted(rules) or 'none'}) — delete the waiver"
    )
