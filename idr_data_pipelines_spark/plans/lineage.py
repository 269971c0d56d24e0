"""Column-level lineage from the analyzed logical plan.

``column_lineage(df)`` answers the governance question every
production pipeline eventually gets asked — *which source columns
feed this output column?* — by walking the Catalyst analyzed plan
bottom-up and propagating attribute provenance through aliases,
aggregates, windows, generators and set operations:

- leaf relations contribute ``(table, column)`` facts, where ``table``
  is derived from the scan's file location (``orders.parquet`` →
  ``orders``) when available, else the leaf node name;
- every named expression (Alias) maps its new attribute to the union
  of the sources of the attributes it references — so
  ``sum(a*b) AS rev`` carries both ``a`` and ``b``'s sources;
- Union merges children positionally (the analyzed plan reuses the
  first child's exprIds, so reference-chasing alone would drop the
  other children's provenance).

This is PROJECTION lineage (what flows into the value), not filter
lineage (what gated the rows) — the variant catalogs and impact
analysis want first.

Implementation note: unlike ``plans.lint`` (which deliberately stays
on the public ``df.explain()`` text), lineage needs exprId identity,
which only the Catalyst tree carries — so this module walks the JVM
plan via py4j and requires classic (non-Connect) mode. Cost is
driver-side plan traversal only; the query is never executed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["column_lineage", "lineage_report"]


def _seq(jseq):
    """Materialize a scala Seq/Iterable via its iterator."""
    out = []
    it = jseq.iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _leaf_label(node) -> str:
    """Human identity for a leaf: the basename of the scan location
    (minus a parquet/orc/csv/json suffix) when the relation exposes
    one, else the node's own name."""
    try:
        loc = node.relation().location()
        paths = _seq(loc.rootPaths())
        if paths:
            base = paths[0].getName()
            for suf in (".parquet", ".orc", ".csv", ".json", ".txt"):
                if base.endswith(suf):
                    base = base[: -len(suf)]
            return base
    except Exception:
        pass
    return node.nodeName()


def _attr_sources(expr, mapping) -> set:
    """Union of the known sources of every attribute ``expr``
    references (an attribute references itself)."""
    srcs: set = set()
    for ref in _seq(expr.references()):
        srcs |= mapping.get(ref.exprId().id(), set())
    return srcs


def _walk(node, mapping: dict) -> None:
    """Bottom-up provenance: children first, then this node's named
    expressions."""
    name = node.nodeName()
    children = _seq(node.children())
    for ch in children:
        _walk(ch, mapping)

    if not children:
        label = _leaf_label(node)
        for attr in _seq(node.output()):
            mapping.setdefault(attr.exprId().id(), set()).add(
                (label, attr.name())
            )
        return

    if name == "Union":
        outs = _seq(node.output())
        child_outs = [_seq(ch.output()) for ch in children]
        for i, attr in enumerate(outs):
            merged: set = set()
            for co in child_outs:
                if i < len(co):
                    merged |= mapping.get(co[i].exprId().id(), set())
            mapping[attr.exprId().id()] = merged
        return

    # generators (explode etc.) put their outputs in generatorOutput;
    # handle them BEFORE the generic loop — Generate.expressions()
    # also lists the output attributes themselves, and the generic
    # rule would map an attribute to its own (empty) sources
    if name == "Generate":
        gen_srcs = _attr_sources(node.generator(), mapping)
        for attr in _seq(node.generatorOutput()):
            # fresh copy per attribute: mapping values are mutated in
            # place elsewhere (.add in the leaf handler), so sharing
            # one set object would cross-contaminate provenance
            mapping.setdefault(attr.exprId().id(), set(gen_srcs))

    # generic: any top-level named expression (Alias) among this
    # node's expressions introduces a new attribute; its sources are
    # the union over the attributes the expression reads.
    for expr in _seq(node.expressions()):
        try:
            target = expr.toAttribute().exprId().id()
        except Exception:
            continue
        if target not in mapping:
            mapping[target] = _attr_sources(expr, mapping)


def column_lineage(df: DataFrame) -> dict[str, list[tuple[str, str]]]:
    """Map each output column of ``df`` to its sorted source
    ``(table, column)`` list. Plan-only — nothing executes."""
    plan = df._jdf.queryExecution().analyzed()
    mapping: dict = {}
    _walk(plan, mapping)
    out: dict[str, list[tuple[str, str]]] = {}
    for attr in _seq(plan.output()):
        out[attr.name()] = sorted(mapping.get(attr.exprId().id(), set()))
    return out


def lineage_report(df: DataFrame) -> str:
    """One line per output column: ``col <- table.col, table.col``."""
    lines = []
    for col, srcs in column_lineage(df).items():
        shown = ", ".join(f"{t}.{c}" for t, c in srcs) or "<none>"
        lines.append(f"{col} <- {shown}")
    return "\n".join(lines)
