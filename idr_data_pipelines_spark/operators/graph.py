"""Iterative graph operators (driver-loop + distributed steps).

Complements the label-propagation connected components in
``llmdata/dedup.py``: same execution shape (an iterative driver loop
where every step is a declarative DataFrame op — NOT expressible as
one Catalyst plan), different fixed point.

No reference-parity citation: the reference has no graph surface; this
is part of the beyond-reference analytics extension (SURVEY.md north
star), oracled with a fixed-iteration unrolled-CTE SQL equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    validate_dangling: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a dangling-free edge list.

    Returns ``(id, rank)`` for every node after exactly
    ``iterations`` power-method steps from the uniform vector:
    ``rank = (1-d)/N + d * Σ_in rank_src/outdeg_src``.

    Callers must supply a graph where every node has outdegree ≥ 1
    (e.g. a symmetrized projection: emit both directions of each
    undirected pair) — with dangling nodes the iteration leaks their
    mass instead of redistributing it, and the ranks no longer sum
    to 1. Parallel (duplicate) edges count with multiplicity — they
    act as integer weights on both the outdegree and the inflow, the
    natural semantics for co-occurrence projections; deduplicate
    upstream (as the catalog query does) for simple-graph ranks.
    Fixed iterations (not convergence detection) keep the result
    exactly reproducible and SQL-oracle-able.

    100 TB design: per iteration, one shuffle joins edges to the
    node-sized rank frame on ``src`` (AQE broadcasts the rank side
    while it fits) and one shuffle aggregates contributions by
    ``dst`` with map-side combine — edge-sized traffic only, no
    cartesian, no driver-side data. The edge×outdeg frame is
    localCheckpoint-ed once and reused every iteration; the rank
    frame is checkpoint-ed per iteration to truncate the growing
    lineage (the classic iterative-plan blowup otherwise makes
    iteration k replan all k-1 predecessors).

    Floating-point note: the contribution SUM order is
    partitioning-dependent, so two runs (or Spark vs an oracle) agree
    to ~1e-15 relative, not bit-for-bit — comparators should round
    (the catalog query rounds to 6 decimals).
    """
    if iterations < 0:
        # range(-n) is empty — a negative count would silently return
        # the uniform start vector as if it were a converged rank
        raise ValueError("iterations must be >= 0")
    if not 0.0 <= damping <= 1.0:
        # outside [0,1] the update leaves the probability simplex
        # (negative or >1 "ranks") with no error anywhere downstream
        raise ValueError("damping must be in [0, 1]")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # dangling-free contract ⇒ every node appears as a src.
    # Checkpointed ONCE: nodes feeds the dangling probe, the n count,
    # and every iteration's left join — without the checkpoint each
    # consumer re-executes the edge scan + outdegree aggregate
    # (~iterations+2 redundant edge-sized shuffles, r09 review); this
    # function is already executing (counts below), so an eager
    # checkpoint adds no construction-time job that wasn't there.
    nodes = deg.select(F.col("src").alias("id")).localCheckpoint(eager=True)
    if validate_dangling:
        # Contract violations must fail loudly, not return
        # plausible-looking ranks with leaked mass (r5 ADVICE): a
        # dst-only node has no src row, so it would silently vanish
        # from the output. One distinct + broadcast-able anti-join +
        # count — negligible next to the iteration cost; disable via
        # the flag for pre-validated production graphs.
        n_dangling = (
            e.select(F.col("dst").alias("id"))
            .distinct()
            .join(nodes, "id", "left_anti")
            .count()
        )
        if n_dangling:
            raise ValueError(
                f"pagerank: {n_dangling} node(s) appear only as dst "
                "(outdegree 0); the dangling-free contract requires "
                "every node to have at least one outgoing edge — "
                "symmetrize the projection or add self-loops upstream"
            )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    edeg = e.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    # (1 - damping) evaluated in double on purpose: the SQL oracle
    # writes the same `1 - 0.85` expression, so both engines carry the
    # identical representation error instead of diverging on a 0.15
    # literal.
    teleport = (1 - damping) / n
    for _ in range(iterations):
        contribs = (
            edeg.join(ranks, edeg["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
