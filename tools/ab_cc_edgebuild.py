#!/usr/bin/env python
"""Interleaved A/B for the r14 s6 CC edge-build fold: old form (count
the session-width probe-keyed edge table, then re-shuffle + second
count when undersized — inlined from the pre-s6 HEAD) vs the new
connected_components (count the un-laid-out distinct edge list once,
repartition directly at the measured width, let iteration 0's eager
checkpoint materialize the layout). Same edges input
(minhash_lsh_pairs at sf0.1), outputs compared exactly first."""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from idr_data_pipelines_spark.llmdata.dedup import (  # noqa: E402
    connected_components,
    minhash_lsh_pairs,
)
from idr_data_pipelines_spark.queries import _t  # noqa: E402
from idr_data_pipelines_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cc_old(edges, src="id_a", dst="id_b", max_iter=25, rows_per_partition=1 << 20):
    """Pre-s6 form: wide materializing count + resize count, lazy
    checkpoint probe-fold loop (identical loop body to current)."""
    sess = edges.sparkSession
    n_part = sess.conf.get("spark.sql.shuffle.partitions")
    base = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                    F.struct(F.col(src).alias("a"), F.col(src).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(dst).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .repartition(int(n_part), "b")
        .persist()
    )
    labels = base.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("id"), F.col("a").alias("component")
    )
    conf_restore = None
    try:
        n_edges = base.count()
        if not n_edges:
            return labels
        loop_part = min(int(n_part), max(1, -(-n_edges // int(rows_per_partition))))
        if loop_part != int(n_part):
            sized = base.repartition(loop_part, "b").persist()
            sized.count()
            base.unpersist()
            base = sized
            conf_restore = n_part
            sess.conf.set("spark.sql.shuffle.partitions", str(loop_part))
        converged = False
        for it in range(max_iter + 1):
            prop = (
                base.join(labels, F.col("b") == F.col("id"))
                .groupBy("a")
                .agg(
                    F.min("component").alias("component"),
                    F.max(
                        F.when(F.col("b") == F.col("a"), F.col("component"))
                    ).alias("__prev"),
                )
                .persist()
            )
            look = prop.select(
                F.col("a").alias("__la"), F.col("component").alias("__lc")
            )
            doubled = prop.join(
                look, F.col("component") == F.col("__la"), "left"
            ).select(
                F.col("a").alias("id"),
                F.col("__prev"),
                F.coalesce(F.col("__lc"), F.col("component")).alias("component"),
            )
            if it == 0:
                stepped = doubled.localCheckpoint(eager=True)
                prop.unpersist()
                labels = stepped.drop("__prev")
                continue
            stepped = doubled.localCheckpoint(eager=False)
            changed = stepped.select(
                F.max((F.col("component") != F.col("__prev")).cast("int"))
            ).first()[0]
            prop.unpersist()
            labels = stepped.drop("__prev")
            if not changed:
                converged = True
                break
        if not converged:
            raise RuntimeError("no convergence")
        return labels
    finally:
        if conf_restore is not None:
            sess.conf.set("spark.sql.shuffle.partitions", conf_restore)
        base.unpersist()


def main() -> None:
    spark = get_spark(
        app_name="ab-cc-edgebuild",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = _t(spark, SF, "documents")

    def edges():
        return minhash_lsh_pairs(
            docs, num_perm=64, bands=16, shingle_k=3, jaccard_threshold=0.5
        )

    a = sorted(map(tuple, cc_old(edges()).collect()))
    b = sorted(map(tuple, connected_components(edges()).collect()))
    assert a == b, f"OUTPUT MISMATCH: {len(a)} vs {len(b)}"
    print(f"parity OK: {len(a)} rows identical")

    e = edges().localCheckpoint(eager=True)  # shared input, loops only

    sc = spark.sparkContext

    def run(fn):
        t0 = time.monotonic()
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        fn(e).write.format("noop").mode("overwrite").save()
        j1 = sc._jsc.sc().dagScheduler().nextJobId()
        return time.monotonic() - t0, j1 - j0

    run(cc_old)
    run(connected_components)
    olds, news = [], []
    oj = nj = 0
    for _ in range(7):
        t, oj = run(cc_old)
        olds.append(t)
        t, nj = run(connected_components)
        news.append(t)
    print("old:", [round(x, 3) for x in olds], f"jobs/run={oj}")
    print("new:", [round(x, 3) for x in news], f"jobs/run={nj}")
    print(
        f"medians old={statistics.median(olds):.3f} new={statistics.median(news):.3f}"
        f"  mins old={min(olds):.3f} new={min(news):.3f}"
    )


if __name__ == "__main__":
    main()
