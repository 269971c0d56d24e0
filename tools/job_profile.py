#!/usr/bin/env python
"""Per-query job/stage/task accounting for the bench set.

For each named query: run it once against the noop sink (after one
warm pass at sf0.001) and report wall seconds, the number of Spark
jobs/stages/tasks it launched, and how many of those jobs ran at
DataFrame-CONSTRUCTION time (eager localCheckpoint / persist+count /
convergence probes) vs at the final noop action. At the bench's tiny
sf0.1 the wall is dominated by fixed per-job and per-stage overhead,
so "how many jobs does this query launch" is the first profiling
question (guide §1: measure where the time goes before changing
anything).

Usage:
    python tools/job_profile.py --names dedup_minhash_lsh,split_cluster_safe
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import bench  # noqa: F401  (path setup)
    from idr_data_pipelines_spark.queries import FROZEN_FORMS, QUERIES
    from idr_data_pipelines_spark.session import get_spark

    spark = get_spark(
        app_name="job-profile",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.sql.codegen.cache.maxEntries": "1000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = args.names.split(",")
    warm_dir = os.path.join(
        os.path.dirname(args.sf.rstrip("/")), "sf0.001"
    )
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf

    def q(name):
        return FROZEN_FORMS.get(name, QUERIES[name])

    for name in names:  # warm codegen/Python workers
        try:
            q(name)(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"# warm {name} failed: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    print(
        f"{'query':35s} {'wall_s':>7s} {'build_s':>8s} {'act_s':>6s} "
        f"{'jobs':>5s} {'bjobs':>5s} {'stages':>6s} {'tasks':>6s}"
    )
    for name in names:
        for rep in range(args.reps):
            spark.catalog.clearCache()
            j0 = set(tracker.getJobIdsForGroup(None) or [])
            # jobs fired during DataFrame construction (eager
            # checkpoints, convergence loops) vs the final action
            t0 = time.perf_counter()
            df = q(name)(spark, args.sf)
            t_build = time.perf_counter() - t0
            j1 = set(tracker.getJobIdsForGroup(None) or [])
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
            j2 = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = sorted(j2 - j0)
            build_jobs = sorted(j1 - j0)
            n_stages = 0
            n_tasks = 0
            for jid in new_jobs:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(
                f"{name:35s} {t_total:7.2f} {t_build:8.2f} "
                f"{t_total - t_build:6.2f} {len(new_jobs):5d} "
                f"{len(build_jobs):5d} {n_stages:6d} {n_tasks:6d}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
