#!/usr/bin/env python
"""Per-STAGE wall/executor-time accounting for one or more queries.

job_profile.py answers "how many jobs/stages does this query launch";
this tool answers "which stages carry the time". It runs each query
against the noop sink (after an sf0.001 warm pass) with the Spark UI
enabled, then reads the UI REST API (/api/v1/.../stages) and prints
each stage's duration, executor-run time, task count, shuffle bytes
and the first line of its name — enough to map stages back to plan
operators (guide §1.1/§7.1: decide whether time is compute, shuffle
or scheduling before changing anything).

Usage:
    python tools/stage_profile.py --names dedup_remove_spans
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    import bench  # noqa: F401  (path setup)
    from idr_data_pipelines_spark.queries import FROZEN_FORMS, QUERIES
    from idr_data_pipelines_spark.session import get_spark

    spark = get_spark(
        app_name="stage-profile",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            "spark.driver.memory": "16g",
            "spark.sql.codegen.cache.maxEntries": "1000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    app_id = sc.applicationId

    def rest(path: str):
        url = f"http://localhost:4049/api/v1/applications/{app_id}/{path}"
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    names = args.names.split(",")
    warm_dir = os.path.join(os.path.dirname(args.sf.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf

    def q(name):
        return FROZEN_FORMS.get(name, QUERIES[name])

    for name in names:
        try:
            q(name)(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"# warm {name} failed: {exc}", file=sys.stderr)
    spark.catalog.clearCache()

    for name in names:
        spark.catalog.clearCache()
        seen = {s["stageId"] for s in rest("stages")}
        t0 = time.perf_counter()
        df = q(name)(spark, args.sf)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        stages = [s for s in rest("stages") if s["stageId"] not in seen]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in stages)
        print(
            f"\n=== {name}: wall {wall:.2f}s (build {t_build:.2f}s), "
            f"{len(stages)} stages, executorRunTime sum "
            f"{total_run / 1000:.2f}s"
        )
        print(
            f"{'sid':>5s} {'run_s':>7s} {'cpu_s':>7s} {'tasks':>5s} "
            f"{'shW_MB':>7s} {'shR_MB':>7s}  name"
        )
        for s in stages[: args.top]:
            nm = (s.get("name") or "").split("\n")[0][:72]
            print(
                f"{s['stageId']:5d} "
                f"{(s.get('executorRunTime') or 0) / 1000:7.2f} "
                f"{(s.get('executorCpuTime') or 0) / 1e9:7.2f} "
                f"{s.get('numCompleteTasks', 0):5d} "
                f"{(s.get('shuffleWriteBytes') or 0) / 1e6:7.1f} "
                f"{(s.get('shuffleReadBytes') or 0) / 1e6:7.1f}  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
