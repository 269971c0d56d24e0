#!/usr/bin/env python
"""Dump ``explain("formatted")`` for bench queries into plans/<tag>/.

Usage:
    python tools/plan_dump.py --tag r14 --suffix before [--names a,b,c]

Writes plans/<tag>/<query>_<suffix>.txt for every named query (default:
the full bench set: HEADLINE + HEAVY8 + EXTENDED). The formatted plan
is the judge-facing artifact for optimization rounds: Exchange count,
join strategy, PushedFilters/ReadSchema, codegen spans and Python
eval nodes are all visible in it.

NOTE: the bench times FROZEN_FORMS where present (eager localCheckpoint
full-row forms), but those dump as an opaque post-checkpoint
``Scan ExistingRDD``. The REGISTRY form (``QUERIES[name]``) is lazy
exactly so plans are inspectable (that is what the lint gate walks),
so this tool dumps the registry form by default and falls back to the
frozen form only when the name has no registry slot. Timing is not
this tool's job — see bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="plans/<tag>/ dir")
    ap.add_argument("--suffix", required=True, help="before|after")
    ap.add_argument("--names", default=None, help="comma-separated")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    import bench
    from idr_data_pipelines_spark.queries import FROZEN_FORMS, QUERIES
    from idr_data_pipelines_spark.session import get_spark

    names = (
        args.names.split(",")
        if args.names
        else bench.HEADLINE + bench.HEAVY8 + bench.EXTENDED
    )
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(
        app_name="plan-dump",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        fn = QUERIES.get(name) or FROZEN_FORMS[name]
        df = fn(spark, args.sf)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
