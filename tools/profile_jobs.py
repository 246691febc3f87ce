#!/usr/bin/env python
"""Job-count + wall profiling for registry queries (guide §1).

Counts the Spark jobs a query schedules — including jobs submitted
from streaming micro-batch threads, which a thread-local job group
would miss — by bracketing the run with 1-task marker jobs and
diffing their globally-monotonic job ids.

Usage: python tools/profile_jobs.py q1 [q2 ...] [--n 2] [--sf DIR]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _marker_job_id(spark) -> int:
    """Run a tiny job under a throwaway group and return its job id."""
    sc = spark.sparkContext
    group = f"__probe_{time.time_ns()}"
    sc.setJobGroup(group, "profile_jobs marker")
    try:
        sc.parallelize([0], 1).count()
    finally:
        sc.setJobGroup(None, None)
    ids = sc.statusTracker().getJobIdsForGroup(group)
    return max(ids)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from data_migration_tool_spark.plans.registry import QUERIES
    from data_migration_tool_spark.session import get_spark

    spark = get_spark(app_name="profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.queries:
        if name not in QUERIES:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            continue
        qdef = QUERIES[name]
        try:
            qdef.builder(spark, args.warm).count()  # codegen/JIT warm
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: warmup failed: {exc}", flush=True)
        for _ in range(args.n):
            gc.collect()
            before = _marker_job_id(spark)
            t0 = time.time()
            qdef.builder(spark, args.sf).count()
            wall = time.time() - t0
            after = _marker_job_id(spark)
            print(
                f"{name}: wall={wall:.3f}s jobs={after - before - 1}",
                flush=True,
            )


if __name__ == "__main__":
    main()
