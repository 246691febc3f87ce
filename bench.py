#!/usr/bin/env python
"""Benchmark harness: runs the registry's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

The JSON line is guaranteed to be the SOLE stdout content: file
descriptor 1 is redirected to stderr before the JVM launches (so every
Spark/Ivy/py4j message — which would otherwise interleave with and
corrupt the machine-parsed line — lands on stderr), then restored just
for the final print. The same payload is also written to ``BENCH.json``
next to this script as a parse-proof sidecar.

Timing = full query build + execution + collect (count for large
results), after a warm-up pass of the session.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_migration_tool_spark.session import get_spark  # noqa: E402
from data_migration_tool_spark.plans.registry import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # Park fd 1 on stderr before the JVM starts: the gateway inherits the
    # redirected descriptor, so no Spark output can ever reach stdout.
    real_stdout = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)

    spark = get_spark(app_name="dmt-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM: run every query once at the smallest SF so codegen +
    # JIT compile before measurement. Executors on a real cluster are
    # long-lived and warm; without this, whichever query first touches a
    # cold kernel (e.g. interpreted higher-order-function eval) absorbs
    # seconds of one-time compile cost and timings flap run-to-run.
    warm_dir = "/root/testdata/sf0.001"
    for qdef in QUERIES.values():
        try:
            qdef.builder(spark, warm_dir).count()
        except Exception:  # noqa: BLE001 — warmup is best-effort
            pass

    # Best of 2 passes per query: single samples on a shared box flap by
    # 5-10x from scheduler/GC noise unrelated to the plan; the min is the
    # reproducible cost of the query itself (plan build + execution).
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, qdef in QUERIES.items():
            t0 = time.time()
            df = qdef.builder(spark, sf_dir)
            n = df.count()
            elapsed = round(time.time() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            _ = n

    total = round(sum(timings.values()), 3)
    payload = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
        }
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"),
        "w",
    ) as fh:
        fh.write(payload + "\n")
    # Restore the real stdout and emit the JSON as its only line.
    sys.stdout.flush()
    os.dup2(real_stdout, 1)
    os.close(real_stdout)
    os.write(1, (payload + "\n").encode())


if __name__ == "__main__":
    main()
