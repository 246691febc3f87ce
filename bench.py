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

import gc
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
    # Each measured query is individually guarded: one broken builder
    # must never destroy the whole artifact — it records null and the
    # rest keep timing. The sidecar is rewritten after every query so a
    # hard crash (OOM, JVM death) still leaves partial timings on disk.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH.json"
    )

    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    canary: list[float] = []

    def _canary_sample() -> None:
        """Load sentinel: one FIXED pure-compute job (no IO, no shuffle,
        no registry code) timed alongside the queries, so every artifact
        carries its own machine-contention estimate. The r7 bench
        recorded the IVF family ~2.5× high because another workload
        shared the box during the driver's run, and nothing in the
        artifact could prove it; a canary sample far above the artifact
        family's historical band (idle ≈ 0.2-0.4 s warm on this
        32-thread box) adjudicates that without a re-run. Keep the job
        literal frozen — comparability across rounds is the point."""
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id % 97) AS s").collect()
        canary.append(round(time.time() - t0, 3))

    def _payload() -> str:
        total = round(sum(v for v in timings.values() if v is not None), 3)
        body = {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "canary": {
                "job": "range(200e6) sum(id % 97), local[$SPARK_GRAFT_CPUS]",
                "samples": canary,
                "min": min(canary) if canary else None,
            },
        }
        if errors:
            body["errors"] = errors
        return json.dumps(body)

    # warm the canary's own codegen (first execution costs ~3 s of
    # one-time compile that would mask the contention signal), then
    # sample the JVM-warm contention floor
    spark.range(200_000_000).selectExpr("sum(id % 97) AS s").collect()
    _canary_sample()
    for _pass in range(2):
        for name, qdef in QUERIES.items():
            t0 = time.time()
            try:
                df = qdef.builder(spark, sf_dir)
                df.count()
            except Exception as exc:  # noqa: BLE001 — record, keep going
                if timings.get(name) is None:
                    timings[name] = None
                    errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            else:
                elapsed = round(time.time() - t0, 3)
                prev = timings.get(name)
                if prev is None or elapsed < prev:
                    timings[name] = elapsed
                    errors.pop(name, None)
            # Iterative queries leave localCheckpoint blocks behind;
            # their JVM-side cleanup (ContextCleaner) only fires once
            # the Python references are collected. Without this, block
            # storage accumulates over ~230 query executions and
            # queries late in a pass measure the session's garbage,
            # not their plan (observed 3-4× inflation).
            gc.collect()
            with open(sidecar, "w") as fh:
                fh.write(_payload() + "\n")
        spark._jvm.System.gc()
        _canary_sample()  # end of each pass: contention drift check

    payload = _payload()
    with open(sidecar, "w") as fh:
        fh.write(payload + "\n")
    # Restore the real stdout and emit the JSON as its only line.
    sys.stdout.flush()
    os.dup2(real_stdout, 1)
    os.close(real_stdout)
    os.write(1, (payload + "\n").encode())


if __name__ == "__main__":
    main()
