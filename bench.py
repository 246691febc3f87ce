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

Contention accounting (the canary) lives in module-level functions —
``canary_floor`` / ``clean_segments`` / ``resolve`` / ``build_payload``
— so its edge cases are unit-testable (tests/test_bench_canary.py;
VERDICT r9 #3: this machinery decides what numbers every round
publishes, and its edge cases fire exactly when the box is loaded,
i.e. when nobody is watching).
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

IDLE_FLOOR = 0.25  # this box's idle warm canary band is 0.2-0.4 s
# at local[32]; a single unusually fast sample must not set a
# threshold below the band's natural ceiling (observed: floor
# 0.147 → threshold 0.29 < typical idle 0.35 → every segment
# "contended" on a genuinely idle machine — mass false suspects)

CANARY_EVERY = 35  # queries per segment; ~0.3 s sample cost each

IDLE_BAND = (0.2, 0.4)  # this box's documented warm idle canary band


def ambient_inflated(canary: list[float]) -> bool:
    """Broad-ambient-load detector (VERDICT r11 #4). The per-segment
    threshold catches contention SPIKES (one sample far above the
    floor) but is blind to broad inflation: r11 published a record
    whose run total swung +28% across five same-HEAD runs while every
    canary sample stayed under the spike threshold. The canary MEDIAN
    against the documented idle band is the complementary signal —
    when the run's typical sample sits above the band's ceiling, the
    whole box was louder than the band every recorded baseline was
    measured in, and the record self-labels ``ambient_inflated`` so a
    cross-round ratio computed from it carries its own caveat."""
    if not canary:
        return False
    import statistics

    return statistics.median(canary) > IDLE_BAND[1]

# samples[name] = [(seconds or None, segment), ...]; segment k spans
# the interval between canary samples k and k+1.
Samples = dict[str, list[tuple[float | None, int]]]


def canary_floor(canary: list[float]) -> float:
    """The run's observed contention floor: min over ALL canary
    samples (post-hoc — late-run idleness retroactively tightens the
    judgment of early segments too). 0.3 (mid idle band) when no
    sample exists yet."""
    return min(canary) if canary else 0.3


def clean_threshold(canary: list[float], idle_floor: float = IDLE_FLOOR) -> float:
    """A canary sample above this is contended: 2× the floor, clamped
    so one unusually fast sample can't undercut the idle band."""
    return 2.0 * max(canary_floor(canary), idle_floor)


def clean_segments(
    canary: list[float], idle_floor: float = IDLE_FLOOR
) -> set[int]:
    """Segments whose bracketing canary samples are BOTH within the
    clean threshold. A segment is only as trustworthy as its worse
    bracket: a load spike between samples k and k+1 shows up in at
    least one of them."""
    thr = clean_threshold(canary, idle_floor)
    return {
        k
        for k in range(len(canary) - 1)
        if canary[k] <= thr and canary[k + 1] <= thr
    }

def resolve(
    samples: Samples,
    canary: list[float],
    idle_floor: float = IDLE_FLOOR,
) -> tuple[dict[str, float | None], list[str]]:
    """Collapse samples to per-query timings + the suspect list.
    The recorded value is min over all samples (contention only
    inflates, so the min is the best estimate either way); a query
    is SUSPECT when none of its samples ran in a clean segment —
    its min is still possibly inflated. Error-only queries record
    None and are NOT suspect (there is no timing to inflate)."""
    clean = clean_segments(canary, idle_floor)
    timings: dict[str, float | None] = {}
    suspect: list[str] = []
    for name, ss in samples.items():
        vals = [t for t, _ in ss if t is not None]
        timings[name] = min(vals) if vals else None
        if vals and not any(seg in clean for t, seg in ss if t is not None):
            suspect.append(name)
    return timings, sorted(suspect)


STEAL_PCT_CEILING = 2.0  # hypervisor steal above this labels the record


def read_cpu_stat() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from the aggregate /proc/stat
    cpu line — (0, 0) when unreadable (non-Linux, containers that mask
    procfs), which downstream treats as 'no steal signal'."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:  # noqa: BLE001
        return 0, 0


def steal_pct(start: tuple[int, int], end: tuple[int, int]) -> float | None:
    """Percent of the run's CPU time stolen by the hypervisor, from
    two ``read_cpu_stat`` samples; None when the signal is absent or
    the window is degenerate. This is the r13 complement to the two
    canary detectors: an evening of noisy-neighbor steal inflated run
    totals 22% while every canary median stayed INSIDE the idle band
    (0.34-0.37 vs ceiling 0.40) — the canary is throughput-shaped and
    barely feels steal that job-scheduling-bound queries pay in
    full."""
    (s0, t0), (s1, t1) = start, end
    if t1 <= t0:
        return None
    return round(100.0 * (s1 - s0) / (t1 - t0), 2)


def build_payload(
    samples: Samples,
    canary: list[float],
    errors: dict[str, str],
    sf: float,
    idle_floor: float = IDLE_FLOOR,
    cpu_window: tuple[tuple[int, int], tuple[int, int]] | None = None,
) -> str:
    """The artifact line. Shape contract (pytest-pinned): always
    ``metric/value/unit/queries/sf/canary``; ``suspect`` present IFF
    non-empty (downstream readers — tools/plan_report.py, the round
    ledger — key on its presence); ``errors`` present iff non-empty;
    ``steal_pct`` present iff a CPU window was sampled and readable,
    with ``steal_inflated`` set past STEAL_PCT_CEILING."""
    timings, suspect = resolve(samples, canary, idle_floor)
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
            "min": canary_floor(canary) if canary else None,
            "threshold": round(clean_threshold(canary, idle_floor), 3)
            if canary
            else None,
            "median": round(__import__("statistics").median(canary), 3)
            if canary
            else None,
            "idle_band": list(IDLE_BAND),
        },
    }
    if ambient_inflated(canary):
        body["ambient_inflated"] = True
    if cpu_window is not None:
        sp = steal_pct(*cpu_window)
        if sp is not None:
            body["steal_pct"] = sp
            if sp > STEAL_PCT_CEILING:
                body["steal_inflated"] = True
    if suspect:
        body["suspect"] = suspect
    if errors:
        body["errors"] = errors
    return json.dumps(body)


def main() -> None:
    from data_migration_tool_spark.session import get_spark
    from data_migration_tool_spark.plans.registry import QUERIES

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

    samples: Samples = {}
    errors: dict[str, str] = {}
    cpu0 = read_cpu_stat()  # steal baseline: measurement window opens
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
        literal frozen — comparability across rounds is the point.

        Since r9 the canary ACTS instead of just recording (VERDICT r8
        ask #2): samples bracket ~35-query segments, a segment whose
        bracketing samples exceed the clean threshold is CONTENDED, and
        a query whose every timing landed in contended segments gets
        re-run in a remediation pass — or, failing that, a
        ``"suspect"`` flag in the payload so no inflated number is ever
        published as clean again."""
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id % 97) AS s").collect()
        canary.append(round(time.time() - t0, 3))

    def _run_pass(names: list[str]) -> None:
        """Time one pass over ``names``, sampling the canary every
        CANARY_EVERY queries so contention is attributed at segment
        grain, not pass grain (a load spike mid-pass taints ~35
        queries, not ~172)."""
        since_canary = 0
        for name in names:
            qdef = QUERIES[name]
            seg = len(canary) - 1  # current open segment
            t0 = time.time()
            try:
                df = qdef.builder(spark, sf_dir)
                df.count()
            except Exception as exc:  # noqa: BLE001 — record, keep going
                samples.setdefault(name, []).append((None, seg))
                if not any(t is not None for t, _ in samples[name]):
                    errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            else:
                elapsed = round(time.time() - t0, 3)
                samples.setdefault(name, []).append((elapsed, seg))
                errors.pop(name, None)
            # Iterative queries leave localCheckpoint blocks behind;
            # their JVM-side cleanup (ContextCleaner) only fires once
            # the Python references are collected. Without this, block
            # storage accumulates over ~230 query executions and
            # queries late in a pass measure the session's garbage,
            # not their plan (observed 3-4× inflation).
            gc.collect()
            with open(sidecar, "w") as fh:
                fh.write(
                    build_payload(
                        samples, canary, errors, sf,
                        cpu_window=(cpu0, read_cpu_stat()),
                    )
                    + "\n"
                )
            since_canary += 1
            if since_canary >= CANARY_EVERY:
                _canary_sample()
                since_canary = 0
        spark._jvm.System.gc()
        _canary_sample()  # close the pass's last segment

    # warm the canary's own codegen (first execution costs ~3 s of
    # one-time compile that would mask the contention signal), then
    # sample the JVM-warm contention floor
    spark.range(200_000_000).selectExpr("sum(id % 97) AS s").collect()
    _canary_sample()
    all_names = list(QUERIES)
    for _pass in range(2):
        _run_pass(all_names)

    # Remediation: re-run queries that never got a clean-segment sample
    # (up to 2 extra passes — bounded so a persistently-loaded box still
    # terminates; whatever remains carries the suspect flag).
    for _retry in range(2):
        _, suspect = resolve(samples, canary)
        suspect = [n for n in suspect if n in QUERIES]
        if not suspect:
            break
        _run_pass(suspect)

    payload = build_payload(
        samples, canary, errors, sf, cpu_window=(cpu0, read_cpu_stat())
    )
    with open(sidecar, "w") as fh:
        fh.write(payload + "\n")
    # Surface any surviving suspects LOUDLY on stderr (the artifact
    # contract: a non-empty suspect list must never be silently
    # ignored by downstream readers — tools/plan_report.py mirrors
    # this line into PLANS.md).
    _, final_suspect = resolve(samples, canary)
    if final_suspect:
        sys.stderr.write(
            f"WARNING: {len(final_suspect)} timing(s) suspect "
            f"(contention-inflated, see canary): "
            f"{', '.join(final_suspect)}\n"
        )
    # Restore the real stdout and emit the JSON as its only line.
    sys.stdout.flush()
    os.dup2(real_stdout, 1)
    os.close(real_stdout)
    os.write(1, (payload + "\n").encode())


if __name__ == "__main__":
    main()
