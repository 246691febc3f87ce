"""bench.py's contention canary, unit-tested over synthetic sample
sets (VERDICT r9 #3: the resolution logic decides what numbers every
round publishes, and its edge cases — all-contended, late-idle
retroactive floor tightening, error-only queries, a single clean
sample — fire exactly when the box is loaded, i.e. when nobody is
watching). No Spark session: the functions are pure."""

from __future__ import annotations

import json

import bench


def test_clean_segments_basic_and_clamp():
    # idle run: floor 0.3, threshold 0.6, every segment clean
    canary = [0.3, 0.35, 0.32, 0.3]
    assert bench.clean_segments(canary) == {0, 1, 2}
    # one fast outlier (0.147) must NOT undercut the idle band: the
    # IDLE_FLOOR clamp keeps threshold at 0.5, idle samples stay clean
    canary = [0.147, 0.35, 0.38]
    assert bench.clean_threshold(canary) == 0.5
    assert bench.clean_segments(canary) == {0, 1}
    # a genuine spike taints BOTH adjacent segments (the spike sample
    # brackets each)
    canary = [0.3, 2.5, 0.31, 0.3]
    assert bench.clean_segments(canary) == {2}


def test_all_segments_contended_everything_suspect():
    """Load arrives right after the initial warm sample and never
    leaves: the floor is the idle pre-sample, every later sample is
    contended, so NO clean segment exists — every timed query is
    suspect (bounded remediation in main() would re-run them;
    resolution itself must terminate and flag, not loop or crash).
    Note the deliberate limit: a box loaded UNIFORMLY from before the
    first sample raises the floor itself and is undetectable by
    self-reference — that case is adjudicated against the historical
    idle band (0.2-0.4 s), which is why the band is recorded in the
    payload."""
    canary = [0.3, 5.0, 4.8]
    assert bench.clean_segments(canary) == set()
    samples = {
        "q_a": [(1.0, 0), (1.1, 1)],
        "q_b": [(5.0, 0), (4.8, 1)],
    }
    timings, suspect = bench.resolve(samples, canary)
    assert suspect == ["q_a", "q_b"]
    assert timings == {"q_a": 1.0, "q_b": 4.8}  # min still recorded


def test_late_idle_retroactively_clears_early_segments():
    """The floor is the min over ALL samples (post-hoc): a run whose
    box went idle late re-judges the early segments against the NEW
    (lower) floor — early samples near the late-idle floor stay clean,
    early samples 2x above it become contended."""
    # early samples 0.9/0.95 looked "clean" relative to each other,
    # but the late 0.42/0.40 idle samples set floor=0.40 → thr=0.8
    canary = [0.9, 0.95, 0.42, 0.40]
    assert bench.clean_segments(canary) == {2}
    samples = {
        "early_only": [(3.0, 0), (3.1, 1)],   # both contended → suspect
        "spanned": [(2.0, 0), (1.4, 2)],      # got a clean sample late
    }
    timings, suspect = bench.resolve(samples, canary)
    assert suspect == ["early_only"]
    assert timings["spanned"] == 1.4


def test_error_only_query_records_none_not_suspect():
    """A query that failed every pass records None (plus the error in
    the payload) — it is NOT suspect: there is no timing to inflate."""
    canary = [5.0, 5.0]  # fully contended run, worst case
    samples = {"broken": [(None, 0), (None, 1)]}
    timings, suspect = bench.resolve(samples, canary)
    assert timings == {"broken": None}
    assert suspect == []
    payload = json.loads(
        bench.build_payload(samples, canary, {"broken": "Boom: x"}, 0.1)
    )
    assert payload["queries"]["broken"] is None
    assert payload["errors"] == {"broken": "Boom: x"}
    assert "suspect" not in payload  # present IFF non-empty


def test_single_clean_sample_on_pass_one_clears():
    """A query whose ONLY clean-segment sample is pass 1 is not
    suspect, even when pass 2 ran contended — min-over-samples uses
    the clean pass-1 timing."""
    canary = [0.3, 0.33, 4.0, 4.2]  # segment 0 clean; 1, 2 contended
    samples = {"q": [(1.2, 0), (0.9, 2)]}
    timings, suspect = bench.resolve(samples, canary)
    assert suspect == []
    # min is the (contended!) 0.9 — contention only inflates, so a
    # SMALLER contended sample is still the best estimate
    assert timings["q"] == 0.9


def test_payload_shape_contract():
    """The artifact's shape: metric/value/unit/queries/sf/canary always
    present; suspect present iff non-empty; totals skip None."""
    canary = [0.3, 0.32, 2.6]  # segment 0 clean, segment 1 contended
    samples = {
        "clean_q": [(1.0, 0)],
        "sus_q": [(2.0, 1)],
        "err_q": [(None, 1)],
    }
    payload = json.loads(bench.build_payload(samples, canary, {}, 0.1))
    assert payload["metric"] == "headline_queries_total_wall"
    assert payload["value"] == 3.0
    assert payload["unit"] == "sec" and payload["sf"] == 0.1
    assert payload["suspect"] == ["sus_q"]
    assert payload["canary"]["min"] == 0.3
    assert payload["canary"]["threshold"] == 0.6
    assert "errors" not in payload


def test_plan_report_suspect_banner(tmp_path):
    """tools/plan_report.py mirrors a non-empty suspect list into
    PLANS.md's header — and stays silent for clean or absent
    artifacts (the downstream half of the artifact contract)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from plan_report import suspect_banner

    p = tmp_path / "BENCH.json"
    assert suspect_banner(str(p)) == ""  # absent → silent
    p.write_text(json.dumps({"queries": {}}))
    assert suspect_banner(str(p)) == ""  # clean → silent
    p.write_text(json.dumps({"queries": {}, "suspect": ["b_q", "a_q"]}))
    line = suspect_banner(str(p))
    assert "2 BENCH timing(s) suspect" in line
    assert "`a_q`, `b_q`" in line
    p.write_text("not json {")
    assert suspect_banner(str(p)) == ""  # corrupt → silent, no crash


def test_ambient_inflated_flag():
    """The broad-inflation complement to the spike threshold (VERDICT
    r11 #4): a record whose canary MEDIAN drifts above the documented
    idle band's ceiling self-labels ambient_inflated, even when every
    individual sample passes the 2×-floor spike threshold (the r11
    failure: 195→250 s run totals, all 13 samples 'clean')."""
    # median 0.3 — inside the band: clean record, no flag
    canary = [0.25, 0.3, 0.35]
    assert not bench.ambient_inflated(canary)
    payload = json.loads(
        bench.build_payload({"q": [(1.0, 0)]}, canary, {}, 0.1)
    )
    assert "ambient_inflated" not in payload
    assert payload["canary"]["median"] == 0.3
    assert payload["canary"]["idle_band"] == [0.2, 0.4]

    # every sample under the spike threshold (2×0.41=0.82) yet the
    # median (0.45) sits above the 0.4 band ceiling → flagged
    loud = [0.41, 0.45, 0.48]
    assert bench.ambient_inflated(loud)
    payload = json.loads(
        bench.build_payload({"q": [(1.0, 0)]}, loud, {}, 0.1)
    )
    assert payload["ambient_inflated"] is True

    # empty canary → undecidable, not flagged
    assert not bench.ambient_inflated([])


def test_steal_pct_detector():
    """r13 third contention signal: hypervisor steal sampled from
    /proc/stat around the measurement window. Motivation: an evening
    of noisy-neighbor steal inflated run totals 22% while every canary
    median stayed INSIDE the idle band (0.34-0.37 vs ceiling 0.40) —
    the throughput-shaped canary barely feels steal that
    job-scheduling-bound queries pay in full."""
    # 3 steal jiffies over a 100-jiffy window = 3%
    assert bench.steal_pct((10, 1000), (13, 1100)) == 3.0
    # degenerate / absent signal → None, and the payload omits the key
    assert bench.steal_pct((0, 0), (0, 0)) is None
    payload = json.loads(
        bench.build_payload(
            {"q": [(1.0, 0)]}, [0.3], {}, 0.1, cpu_window=((0, 0), (0, 0))
        )
    )
    assert "steal_pct" not in payload and "steal_inflated" not in payload

    # under the ceiling: recorded, not flagged
    payload = json.loads(
        bench.build_payload(
            {"q": [(1.0, 0)]}, [0.3], {}, 0.1,
            cpu_window=((0, 1000), (10, 2000)),
        )
    )
    assert payload["steal_pct"] == 1.0
    assert "steal_inflated" not in payload

    # past the 2% ceiling: recorded AND flagged
    payload = json.loads(
        bench.build_payload(
            {"q": [(1.0, 0)]}, [0.3], {}, 0.1,
            cpu_window=((0, 1000), (50, 2000)),
        )
    )
    assert payload["steal_pct"] == 5.0
    assert payload["steal_inflated"] is True

    # no window passed (legacy callers): payload shape unchanged
    payload = json.loads(bench.build_payload({"q": [(1.0, 0)]}, [0.3], {}, 0.1))
    assert "steal_pct" not in payload

    # the live reader returns a sane pair on this box
    steal, total = bench.read_cpu_stat()
    assert total > 0 and steal >= 0


def test_payload_full_roundtrip_one_line():
    """VERDICT r13 #4 insurance: the bench's one-JSON-line contract,
    exercised on a MAXIMAL payload — timings, null (error) samples,
    suspects, errors, ambient flag, and the steal fields all at once —
    must round-trip json.loads and contain no newline (the r12 driver
    parse failure was driver-side, but the artifact's own shape must
    stay provably parseable)."""
    canary = [0.45, 0.46, 2.9, 0.48]  # loud median + a contended segment
    samples = {
        "clean_q": [(1.0, 0), (0.9, 1)],
        "sus_q": [(2.0, 2)],
        "err_q": [(None, 0), (None, 1)],
    }
    line = bench.build_payload(
        samples,
        canary,
        {"err_q": "Boom: exploded"},
        0.1,
        cpu_window=((0, 1000), (50, 2000)),
    )
    assert "\n" not in line
    payload = json.loads(line)
    assert payload["value"] == 2.9  # 0.9 + 2.0; err_q contributes None
    assert payload["queries"]["err_q"] is None
    assert payload["suspect"] == ["sus_q"]
    assert payload["errors"] == {"err_q": "Boom: exploded"}
    assert payload["ambient_inflated"] is True
    assert payload["steal_pct"] == 5.0 and payload["steal_inflated"] is True
    assert payload["canary"]["idle_band"] == [0.2, 0.4]
    # and the line is byte-stable under a second serialization
    assert json.loads(line) == json.loads(
        bench.build_payload(
            samples, canary, {"err_q": "Boom: exploded"}, 0.1,
            cpu_window=((0, 1000), (50, 2000)),
        )
    )
