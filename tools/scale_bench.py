"""Scale-evidence pass: time the most expensive registry queries at
sf0.1 (driver data) and sf1 (tools/gen_scale_data.py upsample, 10×
rows) and report the per-query scaling exponent
``log10(t_sf1 / t_sf0.1)`` — 1.0 = linear, <1 = sublinear (fixed
overheads amortizing), >1 = super-linear (ticket unless the query's
documented complexity predicts it).

Same methodology as bench.py: warmup pass at sf0.001 so codegen/JIT
compile outside the measurement, then best-of-2 per (query, sf).

Usage: python tools/scale_bench.py [query ...]   # default: the top-12
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_migration_tool_spark.plans.registry import QUERIES
from data_migration_tool_spark.session import get_spark

DEFAULT = [
    "part_pagerank",
    "part_triangle_count",
    "customer_order_chains_recursive",
    "dup_cluster_canonical",
    "doc_dup_clusters",
    "doc_dup_clusters_star",
    "doc_lsh_incremental",
    "doc_containment_pairs",
    "emb_dup_clusters",
    "minhash_recall_gate",
    "pq_adc_rerank",
    "doc_minhash_lsh_dedup",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale/sf1"
)


def main() -> None:
    # Optional SF-pair override for second-decade checks:
    #   SCALE_LO=/path SCALE_HI=/path python tools/scale_bench.py q ...
    # (e.g. lo=.scale/sf1, hi=.scale/sf10 — a hidden super-linear term
    # shows up in the second decade, not the first). Labels follow the
    # dir basenames so the JSON stays self-describing.
    lo = os.environ.get("SCALE_LO", SF01)
    hi = os.environ.get("SCALE_HI", SF1)
    lo_label = os.path.basename(lo.rstrip("/"))
    hi_label = os.path.basename(hi.rstrip("/"))
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="dmt-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:  # warmup: compile every plan at the smallest SF
        try:
            QUERIES[n].builder(spark, "/root/testdata/sf0.001").count()
        except Exception:  # noqa: BLE001
            pass

    out: dict[str, dict] = {}
    for n in names:
        rec: dict = {}
        for label, d in ((lo_label, lo), (hi_label, hi)):
            best = None
            try:
                for _ in range(2):
                    t0 = time.time()
                    QUERIES[n].builder(spark, d).count()
                    el = time.time() - t0
                    best = el if best is None or el < best else best
                    gc.collect()
                rec[label] = round(best, 3)
            except Exception as exc:  # noqa: BLE001 — a guard refusal is a
                # legitimate scale RESULT (e.g. the exact-Jaccard join
                # guard pricing itself out at sf1) — record, keep going
                rec[label] = None
                rec[f"{label}_error"] = f"{type(exc).__name__}: {exc}"[:300]
        if rec.get(lo_label) and rec.get(hi_label):
            rec["ratio"] = round(rec[hi_label] / rec[lo_label], 2)
            rec["exponent"] = round(math.log10(rec["ratio"]), 2)
        out[n] = rec
        print(json.dumps({n: rec}), file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
