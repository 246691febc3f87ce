"""Small-file compaction — the table-maintenance pass a 100 TB lake
needs continuously.

Streaming sinks, incremental appends, and over-parallel writes leave
directories of KB-scale files; at scale that turns every downstream
scan into a listing + open-file storm (800k-task scans become
millions). Compaction rewrites a directory into ~target-size files:

- **coalesce** (default): narrow dependency, NO shuffle — each output
  task concatenates whole input partitions. The right tool when the
  only problem is file count.
- **cluster_by**: repartitionByRange on the given columns before the
  write — pays one shuffle to ALSO restore min/max locality, so footer
  stats prune on those columns afterwards (same contract as
  ``writers.write_table(cluster_by=...)``, applied retroactively).

Sizing comes from the actual input file sizes (``df.inputFiles()``),
not row counts — compressed bytes are what the next scan pays for.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionPlan:
    n_input_files: int
    total_bytes: int
    n_output_files: int


def _local_path(uri: str) -> str:
    p = urlparse(uri)
    return p.path if p.scheme in ("file", "") else uri


def plan_compaction(df: DataFrame, target_file_bytes: int) -> CompactionPlan:
    """Derive the output file count from real input sizes. On object
    storage you'd take sizes from the listing you already have; local
    files are stat'ed directly."""
    files = df.inputFiles()
    total = 0
    for f in files:
        lp = _local_path(f)
        if os.path.exists(lp):
            total += os.path.getsize(lp)
    n_out = max(1, math.ceil(total / max(target_file_bytes, 1)))
    return CompactionPlan(
        n_input_files=len(files), total_bytes=total, n_output_files=n_out
    )


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    cluster_by: list[str] | None = None,
) -> CompactionPlan:
    """Rewrite ``src_dir`` into ``dst_dir`` with ~target-size files.

    Kept as rewrite-to-new-directory: an in-place swap is a filesystem
    rename the caller owns (atomic on HDFS/local, copy-on-object-store)
    — the data plan is identical either way.
    """
    df = spark.read.format(fmt).load(src_dir)
    plan = plan_compaction(df, target_file_bytes)
    if cluster_by:
        out = df.repartitionByRange(plan.n_output_files, *cluster_by)
    else:
        out = df.coalesce(plan.n_output_files)
    out.write.mode("overwrite").format(fmt).save(dst_dir)
    return plan
