"""Z-order (Morton-curve) layout for multi-dimension scan pruning.

The reference records partition and clustering columns per table and
carries them through the migration (hive_ddl_metadata, reference
src/translation/scripts/hive/extract_hive_ddls.py:201-214) — but a
single sort/partition column only prunes scans filtered on THAT column.
At 100 TB, tables are filtered on several dimensions (customer AND date,
tenant AND time); interleaving the dimensions' bits onto one Morton key
and range-partitioning by it gives every dimension locality at once, so
min/max footer stats prune files for filters on ANY of the interleaved
columns.  This is the layout trick behind Delta/Databricks OPTIMIZE
ZORDER, built here from plain column expressions:

1. one 1-row bounds aggregate per write (min/max of each dimension,
   broadcast back — never a global sort);
2. each dimension min-max scales to a ``bits``-wide integer rank with
   exact integer arithmetic (SQL ``div`` — no float division anywhere,
   so ranks are bit-identical across engines and parallelisms);
3. ranks interleave bit-by-bit into the z-value (pure shifts/ors —
   whole-stage-codegen'd, no UDF);
4. ``repartitionByRange(z)`` + write: contiguous z-ranges land in the
   same files, giving tight per-file min/max envelopes on every
   dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave(ranks: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``ranks`` (each already in [0, 2^bits)) into
    one z-value: bit i of rank j lands at position i*len(ranks)+j.
    Compiles to a flat OR-tree of shifts — JVM-side, codegen-friendly."""
    n = len(ranks)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_by(
    df: DataFrame, cols: list[str], bits: int = 16, out: str = "z"
) -> DataFrame:
    """Attach the z-value of ``cols`` (integer-valued columns) as
    ``out``.

    One extra 1-row aggregate scan for bounds (broadcast-joined back);
    the z expression itself is per-row column math. The min-max rank is
    ``((x - mn) * (2^bits - 1)) div span`` in exact bigint arithmetic.
    Follow with ``.repartitionByRange(n, out)`` and a parquet write to
    materialize the clustered layout."""
    top = (1 << bits) - 1
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("long")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("long")).alias(f"__mx_{c}"),
        ]
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    with_ranks = joined
    for c in cols:
        num = (F.col(c).cast("long") - F.col(f"__mn_{c}")) * F.lit(top)
        span = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        with_ranks = with_ranks.withColumn(f"__num_{c}", num).withColumn(
            f"__span_{c}", span
        )
    # exact integer division: SQL `div`, never float `/` + floor
    ranks = [
        F.expr(f"__num_{c} div greatest(__span_{c}, 1L)") for c in cols
    ]
    drop = [
        p.format(c=c)
        for c in cols
        for p in ("__mn_{c}", "__mx_{c}", "__num_{c}", "__span_{c}")
    ]
    return with_ranks.withColumn(out, interleave(ranks, bits)).drop(*drop)
