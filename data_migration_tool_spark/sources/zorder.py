"""Z-order (Morton) clustering for multi-column file skipping.

Single-column sort bounds ONE column's min/max per file; a filter on
any other column still reads every file. Interleaving the bits of
several columns into one sort key bounds EVERY interleaved column's
extent per file (each of N range-partitioned files covers ~N^(-1/k) of
each of the k dimensions), so parquet footer min/max pruning works for
filters on any of them — the plain-parquet form of what Delta OPTIMIZE
ZORDER / clustering keys do (reference scope: the clustering-fields
metadata of hive_bq_load_utils.py:184-192 taken seriously at layout
time).

The key is pure Catalyst bit arithmetic (unrolled shifts/ors — no UDF,
fuses into the write projection); normalization to the bit range uses
one global min/max aggregate broadcast back as a 1-row cross join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of the given non-negative
    integer columns into one Morton key. ``bits × len(cols)`` must fit
    in 63 bits."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError("bits × columns must fit in a long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned by
    the Morton key of ``cols`` (each column min-max normalized into the
    bit range first). One extra pass for the global min/max (a 1-row
    broadcast), one range shuffle — the layout cost every clustered
    write pays."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}__mn"), F.max(c).alias(f"{c}__mx")]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    norm_cols = []
    for c in cols:
        mn, mx = F.col(f"{c}__mn"), F.col(f"{c}__mx")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1))
        norm_cols.append(
            ((F.col(c) - mn) * top / span).cast("long")
        )
    z = zorder_key(norm_cols, bits)
    (
        scaled.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .drop("__z", *[f"{c}__mn" for c in cols], *[f"{c}__mx" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
