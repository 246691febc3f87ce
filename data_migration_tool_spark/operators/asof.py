"""As-of (temporal nearest-predecessor) join — an operator Spark lacks
natively (prompt-mandated custom-operator family; DuckDB's native
``ASOF JOIN`` serves as the independent oracle).

Implementation is the *union trick*, not a range join: tag both sides,
union them, and carry the latest right-side payload forward with
``last(..., ignorenulls)`` over a (keys, time) window. Cost is ONE
shuffle on the join keys and a per-key ordered scan — no inequality
join, no per-left-row range probe, no row explosion. This is the shape
that survives 100 TB: a billion quotes ⨝ trades as-of join is the same
single sort-shuffle as a groupBy on the key.

Skew note: all rows of one key land in one task (as any per-key ordered
computation must); AQE skew-split cannot help a single monster key here
— pre-bucket by (key, coarse time range) if one key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T, _SIDE, _PAYLOAD, _MATCH = "__asof_t", "__asof_side", "__asof_rv", "__asof_m"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    allow_exact: bool = True,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right row within the same
    ``on`` key — LEFT semantics (unmatched left rows keep NULL payload
    columns).

    ``direction='backward'`` (default): greatest ``right_ts`` ≤
    ``left_ts`` (or < if ``allow_exact=False``) — attribution / quote-
    before-trade. ``direction='forward'``: smallest ``right_ts`` ≥
    ``left_ts`` (or >) — next-event lookup. ``tolerance_seconds``
    bounds the match gap (pandas ``merge_asof`` tolerance): a match
    farther than the bound nulls out, it does not fall back to an
    earlier one. Both options are pure sort-order / post-filter changes
    — still ONE shuffle on the join keys.

    Output: all left columns + ``right_values`` + ``matched_ts`` (the
    matched right row's timestamp, NULL if none).

    Ties on ``right_ts`` within a key resolve to the row latest in the
    (deterministic) sort by the payload struct — pass pre-deduplicated
    right sides when exact tie policy matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = F.struct(
        *[F.col(c) for c in right_values], F.col(right_ts).alias("matched_ts")
    )
    l2 = left.withColumn(_T, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    r2 = right.select(
        *on,
        F.col(right_ts).alias(_T),
        F.lit(0).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    # The scan runs toward the left row: time-ascending for backward,
    # time-descending for forward, so "last non-null payload seen" IS
    # the nearest match on the wanted side. allow_exact: an equal-time
    # right row precedes the left row in scan order (counts); strict:
    # it follows (doesn't) — _SIDE asc/desc encodes exactly that.
    # Final payload-struct tiebreak makes ties on right_ts within a key
    # deterministic (struct compare is field-wise); without it, last()
    # among tied right rows would be partition-order-dependent.
    t_order = F.asc(_T) if direction == "backward" else F.desc(_T)
    order = [
        t_order,
        F.asc(_SIDE) if allow_exact else F.desc(_SIDE),
        F.asc(_PAYLOAD),
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_MATCH, F.last(_PAYLOAD, ignorenulls=True).over(w))
    match_col = F.col(_MATCH)
    if tolerance_seconds is not None:
        # timestamps compare in exact integer microseconds (a double
        # epoch-seconds cast has ~0.24 µs ulp at current epochs — enough
        # to flip a boundary gap); numeric ts columns compare as double
        from pyspark.sql.types import TimestampNTZType, TimestampType

        is_ts = isinstance(
            u.schema[_T].dataType, (TimestampType, TimestampNTZType)
        )
        m_ts = match_col.getField("matched_ts")
        if is_ts:
            # NTZ → TIMESTAMP via session TZ; unix_micros rejects NTZ
            gap = F.unix_micros(F.col(_T).cast("timestamp")) - F.unix_micros(
                m_ts.cast("timestamp")
            )
            bound = F.lit(int(round(float(tolerance_seconds) * 1_000_000)))
        else:
            gap = F.col(_T).cast("double") - m_ts.cast("double")
            bound = F.lit(float(tolerance_seconds))
        if direction == "forward":
            gap = -gap
        match_col = F.when(gap <= bound, match_col)
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [match_col.getField(c).alias(c) for c in right_values]
    out_cols.append(match_col.getField("matched_ts").alias("matched_ts"))
    return matched.filter(F.col(_SIDE) == 1).select(*out_cols)
