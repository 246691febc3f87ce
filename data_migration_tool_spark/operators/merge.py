"""Upsert / merge-into semantics (SURVEY §2.9 ST4: the reference's
exactly-once-ish rerun protocol is an audit anti-join; the stronger,
engine-native form is a latest-wins MERGE by key, which incremental
loads need the moment a file can contain updates, not just appends).

Plain-parquet implementation (no table-format dependency): a MERGE is
``base ∪ updates`` reduced to one row per key by a deterministic
priority order. With a transactional table format (Delta/Iceberg) the
same call maps to ``MERGE INTO``; this operator is the semantics
contract plus the shuffle-shape we want: ONE hash shuffle on the key,
no join — the union never materializes matched pairs.

At 100 TB: updates are typically ≪ base. The window approach shuffles
base+updates once on the key — same cost class as the sort-merge join a
MERGE INTO performs, but with map-side-combinable row_number instead of
a join build side. If base is bucketed by the key, the shuffle drops to
updates-only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VERSION_COL = "__src_priority"


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge: rows from ``updates`` replace base rows with
    the same key; unmatched rows pass through (WHEN MATCHED UPDATE +
    WHEN NOT MATCHED INSERT).

    Tie-breaking is deterministic: ``order_col`` descending if given
    (e.g. an event time), else updates always beat base. Within
    ``updates`` itself, duplicates of a key resolve by the same order —
    so replaying a batch (rerun) is idempotent.
    """
    tagged = base.withColumn(VERSION_COL, F.lit(0)).unionByName(
        updates.withColumn(VERSION_COL, F.lit(1))
    )
    order = [F.desc(order_col)] if order_col else []
    w = Window.partitionBy(*keys).orderBy(*order, F.desc(VERSION_COL))
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", VERSION_COL)
    )


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    track_cols: Sequence[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Derive SCD-type-2 validity intervals from a change log: keep
    only rows where the tracked columns CHANGED versus the previous
    row per key, then attach ``valid_from`` / ``valid_to`` /
    ``is_current`` (half-open intervals; ``valid_to`` NULL = current).

    ``order_cols`` must be a total order within each key (include a
    tiebreaker id) or the collapse is nondeterministic. ``ts_col``
    defaults to ``order_cols[0]``.

    Execution: two stacked windows on the SAME (keys × order) spec —
    the change-collapse lag and the interval lead ride one hash
    exchange (filter preserves the partitioning), so the whole
    derivation costs a single shuffle at change-log grain. The
    NULL-safe struct compare means a NULL→value transition counts as a
    change, and the first row per key always survives.
    """
    ts = ts_col or order_cols[0]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    cur = F.struct(*[F.col(c) for c in track_cols])
    changed = ~cur.eqNullSafe(F.lag(cur).over(w))
    return (
        df.withColumn("__chg", changed)
        .filter("__chg")
        .withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__chg")
    )
