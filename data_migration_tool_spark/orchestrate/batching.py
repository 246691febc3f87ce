"""Batch maker (SURVEY §2.11; reference ``parallelization_utils.py:1-7``).

The reference chunks table lists into throttled Airflow task batches;
in Spark the executor pool is the throttle, so batches matter only for
(a) bounding concurrent *jobs* the driver submits and (b) giving each
chunk a stable run id for audit/rerun protocols.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import TypeVar

T = TypeVar("T")


def run_batches(
    items: Sequence[T], batch_size: int, id_prefix: str = "run"
) -> Iterator[tuple[str, list[T]]]:
    """Yield ``(run_id, chunk)`` pairs, run ids ``{prefix}-{i}`` in
    order. Empty input yields nothing; non-positive batch size is an
    error (same contract as the reference's tests)."""
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    for i, start in enumerate(range(0, len(items), batch_size)):
        yield f"{id_prefix}-{i}", list(items[start : start + batch_size])
