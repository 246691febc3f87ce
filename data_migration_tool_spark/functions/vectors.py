"""Vector (embedding) expressions over ``array<float>`` columns.

All JVM-side via higher-order functions (``zip_with`` + ``aggregate``) —
no Python in the hot path. Products/accumulation happen in double with a
fixed left-to-right order starting at 0.0, so results are deterministic
and match a DuckDB oracle computing
``list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`` bit-for-bit.

(Measured note: an unrolled ``element_at`` chain for a known dim is ~10×
SLOWER than the HOF form here — the 64-term expression falls out of
whole-stage codegen and pays per-element interpreted dispatch, while the
HOF loop runs tight over the array. Don't "optimize" back to it.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: str | Column, b: str | Column) -> Column:
    """Sequential-order dot product in double precision."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
