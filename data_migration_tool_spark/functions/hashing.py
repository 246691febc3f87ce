"""Deterministic, NULL-safe row hashing (SURVEY A7, §7.4).

DVT row validation hashes the concatenation of columns; ``concat_ws``
silently drops NULLs, so ``(NULL,'a')`` and ``('a',NULL)`` would collide.
We coalesce each column to an explicit sentinel and join with a unit
separator. Numeric columns must be cast to a canonical string form first
(double formatting differs across engines) — callers pass pre-cast
columns or use ``canonical_string``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_SENTINEL = "␀"  # SYMBOL FOR NULL — cannot collide with data
SEP = "␟"  # SYMBOL FOR UNIT SEPARATOR


def canonical_string(col: Column, dtype: T.DataType) -> Column:
    """Engine-portable string rendering of a value.

    Doubles → decimal(30,6) first (fixed-point text, no scientific
    notation, same in Spark and DuckDB); timestamps → ISO micros;
    everything else → plain cast.
    """
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return col.cast("decimal(30,6)").cast("string")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    if isinstance(dtype, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    return col.cast("string")


def md5_int32(col: Column, salt: int | None = None) -> Column:
    """Portable 32-bit integer hash: first 8 hex chars of md5 → bigint.

    Slower than xxhash/murmur but identical in every engine that has
    md5 — the property the dedup/minhash operators need for oracle
    parity. ``salt`` prefixes the input (family of hash functions)."""
    if salt is not None:
        col = F.concat(F.lit(f"{salt}:"), col)
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def null_safe_concat(df: DataFrame, cols: list[str] | None = None) -> Column:
    """NULL-safe, type-canonical concatenation of ``cols`` (default all)."""
    names = cols or df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    parts = [
        F.coalesce(canonical_string(F.col(c), by_name[c]), F.lit(NULL_SENTINEL))
        for c in names
    ]
    return F.concat_ws(SEP, *parts)


def row_md5(df: DataFrame, cols: list[str] | None = None) -> Column:
    """MD5 over the null-safe concat — the row-validation hash (A7)."""
    return F.md5(null_safe_concat(df, cols))
