"""Deterministic pseudonymization for migration pipelines.

When a migration stages production data through intermediate systems
(the reference's whole workflow: extract → GCS staging → load →
validate, e.g. src/datamigration/dags/datamigration_utils/
hive_bq_load_utils.py's staged copies), identifying columns often may
not travel in the clear — but the VALIDATION step still needs to join
and compare across systems. Deterministic masking squares that circle:
each value is replaced by a keyed surrogate token that is stable for
(salt, value), so equality joins, group-bys, COUNT DISTINCT, and DVT
row-hash comparisons all keep working on the masked data, while the
original values never leave the source.

Design — exact by construction, like every hash family in this repo:

* token = md5(salt || ':' || canonical(value)) — pure Catalyst
  expressions (no UDF), identical bytes in any engine that has md5
  (the DuckDB oracle recomputes tokens independently).
* canonical(value) is the engine-agnostic string form this repo's row
  hashing already uses for join keys: integers render without
  exponent, strings pass through. NULL masks to NULL (masking must
  not invent values, and outer-join semantics survive).
* the salt is the unlinkability boundary: without it a dictionary
  attack over a small key domain (e.g. nation keys) trivially
  reverses the tokens. Rotating the salt unlinks two masked exports
  from each other; per-column salts unlink columns that share a
  domain. This is pseudonymization (GDPR art. 4(5)) — reversible by
  whoever holds the salt, NOT anonymization.

At 100 TB: map-only (zero shuffles, zero joins) — the masking rides
whatever scan already reads the column, and whole-stage codegen keeps
it JVM-side. Joinability is preserved exactly because the token is a
function of the value alone, so co-partitioning and broadcast
strategies on masked keys behave like they did on raw keys (same
key cardinality, uniformly re-hashed distribution — a masked hot key
stays hot; salting-for-skew composes after masking unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mask_token(col: F.Column, salt: str) -> F.Column:
    """The surrogate-token expression: md5(salt || ':' || value),
    NULL-preserving, cast-stable (numerics canonicalized via string
    cast — int columns render digit-identically in Spark and DuckDB).
    Exposed separately so oracles and joins can rebuild tokens."""
    return F.when(
        col.isNotNull(),
        F.md5(F.concat(F.lit(salt), F.lit(":"), col.cast("string"))),
    )


def mask_columns(
    df: DataFrame, cols: list[str], salt: str
) -> DataFrame:
    """Replace each named column with its deterministic surrogate
    token (column name and position preserved, type becomes string).
    Raises on unknown columns — silently passing through an unmasked
    identifying column is the failure mode this operator exists to
    prevent."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"mask_columns: column(s) not in frame: {missing} "
            f"(available: {df.columns})"
        )
    out = df
    for c in cols:
        out = out.withColumn(c, mask_token(F.col(c), salt))
    return out
