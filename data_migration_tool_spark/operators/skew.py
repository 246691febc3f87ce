"""Skew-mitigation operators (prompt-mandated scale path).

AQE's skew-join splitting handles most runtime skew automatically
(session.py enables it), but two situations still need explicit salting
at 100 TB:

1. **Low-cardinality aggregation**: ``groupBy(k)`` with a handful of
   distinct keys puts each key's entire partial state behind one
   reducer. Partial aggregation usually saves this — unless the
   aggregate is high-fanout per group (``collect_list``, exact
   ``countDistinct`` rewrites) where the reduce side still receives
   per-row state. ``salted_agg`` splits each group ``n_salts`` ways,
   aggregates, then merges — two small shuffles instead of one
   monster reducer.
2. **Hot-key joins** where the skewed side must stay unshuffled (e.g.
   streaming) or AQE is unavailable: ``salted_broadcast_join``
   replicates the small side across a salt range so the hot key's rows
   spread over ``n_salts`` tasks.

Both are *plan rewrites with identical semantics* — results are
checked equal to the unsalted plan in tests and (for the registry
query) against the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Uniform random salt in [0, n_salts). Salt only decides placement,
    never results, so nondeterminism here is harmless."""
    return df.withColumn(SALT_COL, (F.rand() * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) with ``partial_aggs``,
    then groupBy(keys) with ``merge_aggs`` over the partial columns.

    The caller supplies the decomposition (sum→sum of sums, count→sum of
    counts, min→min of mins, ...) — the algebraic part of an aggregate,
    exactly what Spark's own partial aggregation does, lifted to a place
    where the first shuffle's key space is ``|keys| × n_salts``.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the fact side's ``key`` is heavily skewed: salt
    the fact rows, explode the (small) dim side across the full salt
    range, and join on (key, salt). The hot key's rows land on
    ``n_salts`` different tasks instead of one.

    The dim side grows ``n_salts``× — it must stay broadcastable at the
    inflated size (that is the operator's contract; for dims too big
    for that, AQE skew-join on a shuffle join is the right tool).

    Only fact-preserving joins are supported: the rewrite replicates
    each dim row ``n_salts`` times, which is invisible to inner/left
    (every fact row carries exactly one salt) but would emit unmatched
    dim rows once per replica under right/full outer, and inverts
    semi/anti semantics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_broadcast_join supports inner/left joins only, got {how!r}: "
            "dim rows are replicated n_salts times, so right/full outer would "
            "duplicate unmatched dim rows and semi/anti would be wrong"
        )
    salted_fact = with_salt(fact, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    salted_dim = dim.select("*", salts)
    joined = salted_fact.join(
        F.broadcast(salted_dim),
        on=[key, SALT_COL],
        how=how,
    )
    return joined.drop(SALT_COL)
