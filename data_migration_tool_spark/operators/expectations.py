"""Declarative data-quality expectations evaluated in ONE aggregation pass.

The reference's validation surface (DVT) compares a table against a
second engine (src/translation/dvt/main.py:40-96).  A migration also
needs the complementary single-table contract check — "the loaded table
satisfies its declared invariants" — which the reference approximates
manually through per-table aggregate specs in the validation-params CSV
(src/common_utils/storage_utils.py:12-38: min/max/count columns).  This
module generalizes that into a declarative expectations suite in the
style of Deequ/Great Expectations, executed Spark-first:

* every row-level expectation compiles to ONE conditional-sum aggregate;
* uniqueness compiles to (count, countDistinct) on the column;
* the whole suite is a single ``df.agg(...)`` — one scan, map-side
  combinable, one 1-row shuffle regardless of table size or suite size;
* the per-expectation report is a zero-shuffle explode of that row.

All outputs are exact integers/strings (no float ratios), so results are
bit-stable across engines and scale factors.  Verdicts use an exact
violation budget (``max_violations``), not a float threshold.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative constraint on one column.

    ``kind`` is descriptive; semantics live in ``predicate`` (a boolean
    per-row Column; NULL or FALSE counts as a violation) except for
    ``unique``, whose violation count is ``count(col) -
    countDistinct(col)`` (SQL UNIQUE semantics: NULLs never violate).
    """

    kind: str
    column: str
    predicate: Column | None = None
    max_violations: int = 0
    detail: str = ""

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column})" + (
            f"[{self.detail}]" if self.detail else ""
        )


def not_null(col: str) -> Expectation:
    return Expectation("not_null", col, F.col(col).isNotNull())


def unique(col: str) -> Expectation:
    return Expectation("unique", col, None)


def in_range(col: str, lo, hi) -> Expectation:
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    return Expectation("in_range", col, pred, detail=f"{lo},{hi}")


def in_set(col: str, values: list) -> Expectation:
    return Expectation(
        "in_set", col, F.col(col).isin(values), detail=",".join(map(str, values))
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation("matches", col, F.col(col).rlike(pattern), detail=pattern)


def satisfies(expr_sql: str, label: str = "expr") -> Expectation:
    return Expectation("satisfies", label, F.expr(expr_sql), detail=expr_sql)


@dataclass(frozen=True)
class Suite:
    expectations: list[Expectation] = field(default_factory=list)

    def run(self, df: DataFrame) -> DataFrame:
        """Evaluate the whole suite in one aggregation pass.

        Returns one row per expectation:
        (expectation, column, n_rows, n_violations, max_violations,
        status) — exact integers only, ordered as declared.
        """
        aggs = [F.count(F.lit(1)).alias("__total")]
        for i, e in enumerate(self.expectations):
            if e.predicate is not None:
                ok = F.sum(
                    F.when(e.predicate, F.lit(1)).otherwise(F.lit(0))
                ).alias(f"__ok_{i}")
                aggs.append(ok)
            else:  # unique: violations = nonnull - distinct
                aggs += [
                    F.count(e.column).alias(f"__nn_{i}"),
                    F.countDistinct(e.column).alias(f"__nd_{i}"),
                ]
        wide = df.agg(*aggs)

        structs = []
        for i, e in enumerate(self.expectations):
            if e.predicate is not None:
                viol = F.col("__total") - F.col(f"__ok_{i}")
            else:
                viol = F.col(f"__nn_{i}") - F.col(f"__nd_{i}")
            structs.append(
                F.struct(
                    F.lit(i).alias("ordinal"),
                    F.lit(e.name).alias("expectation"),
                    F.lit(e.column).alias("column"),
                    F.col("__total").alias("n_rows"),
                    viol.cast("long").alias("n_violations"),
                    F.lit(e.max_violations).cast("long").alias("max_violations"),
                    F.when(viol <= e.max_violations, F.lit("PASS"))
                    .otherwise(F.lit("FAIL"))
                    .alias("status"),
                )
            )
        return (
            wide.select(F.explode(F.array(*structs)).alias("e"))
            .select("e.*")
        )
