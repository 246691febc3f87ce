"""Translation error-report processing (SURVEY P7/U3; reference
``translation_utils/csv_utils.py:43-78`` applied at
``batch_sql_translation.py:130-225``).

The translation step emits a per-error report (file, category, message).
Config-supplied ``translationErrorFilterRules`` mark known-ignorable
categories; files whose every error is ignorable count as translated.
The reference filters rows in Python; here rules compile to ONE Catalyst
predicate so the report (which scales with corpus size) is filtered
executor-side, and the failed/translated split is the U3 set-difference
as a left-anti join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rules_predicate(rules: list[dict]) -> Column | None:
    """OR of per-rule matches. Rule: {field, value, matchType
    equals|contains (default equals), caseSensitive (default False)}.
    Returns None for no rules (reference returns a None filter)."""
    if not rules:
        return None
    pred: Column | None = None
    for rule in rules:
        field = F.col(rule["field"])
        value = rule["value"]
        if not rule.get("caseSensitive", False):
            field, value = F.lower(field), value.casefold()
        match = rule.get("matchType", "equals")
        if match == "equals":
            term = field == value
        elif match == "contains":
            term = field.contains(value)
        else:
            raise ValueError(f"unknown matchType {match!r}")
        pred = term if pred is None else pred | term
    return pred


def pattern_predicate(pattern: str | None) -> Column | None:
    """``FIELD1=KW1,FIELD2=KW2`` → contains-match on any listed field
    (reference ``pattern_filter``)."""
    if not pattern:
        return None
    rules = []
    for part in pattern.split(","):
        field, _, kw = part.strip().partition("=")
        rules.append({"field": field, "value": kw, "matchType": "contains", "caseSensitive": True})
    return rules_predicate(rules)


def split_translation_report(
    report: DataFrame,
    rules: list[dict],
    file_col: str = "file_path",
) -> tuple[DataFrame, DataFrame]:
    """(failed_files, ignored_errors): error rows matching a rule are
    ignorable; a file fails iff it has ≥1 non-ignorable error. The
    successfully-translated set is then ``all_files ⟕̸ failed`` —
    ``translated_files`` below."""
    pred = rules_predicate(rules)
    if pred is None:
        return report.select(file_col).distinct(), report.limit(0)
    ignored = report.filter(pred)
    failed = report.filter(~pred).select(file_col).distinct()
    return failed, ignored


def translated_files(
    all_files: DataFrame, failed_files: DataFrame, file_col: str = "file_path"
) -> DataFrame:
    """U3 (batch_sql_translation.py:204-225): successfully translated =
    all − failed, as a left-anti join (never a driver-side set diff)."""
    return all_files.join(failed_files, file_col, "left_anti")
