"""DML/SQL statement translation (SURVEY §3.1 type=sql/dml path;
reference routes these through the Migration API with the config's
``nameMappingList`` controlling schema renames, then validates with a
dry run — ``dml_validation_dag.py:46-48,192-214``).

The reference's SQL/DML corpus (``samples/sql``, ``samples/dml``,
``tests/end_to_end/input/sql``) is SELECT/INSERT/UPDATE/DELETE with
qualified ``db.table`` names; the work is (a) comment/statement
handling, (b) dialect token normalization (Teradata ``SEL``/``DEL``
abbreviations, ``QUALIFY`` → windowed subquery is out-of-corpus and
warned), and (c) schema name mapping applied OUTSIDE string literals.
Output is Spark SQL, checked by ``dryrun.dry_run_statement``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from data_migration_tool_spark.translate.statements import (
    classify_statement,
    split_statements,
    strip_comments,
)


@dataclass
class TranslatedStatement:
    sql: str
    statement_type: str  # SELECT | INSERT | UPDATE | DELETE | MERGE | OTHER
    warnings: list[str] = field(default_factory=list)


def _map_outside_literals(stmt: str, fn) -> str:
    """Apply ``fn`` to the segments of ``stmt`` outside single-quoted
    string literals (doubled '' escapes respected)."""
    out, buf, i, n = [], [], 0, len(stmt)
    while i < n:
        ch = stmt[i]
        if ch == "'":
            out.append(fn("".join(buf)))
            buf = []
            j = i + 1
            while j < n:
                if stmt[j] == "'":
                    if j + 1 < n and stmt[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(stmt[i : j + 1])
            i = j + 1
        else:
            buf.append(ch)
            i += 1
    out.append(fn("".join(buf)))
    return "".join(out)


def apply_name_mapping(stmt: str, name_mapping: dict[str, str] | None) -> str:
    """Rewrite ``srcdb.table`` → ``tgtdb.table`` for every mapping entry,
    case-insensitively on the database name, never inside string
    literals."""
    if not name_mapping:
        return stmt
    lowered = {k.lower(): v for k, v in name_mapping.items()}
    qual = re.compile(r'([`"]?)([\w$#]+)\1\s*\.\s*(?=[`"]?[\w$#]+)')

    def rewrite(segment: str) -> str:
        def sub(m: re.Match) -> str:
            tgt = lowered.get(m.group(2).lower())
            return f"{tgt}." if tgt else m.group(0)

        return qual.sub(sub, segment)

    return _map_outside_literals(stmt, rewrite)


# Teradata statement-keyword abbreviations
_TD_TOKens = [
    (re.compile(r"^\s*SEL\b", re.I), "SELECT"),
    (re.compile(r"^\s*DEL\b", re.I), "DELETE"),
    (re.compile(r"^\s*INS\b", re.I), "INSERT"),
    (re.compile(r"^\s*UPD\b", re.I), "UPDATE"),
]


def translate_statement(
    stmt: str,
    dialect: str = "teradata",
    name_mapping: dict[str, str] | None = None,
) -> TranslatedStatement:
    """One statement → Spark SQL + classification + warnings."""
    warnings: list[str] = []
    sql = strip_comments(stmt).strip().rstrip(";")
    if dialect.lower() == "teradata":
        for pat, full in _TD_TOKens:
            if pat.match(sql):
                sql = pat.sub(full, sql, count=1)
        if re.search(r"\bQUALIFY\b", sql, re.I):
            warnings.append(
                "QUALIFY is not Spark SQL — rewrite as a windowed subquery"
            )
        # DELETE [FROM] tbl ALL → DELETE [FROM] tbl. FROM must be optional
        # here: this runs BEFORE the FROM-less rewrite below, so requiring
        # it would leave "DELETE FROM tbl ALL" with a trailing ALL.
        sql = re.sub(
            r"^(DELETE\s+(?:FROM\s+)?[\w$#.]+)\s+ALL\b", r"\1", sql, flags=re.I
        )
    # Teradata and Redshift both allow FROM-less DELETE; Spark doesn't
    sql = re.sub(r"^DELETE\s+(?!FROM\b)", "DELETE FROM ", sql, flags=re.I)
    sql = apply_name_mapping(sql, name_mapping)
    return TranslatedStatement(sql, classify_statement(sql), warnings)


def translate_file(
    content: str,
    dialect: str = "teradata",
    name_mapping: dict[str, str] | None = None,
    mode: str = "SQL",
) -> list[TranslatedStatement]:
    """Split (comment-aware, BTEQ-aware via ``mode``) and translate every
    statement in a file; fully-commented statements drop out."""
    out = []
    for stmt in split_statements(content, mode=mode):
        if not strip_comments(stmt).strip():
            continue
        out.append(translate_statement(stmt, dialect, name_mapping))
    return out
