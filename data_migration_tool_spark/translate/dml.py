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


def _split_args(s: str) -> list[str]:
    """Split a function-argument string at top-level commas
    (paren- and string-literal-aware)."""
    out, buf, depth, i, n = [], [], 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(s[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    out.append("".join(buf).strip())
    return out


def _match_paren(s: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at ``open_idx`` (literal-aware);
    -1 if unbalanced."""
    depth, i, n = 0, open_idx, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            i += 1
            while i < n and not (s[i] == "'" and (i + 1 >= n or s[i + 1] != "'")):
                i += 2 if s[i] == "'" else 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _in_literal(s: str, idx: int) -> bool:
    """True if ``idx`` falls inside a single-quoted string literal
    (same quote-aware walk as ``_match_paren``, '' escapes included).
    Function-name matches inside literals must NOT be rewritten — a
    predicate like ``note = 'see INDEX(2)'`` is data, not a call."""
    i, n = 0, len(s)
    while i < idx:
        if s[i] == "'":
            i += 1
            while i < n and not (s[i] == "'" and (i + 1 >= n or s[i + 1] != "'")):
                i += 2 if s[i] == "'" else 1
            if i >= idx:
                return True
        i += 1
    return False


def rewrite_decode(sql: str) -> str:
    """Oracle/Teradata ``DECODE(expr, s1, r1, ..., [default])`` →
    ``CASE expr WHEN s1 THEN r1 ... [ELSE default] END``. Applied
    repeatedly so nested DECODEs resolve inside-out. Literal-aware:
    ``'DECODE(...)'`` inside a quoted string is left untouched."""
    pos = 0
    while True:
        m = re.search(r"\bDECODE\s*\(", sql[pos:], re.I)
        if not m:
            return sql
        start = pos + m.start()
        if _in_literal(sql, start):
            pos = pos + m.end()
            continue
        m = re.compile(r"\bDECODE\s*\(", re.I).match(sql, start)
        open_idx = sql.index("(", m.start())
        close = _match_paren(sql, open_idx)
        if close < 0:
            return sql  # unbalanced — leave untouched
        args = _split_args(sql[open_idx + 1 : close])
        if len(args) < 3:
            return sql
        expr, rest = args[0], args[1:]
        parts = [f"CASE {expr}"]
        while len(rest) >= 2:
            parts.append(f"WHEN {rest[0]} THEN {rest[1]}")
            rest = rest[2:]
        if rest:
            parts.append(f"ELSE {rest[0]}")
        parts.append("END")
        sql = sql[: m.start()] + " ".join(parts) + sql[close + 1 :]
        pos = 0  # indices shifted — restart the scan (terminates: one
        # real DECODE is consumed per rewrite, literal matches only skip)


def _rewrite_func(sql: str, name: str, template: str) -> str:
    """Rewrite every ``name( ... )`` call to ``template`` (with
    ``{args}`` = the raw argument text), paren-matched so nested calls
    and commas inside arguments survive. Literal-aware: a match inside
    a single-quoted string (``WHERE note = 'see INDEX(2)'``) is data,
    not a call, and is skipped untouched."""
    pat = re.compile(rf"\b{name}\s*\(", re.I)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            return sql
        if _in_literal(sql, m.start()):
            pos = m.end()
            continue
        open_idx = sql.index("(", m.start())
        close = _match_paren(sql, open_idx)
        if close < 0:
            return sql
        inner = sql[open_idx + 1 : close]
        repl = template.format(args=inner)
        sql = sql[: m.start()] + repl + sql[close + 1 :]
        # rescan from the replacement: nested same-name calls inside the
        # argument text still need rewriting (the rewritten name itself
        # is gone, so this cannot loop)
        pos = m.start()


def rewrite_td_functions(sql: str) -> str:
    """Teradata scalar functions without Spark equivalents by the same
    name: NULLIFZERO(x) → NULLIF(x, 0), ZEROIFNULL(x) → COALESCE(x, 0),
    INDEX(s, sub) → INSTR(s, sub). Applied to DML only — Teradata DDL's
    ``PRIMARY INDEX (col)`` must NOT match, so the caller gates this on
    the statement verb."""
    sql = _rewrite_func(sql, "NULLIFZERO", "NULLIF({args}, 0)")
    sql = _rewrite_func(sql, "ZEROIFNULL", "COALESCE({args}, 0)")
    sql = _rewrite_func(sql, "INDEX", "INSTR({args})")
    return sql


_QUALIFY_RE = re.compile(r"\bQUALIFY\b", re.I)
_TRAILER_RE = re.compile(r"\b(ORDER\s+BY|LIMIT|SAMPLE)\b", re.I)
_WINFUNC_RE = re.compile(r"\b([A-Za-z_]\w*)\s*\(", re.I)


def rewrite_qualify(sql: str) -> tuple[str, bool]:
    """Teradata ``QUALIFY <pred>`` → windowed subquery.

    Handles the top-level form ``SELECT ... FROM ... QUALIFY pred
    [ORDER BY ...] [LIMIT n]``: each ``fn(...) OVER (...)`` in the
    predicate becomes a generated ``__qual_i`` column of an inner
    query, and the outer query filters on it then drops it with
    ``* EXCEPT`` — semantically exactly Teradata's post-window filter.
    Returns (sql, applied)."""
    m = _QUALIFY_RE.search(sql)
    if not m or sql[: m.start()].count("(") != sql[: m.start()].count(")"):
        return sql, False  # absent, or nested inside a subquery — skip
    head = sql[: m.start()].rstrip()
    tail = sql[m.end() :].strip()
    # trailer keywords count only at top paren depth (an ORDER BY inside
    # an OVER clause is part of the predicate, not the query trailer)
    tm = next(
        (
            t
            for t in _TRAILER_RE.finditer(tail)
            if tail[: t.start()].count("(") == tail[: t.start()].count(")")
        ),
        None,
    )
    pred, trailer = (
        (tail[: tm.start()].strip(), tail[tm.start() :]) if tm else (tail, "")
    )
    # extract window expressions fn(...) OVER (...) from the predicate
    quals: list[str] = []
    out_pred = []
    i = 0
    while i < len(pred):
        fm = _WINFUNC_RE.search(pred, i)
        if not fm:
            out_pred.append(pred[i:])
            break
        close = _match_paren(pred, pred.index("(", fm.start()))
        rest = pred[close + 1 :].lstrip() if close >= 0 else ""
        if close >= 0 and rest[:4].upper() == "OVER":
            oidx = close + 1 + (len(pred[close + 1 :]) - len(rest)) + 4
            op = pred.index("(", oidx)
            oclose = _match_paren(pred, op)
            if oclose >= 0:
                out_pred.append(pred[i : fm.start()])
                quals.append(pred[fm.start() : oclose + 1])
                out_pred.append(f"__qual_{len(quals) - 1}")
                i = oclose + 1
                continue
        out_pred.append(pred[i : (close + 1) if close >= 0 else len(pred)])
        i = (close + 1) if close >= 0 else len(pred)
    if not quals:
        return sql, False
    gen = ", ".join(f"{q} AS __qual_{i}" for i, q in enumerate(quals))
    drop = ", ".join(f"__qual_{i}" for i in range(len(quals)))
    # generated columns join the SELECT list: insert before the
    # top-level FROM (paren-balanced so subquery FROMs don't match)
    fm_from = next(
        (
            t
            for t in re.finditer(r"\bFROM\b", head, re.I)
            if head[: t.start()].count("(") == head[: t.start()].count(")")
        ),
        None,
    )
    if fm_from is None or not re.match(r"^\s*SELECT\b", head, re.I):
        return sql, False
    inner = f"{head[: fm_from.start()].rstrip()}, {gen} {head[fm_from.start():]}"
    return (
        f"SELECT * EXCEPT ({drop}) FROM ({inner}) __qualified "
        f"WHERE {''.join(out_pred).strip()} {trailer}".rstrip(),
        True,
    )


_CONNECT_BY_RE = re.compile(
    r"^\s*SELECT\s+(?P<cols>.*?)\s+FROM\s+(?P<tbl>[\w$#.]+)"
    r"(?:\s+WHERE\s+(?P<where>.*?))?"
    r"(?:\s+START\s+WITH\s+(?P<start>.*?))?"
    r"\s+CONNECT\s+BY\s+(?P<nocycle>NOCYCLE\s+)?(?P<cond>.*?)"
    r"(?P<trailer>\s+ORDER\s+BY\s+.*)?\s*$",
    re.I | re.S,
)
_PRIOR_LEFT_RE = re.compile(
    r"^PRIOR\s+(?P<a>[\w$#.]+)\s*=\s*(?P<b>[\w$#.]+)$", re.I
)
_PRIOR_RIGHT_RE = re.compile(
    r"^(?P<a>[\w$#.]+)\s*=\s*PRIOR\s+(?P<b>[\w$#.]+)$", re.I
)


def rewrite_connect_by(sql: str) -> tuple[str, bool, list[str]]:
    """Oracle hierarchical query → ``WITH RECURSIVE``.

    Handles the canonical org-chart form
    ``SELECT ... FROM t [WHERE w] [START WITH s] CONNECT BY [NOCYCLE]
    PRIOR child = parent [ORDER BY ...]`` (PRIOR on either side of the
    equality). The recursive CTE carries the whole row plus Oracle's
    ``LEVEL`` pseudo-column, the original select list and WHERE apply
    on top (Oracle applies WHERE after hierarchy construction), and
    without START WITH every row anchors — exactly Oracle's semantics.
    Returns (sql, applied, warnings)."""
    m = _CONNECT_BY_RE.match(sql)
    if not m or not re.search(r"\bCONNECT\s+BY\b", sql, re.I):
        return sql, False, []
    cond = m.group("cond").strip()
    pm = _PRIOR_LEFT_RE.match(cond) or _PRIOR_RIGHT_RE.match(cond)
    if pm is None:
        return (
            sql,
            False,
            ["CONNECT BY condition is not a single PRIOR equality — "
             "rewrite manually"],
        )
    # PRIOR x = y: parent's x matches child's y → join c.y = p.x
    if pm.re is _PRIOR_LEFT_RE:
        parent_col, child_col = pm.group("a"), pm.group("b")
    else:
        child_col, parent_col = pm.group("a"), pm.group("b")
    warnings = []
    if m.group("nocycle"):
        warnings.append(
            "NOCYCLE dropped — WITH RECURSIVE has no cycle guard; "
            "ensure the hierarchy is acyclic"
        )
    tbl = m.group("tbl")
    anchor_where = f" WHERE {m.group('start').strip()}" if m.group("start") else ""
    outer_where = f" WHERE {m.group('where').strip()}" if m.group("where") else ""
    trailer = m.group("trailer") or ""
    cols = m.group("cols").strip()
    rewritten = (
        f"WITH RECURSIVE __hier AS ("
        f"SELECT t.*, 1 AS LEVEL FROM {tbl} t{anchor_where} "
        f"UNION ALL "
        f"SELECT c.*, p.LEVEL + 1 FROM {tbl} c "
        f"JOIN __hier p ON c.{child_col} = p.{parent_col}"
        f") SELECT {cols} FROM __hier{outer_where}{trailer}"
    )
    return rewritten, True, warnings


def translate_statement(
    stmt: str,
    dialect: str = "teradata",
    name_mapping: dict[str, str] | None = None,
) -> TranslatedStatement:
    """One statement → Spark SQL + classification + warnings."""
    warnings: list[str] = []
    sql = strip_comments(stmt).strip().rstrip(";")
    if dialect.lower() in ("teradata", "oracle"):
        sql = rewrite_decode(sql)
    if dialect.lower() == "oracle" and re.search(r"\bCONNECT\s+BY\b", sql, re.I):
        sql, applied, cb_warnings = rewrite_connect_by(sql)
        warnings.extend(cb_warnings)
        if not applied and not cb_warnings:
            warnings.append(
                "CONNECT BY could not be auto-rewritten — rewrite manually"
            )
    if dialect.lower() == "teradata":
        for pat, full in _TD_TOKens:
            if pat.match(sql):
                sql = pat.sub(full, sql, count=1)
        if re.match(r"^\s*(SELECT|INSERT|UPDATE|DELETE|MERGE)\b", sql, re.I):
            sql = rewrite_td_functions(sql)
        if _QUALIFY_RE.search(sql):
            sql, applied = rewrite_qualify(sql)
            if not applied:
                warnings.append(
                    "QUALIFY could not be auto-rewritten (subquery or "
                    "non-window predicate) — rewrite manually"
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
