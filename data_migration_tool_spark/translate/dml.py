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


_TOP_RE = re.compile(r"^(\s*SELECT)\s+TOP\s+(\d+)(\s+PERCENT)?(\s+WITH\s+TIES)?\b", re.I)


def rewrite_top(sql: str) -> tuple[str, list[str]]:
    """Teradata ``SELECT TOP n`` → trailing ``LIMIT n``.

    Only the plain row-count form is auto-rewritten; ``TOP n PERCENT``
    and ``WITH TIES`` have no single-clause Spark equivalent (percent
    needs a count subquery, ties need RANK) and are left untouched with
    a warning."""
    m = _TOP_RE.match(sql)
    if not m:
        return sql, []
    if m.group(3) or m.group(4):
        return sql, [
            "TOP ... PERCENT / WITH TIES has no direct Spark equivalent "
            "— rewrite manually (percent: count subquery; ties: RANK)"
        ]
    n = m.group(2)
    sql = _TOP_RE.sub(r"\1 ", sql, count=1)
    return sql.rstrip() + f" LIMIT {n}", []


_SYSDATE_RE = re.compile(r"\bSYSDATE\b", re.I)
_DUAL_RE = re.compile(r"\s+FROM\s+DUAL\b", re.I)
_ROWNUM_TRAIL_RE = re.compile(
    r"\s+(WHERE|AND)\s+ROWNUM\s*<=?\s*(\d+)\s*$", re.I
)


def rewrite_oracle_misc(sql: str) -> tuple[str, list[str]]:
    """Oracle idioms with mechanical Spark equivalents: ``SYSDATE`` →
    ``CURRENT_TIMESTAMP`` (outside literals), ``FROM dual`` dropped
    (Spark allows FROM-less SELECT), and a trailing ``[WHERE|AND]
    ROWNUM <= n`` → ``LIMIT n`` (the common pagination tail; ROWNUM
    anywhere else is order-sensitive and only warned)."""
    warnings: list[str] = []
    sql = _map_outside_literals(sql, lambda s: _SYSDATE_RE.sub("CURRENT_TIMESTAMP", s))
    sql = _map_outside_literals(sql, lambda s: _DUAL_RE.sub(" ", s))
    # CREATE VIEW ... WITH READ ONLY — Spark views are read-only by
    # construction; drop the Oracle-only tail (Oracle_ddl_8.sql)
    sql = re.sub(r"\s+WITH\s+READ\s+ONLY\s*$", "", sql, flags=re.I)
    m = _ROWNUM_TRAIL_RE.search(sql)
    if m:
        sql = sql[: m.start()].rstrip() + f" LIMIT {m.group(2)}"
    elif re.search(r"\bROWNUM\b", sql, re.I):
        warnings.append(
            "ROWNUM in a non-trailing position is order-sensitive — "
            "rewrite manually (row_number() window or LIMIT)"
        )
    return sql, warnings


_GETDATE_RE = re.compile(r"\bGETDATE\s*\(\s*\)", re.I)

# Redshift datepart spellings (bare or quoted) → Spark TIMESTAMPADD /
# TIMESTAMPDIFF units. Only parts with an exact Spark unit are mapped.
_DATEPARTS = {
    "y": "YEAR", "yr": "YEAR", "yrs": "YEAR", "year": "YEAR", "years": "YEAR",
    "qtr": "QUARTER", "qtrs": "QUARTER", "quarter": "QUARTER",
    "mon": "MONTH", "mons": "MONTH", "month": "MONTH", "months": "MONTH",
    "w": "WEEK", "wk": "WEEK", "week": "WEEK", "weeks": "WEEK",
    "d": "DAY", "day": "DAY", "days": "DAY",
    "h": "HOUR", "hr": "HOUR", "hrs": "HOUR", "hour": "HOUR", "hours": "HOUR",
    "m": "MINUTE", "min": "MINUTE", "mins": "MINUTE",
    "minute": "MINUTE", "minutes": "MINUTE",
    "s": "SECOND", "sec": "SECOND", "secs": "SECOND",
    "second": "SECOND", "seconds": "SECOND",
    "ms": "MILLISECOND", "msec": "MILLISECOND", "millisecond": "MILLISECOND",
    "milliseconds": "MILLISECOND",
    "us": "MICROSECOND", "usec": "MICROSECOND", "microsecond": "MICROSECOND",
    "microseconds": "MICROSECOND",
}

# DATEDIFF boundary semantics need both operands truncated to the
# datepart before differencing; sub-boundary units are already exact.
_TRUNC_PARTS = {"YEAR", "QUARTER", "MONTH", "WEEK", "DAY", "HOUR", "MINUTE", "SECOND"}


def _rewrite_datepart_func(
    sql: str, name: str, diff: bool
) -> tuple[str, list[str]]:
    """Redshift ``DATEADD/DATEDIFF(datepart, ...)`` → Spark
    ``TIMESTAMPADD/TIMESTAMPDIFF``. The datepart may be bare or quoted
    in Redshift; Spark wants a bare keyword. DATEDIFF counts datepart
    BOUNDARIES crossed (``datediff(day, 23:00, +2h) = 1``), which
    Spark's TIMESTAMPDIFF (full intervals) does not — both operands are
    wrapped in DATE_TRUNC so the boundary count is preserved exactly.
    An unrecognized datepart leaves the call untouched with a warning.
    """
    warnings: list[str] = []
    pat = re.compile(rf"\b{name}\s*\(", re.I)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            return sql, warnings
        if _in_literal(sql, m.start()):
            pos = m.end()
            continue
        open_idx = sql.index("(", m.start())
        close = _match_paren(sql, open_idx)
        if close < 0:
            return sql, warnings
        args = _split_args(sql[open_idx + 1 : close])
        part = args[0].strip().strip("'\"").lower() if args else ""
        unit = _DATEPARTS.get(part)
        if len(args) != 3 or unit is None:
            warnings.append(
                f"{name}({args[0].strip() if args else ''}, ...) — "
                "datepart has no exact Spark unit, rewrite manually"
            )
            pos = close
            continue
        a, b = args[1].strip(), args[2].strip()
        if diff:
            if unit == "WEEK":
                # Redshift weeks run Sunday–Saturday; Spark's
                # DATE_TRUNC('WEEK') snaps to ISO Monday, so the
                # generic truncate-then-TIMESTAMPDIFF shape would be
                # off by one for pairs straddling only a Sunday.
                # Instead truncate each operand to its week's SUNDAY
                # (DAYOFWEEK: 1=Sunday … 7=Saturday) and count 7-day
                # steps — both ends are Sundays, so the day difference
                # is an exact multiple of 7 and integer DIV is exact
                # for either sign. Property-tested against a
                # pure-Python Sunday-week reference
                # (test_properties.py).
                def _sun(x: str) -> str:
                    return (
                        f"DATE_SUB(CAST({x} AS DATE), "
                        f"DAYOFWEEK(CAST({x} AS DATE)) - 1)"
                    )

                repl = f"(DATEDIFF({_sun(b)}, {_sun(a)}) DIV 7)"
                warnings.append(
                    f"info: {name}(week, ...) rewritten to Sunday-based "
                    "week-boundary count (Redshift convention); Spark's "
                    "native WEEK functions are ISO-Monday"
                )
            else:
                if unit in _TRUNC_PARTS:
                    a = f"DATE_TRUNC('{unit}', {a})"
                    b = f"DATE_TRUNC('{unit}', {b})"
                repl = f"TIMESTAMPDIFF({unit}, {a}, {b})"
        else:
            repl = f"TIMESTAMPADD({unit}, {a}, {b})"
        sql = sql[: m.start()] + repl + sql[close + 1 :]
        pos = m.start() + len(repl)


def rewrite_rs_functions(sql: str) -> tuple[str, list[str]]:
    """Redshift scalar idioms → Spark: ``GETDATE()``/``SYSDATE`` →
    ``CURRENT_TIMESTAMP``, variadic ``NVL``/``ISNULL`` → ``COALESCE``
    (Spark's ``nvl`` is strictly 2-arg), ``LEN`` → ``LENGTH``,
    ``CHARINDEX(sub, s)`` → ``POSITION(sub, s)`` (same argument
    order), and boundary-exact DATEADD/DATEDIFF (see
    ``_rewrite_datepart_func``). ``TO_CHAR`` is warned, not rewritten —
    Redshift's PostgreSQL format patterns ('YYYY-MM-DD') differ token
    by token from Spark's SimpleDateFormat ('yyyy-MM-dd')."""
    warnings: list[str] = []
    sql = _map_outside_literals(
        sql, lambda s: _GETDATE_RE.sub("CURRENT_TIMESTAMP", s)
    )
    sql = _map_outside_literals(
        sql, lambda s: _SYSDATE_RE.sub("CURRENT_TIMESTAMP", s)
    )
    sql = _rewrite_func(sql, "NVL", "COALESCE({args})")
    sql = _rewrite_func(sql, "ISNULL", "COALESCE({args})")
    sql = _rewrite_func(sql, "LEN", "LENGTH({args})")
    sql = _rewrite_func(sql, "CHARINDEX", "POSITION({args})")
    sql, w = _rewrite_datepart_func(sql, "DATEADD", diff=False)
    warnings.extend(w)
    sql, w = _rewrite_datepart_func(sql, "DATEDIFF", diff=True)
    warnings.extend(w)
    if re.search(r"\bTO_CHAR\s*\(", sql, re.I):
        warnings.append(
            "TO_CHAR format patterns differ between Redshift (PostgreSQL "
            "'YYYY-MM-DD') and Spark (SimpleDateFormat 'yyyy-MM-dd') — "
            "rewrite the format string manually (date_format)"
        )
    return sql, warnings


def _split_top_level_and(expr: str) -> list[str]:
    """Split a predicate on top-level AND (paren- and literal-aware)."""
    parts, buf, depth, i, n = [], [], 0, 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == "'":
            j = i + 1
            while j < n and not (
                expr[j] == "'" and (j + 1 >= n or expr[j + 1] != "'")
            ):
                j += 2 if expr[j] == "'" else 1
            buf.append(expr[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and expr[i : i + 3].upper() == "AND" and (
            i == 0 or not (expr[i - 1].isalnum() or expr[i - 1] == "_")
        ) and (i + 3 >= n or not (expr[i + 3].isalnum() or expr[i + 3] == "_")):
            parts.append("".join(buf).strip())
            buf = []
            i += 3
            continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


_PLUS_RE = re.compile(r"\(\s*\+\s*\)")
_FROM_WHERE_RE = re.compile(
    r"^(?P<head>\s*SELECT\b.*?\bFROM\s+)(?P<from>[^()]*?)\s+WHERE\s+(?P<where>.*)$",
    re.I | re.S,
)


def rewrite_oracle_outer_join(sql: str) -> tuple[str, list[str]]:
    """Oracle legacy ``(+)`` outer join → ANSI LEFT JOIN, for the
    workhorse shape: comma FROM of exactly two plain tables, every
    ``(+)`` marker attached to columns of ONE table (the optional
    side). Predicates mentioning the marker become the ON clause
    (markers stripped); the rest stay WHERE. Anything fancier — three
    tables, both sides marked, subqueries in FROM — is out of the
    mechanical-confidence zone and warned instead of guessed."""
    if not _PLUS_RE.search(sql):
        return sql, []
    manual = [
        "(+) outer join could not be auto-rewritten (only the "
        "two-plain-table single-optional-side form is mechanical) — "
        "rewrite manually to ANSI JOIN"
    ]
    m = _FROM_WHERE_RE.match(sql)
    if not m:
        return sql, manual
    tables = [t.strip() for t in m.group("from").split(",")]
    if len(tables) != 2 or any(not t or "(" in t for t in tables):
        return sql, manual

    def names_of(tbl: str) -> list[str]:
        toks = tbl.split()
        out = [toks[0].split(".")[-1]]
        if len(toks) > 1:
            out.append(toks[-1])
        return [t.lower() for t in out]

    refs = {i: names_of(t) for i, t in enumerate(tables)}
    preds = _split_top_level_and(m.group("where"))
    on_parts, where_parts, marked = [], [], set()
    for p in preds:
        if not _PLUS_RE.search(p):
            where_parts.append(p)
            continue
        # which table's columns carry the marker: look at `alias.col (+)`
        for mm in re.finditer(r"([\w$#]+)\s*\.\s*[\w$#]+\s*\(\s*\+\s*\)", p):
            a = mm.group(1).lower()
            for i, ns in refs.items():
                if a in ns:
                    marked.add(i)
        on_parts.append(_PLUS_RE.sub("", p).strip())
    if len(marked) != 1:
        return sql, manual
    opt = marked.pop()
    keep = 1 - opt
    new_from = f"{tables[keep]} LEFT JOIN {tables[opt]} ON " + " AND ".join(
        on_parts
    )
    out = m.group("head") + new_from
    if where_parts:
        out += " WHERE " + " AND ".join(where_parts)
    return out, []


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
    if dialect.lower() == "oracle":
        sql, oj_warnings = rewrite_oracle_outer_join(sql)
        warnings.extend(oj_warnings)
        sql, misc_warnings = rewrite_oracle_misc(sql)
        warnings.extend(misc_warnings)
        if re.search(r"\bTO_CHAR\s*\(|\bTO_DATE\s*\(", sql, re.I):
            warnings.append(
                "TO_CHAR/TO_DATE format patterns differ between Oracle "
                "('YYYY-MM-DD') and Spark (SimpleDateFormat 'yyyy-MM-dd') "
                "— verify the format string (date_format / to_date)"
            )
    if dialect.lower() == "hive":
        # Hive QL is largely Spark-native (LATERAL VIEW, DISTRIBUTE BY,
        # CLUSTER BY all parse); the one construct that cannot run
        # without Hive script-transform support is TRANSFORM ... USING
        if re.search(r"\bTRANSFORM\s*\(.*\)\s*USING\b", sql, re.I | re.S):
            warnings.append(
                "Hive TRANSFORM ... USING script transform requires "
                "hive script-transform support — rewrite as a Pandas UDF "
                "(mapInPandas) or enable Hive support"
            )
    if dialect.lower() == "redshift":
        # Redshift shares SELECT TOP n and (since 2023) QUALIFY with
        # Teradata — reuse those rewrites, then the scalar-function map
        sql, top_warnings = rewrite_top(sql)
        warnings.extend(top_warnings)
        if re.match(r"^\s*(SELECT|INSERT|UPDATE|DELETE|MERGE)\b", sql, re.I):
            sql, rs_warnings = rewrite_rs_functions(sql)
            warnings.extend(rs_warnings)
        if _QUALIFY_RE.search(sql):
            sql, applied = rewrite_qualify(sql)
            if not applied:
                warnings.append(
                    "QUALIFY could not be auto-rewritten (subquery or "
                    "non-window predicate) — rewrite manually"
                )
    if dialect.lower() == "teradata":
        for pat, full in _TD_TOKens:
            if pat.match(sql):
                sql = pat.sub(full, sql, count=1)
        sql, top_warnings = rewrite_top(sql)  # after SEL → SELECT expansion
        warnings.extend(top_warnings)
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
