"""Statement splitting, BTEQ handling, and classification.

Reference behaviors reproduced (SURVEY P5/P6):
- comment-aware splitting on ``;`` — ``--`` line comments, ``/* */``
  blocks, and quoted strings do not terminate statements
  (``dml_validation_dag.py:103-187`` does this line-wise; we do it with
  a single char scan, which also survives semicolons inside strings);
- BTEQ mode: statements starting with ``BEGIN`` have the keyword
  stripped; ``EXCEPTION WHEN ERROR`` / ``END`` blocks are skipped
  (``table_filter.py:57-66``);
- created-table extraction via the CREATE/REPLACE TABLE|VIEW regex
  (``table_filter.py:31-46``).
"""

from __future__ import annotations

import re

_CREATE_RE = re.compile(
    r"\b(?:CREATE|REPLACE)\s+(?:OR\s+REPLACE\s+)?(?:TABLE|VIEW)\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?`?([\w$#-]+)`?\.`?([\w$#-]+)`?",
    re.IGNORECASE,
)

_BTEQ_SKIP = re.compile(r"^(?:EXCEPTION\s+WHEN\s+ERROR|END)\b", re.IGNORECASE)
_BTEQ_BEGIN = re.compile(r"^BEGIN\b", re.IGNORECASE)


def split_statements(content: str, mode: str = "SQL") -> list[str]:
    """Split SQL text into statements on top-level semicolons."""
    statements: list[str] = []
    buf: list[str] = []
    i, n = 0, len(content)
    state = None  # None | "'" | '"' | "--" | "/*"
    while i < n:
        ch = content[i]
        nxt = content[i + 1] if i + 1 < n else ""
        if state is None:
            if ch == "-" and nxt == "-":
                state = "--"
                buf.append(ch)
            elif ch == "/" and nxt == "*":
                state = "/*"
                buf.append(ch)
            elif ch in ("'", '"'):
                state = ch
                buf.append(ch)
            elif ch == ";":
                statements.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        else:
            buf.append(ch)
            if state == "--" and ch == "\n":
                state = None
            elif state == "/*" and ch == "/" and content[i - 1] == "*":
                state = None
            elif state in ("'", '"') and ch == state:
                # doubled quote = escaped
                if nxt == state:
                    buf.append(nxt)
                    i += 1
                else:
                    state = None
        i += 1
    if "".join(buf).strip():
        statements.append("".join(buf))

    out: list[str] = []
    for stmt in statements:
        s = stmt.strip()
        if not s:
            continue
        if mode.upper() == "BTEQ":
            if _BTEQ_SKIP.match(s):
                continue
            if _BTEQ_BEGIN.match(s):
                s = _BTEQ_BEGIN.sub("", s, count=1).strip()
                if not s:
                    continue
        out.append(s)
    return out


def strip_comments(stmt: str) -> str:
    """Remove -- and /* */ comments (string-literal aware)."""
    out: list[str] = []
    i, n = 0, len(stmt)
    state = None
    while i < n:
        ch = stmt[i]
        nxt = stmt[i + 1] if i + 1 < n else ""
        if state is None:
            if ch == "-" and nxt == "-":
                state = "--"
                i += 1
            elif ch == "/" and nxt == "*":
                state = "/*"
                i += 1
            elif ch in ("'", '"'):
                state = ch
                out.append(ch)
            else:
                out.append(ch)
        elif state == "--":
            if ch == "\n":
                state = None
                out.append(ch)
        elif state == "/*":
            if ch == "*" and nxt == "/":
                state = None
                i += 1
        else:  # in string
            out.append(ch)
            if ch == state:
                state = None
        i += 1
    return "".join(out)


def classify_statement(stmt: str) -> str:
    """DDL/DML/query classification (the reference branches DAGs on
    this; we branch executor behavior). Returns one of: create_table,
    create_view, insert, update, delete, merge, select, drop, alter,
    comment_only, other."""
    s = strip_comments(stmt).strip()
    if not s:
        return "comment_only"
    first = s.split(None, 2)
    kw = first[0].upper() if first else ""
    if kw in ("CREATE", "REPLACE"):
        m = re.match(
            r"(?:CREATE|REPLACE)\s+(?:OR\s+REPLACE\s+)?(?:SET\s+|MULTISET\s+)?(\w+)",
            s,
            re.IGNORECASE,
        )
        obj = (m.group(1) if m else "").upper()
        return {"TABLE": "create_table", "VIEW": "create_view"}.get(obj, "other")
    return {
        "INSERT": "insert",
        "UPDATE": "update",
        "DELETE": "delete",
        "DEL": "delete",
        "MERGE": "merge",
        "SELECT": "select",
        "SEL": "select",
        "WITH": "select",
        "DROP": "drop",
        "ALTER": "alter",
    }.get(kw, "other")


def find_created_tables(statements: list[str]) -> set[str]:
    """``db.table`` names created by CREATE/REPLACE TABLE|VIEW."""
    found: set[str] = set()
    for stmt in statements:
        for m in _CREATE_RE.finditer(strip_comments(stmt)):
            found.add(f"{m.group(1)}.{m.group(2)}")
    return found
