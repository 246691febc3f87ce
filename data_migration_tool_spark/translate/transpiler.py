"""DDL dialect transpiler: Teradata / Oracle / Redshift / Hive → Spark SQL.

The reference outsources translation to the BigQuery Migration API
(``batch_sql_translation.py:104-127``); this module is the in-engine
replacement, scoped to the constructs in the reference's own corpora
(``src/tests/end_to_end/input/ddl/`` and ``samples/ddl/`` — SURVEY
§4.2.1), which are its de-facto conformance set:

- Teradata: SET/MULTISET, FALLBACK, BEFORE/AFTER JOURNAL, CHECKSUM,
  MERGEBLOCKRATIO, MAP=, PRIMARY INDEX (→ cluster hint), CHARACTER SET
  LATIN/UNICODE, [NOT] CASESPECIFIC, FORMAT '...', COMPRESS, TITLE,
  DEFAULT NULL; BYTEINT, DECIMAL(38,s), NUMBER[(p[,s])], FLOAT,
  JSON(n), VARBYTE(n), TIMESTAMP(n) [WITH TIME ZONE].
- Oracle: VARCHAR2, NUMBER[(p[,s])], CHAR(n).
- Redshift: ENCODE <codec>, DISTSTYLE/DISTKEY, SORTKEY (→ cluster
  hint), character varying, IDENTITY.
- Hive: backticked names, STORED AS/ROW FORMAT/LOCATION/TBLPROPERTIES
  tails, plus the global type-override map
  (``global_typeconvert.config.yaml``: datetime → TIMESTAMP).

Parsing is a paren-depth scanner + per-column regex rewriting — not a
full grammar, by design: the corpus defines the contract, and every
construct outside it surfaces as a warning rather than silent
mistranslation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class ColumnDef:
    name: str
    source_type: str
    spark_type: str
    nullable: bool = True


@dataclass
class TranspiledTable:
    source_database: str | None
    source_table: str
    database: str | None
    table: str
    columns: list[ColumnDef]
    cluster_by: list[str] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.table}" if self.database else self.table

    def spark_sql(
        self,
        using: str = "parquet",
        location: str | None = None,
        if_not_exists: bool = False,
    ) -> str:
        cols = ",\n  ".join(f"`{c.name}` {c.spark_type}" for c in self.columns)
        ine = "IF NOT EXISTS " if if_not_exists else ""
        sql = f"CREATE TABLE {ine}{self.qualified_name} (\n  {cols}\n) USING {using}"
        if self.partition_by:
            sql += f"\nPARTITIONED BY ({', '.join(self.partition_by)})"
        if location:
            sql += f"\nLOCATION '{location}'"
        return sql

    def schema_ddl(self) -> str:
        """Spark DDL schema string (for ``spark.read.schema``)."""
        return ", ".join(f"{c.name} {c.spark_type}" for c in self.columns)


# --- type mapping -----------------------------------------------------------

# (regex on the source type expression) → spark type builder
def _decimal(p: str | None, s: str | None, default=(38, 0)) -> str:
    pi = int(p) if p else default[0]
    si = int(s) if s else (default[1] if p is None else 0)
    pi = min(pi, 38)
    si = min(si, pi)
    return f"DECIMAL({pi},{si})"


_TYPE_RULES: list[tuple[re.Pattern, object]] = [
    (re.compile(r"^BYTEINT$", re.I), "TINYINT"),
    (re.compile(r"^(SMALLINT)$", re.I), "SMALLINT"),
    (re.compile(r"^(INTEGER|INT)$", re.I), "INT"),
    (re.compile(r"^BIGINT$", re.I), "BIGINT"),
    (
        re.compile(r"^(?:DECIMAL|NUMERIC)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\))?$", re.I),
        lambda m: _decimal(m.group(1), m.group(2), default=(38, 0)),
    ),
    (
        re.compile(r"^NUMBER\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\))?$", re.I),
        lambda m: _decimal(m.group(1), m.group(2), default=(38, 0))
        if m.group(1)
        else "DECIMAL(38,0)",
    ),
    (re.compile(r"^(FLOAT|REAL|DOUBLE(?:\s+PRECISION)?)$", re.I), "DOUBLE"),
    (
        re.compile(r"^(?:CHAR|CHARACTER)(?:\s+VARYING)?\s*(?:\(\s*\d+\s*\))?$", re.I),
        "STRING",
    ),
    (re.compile(r"^(?:VARCHAR2?|CLOB|LONG\s+VARCHAR|TEXT|STRING)\s*(?:\(\s*\d+\s*\))?$", re.I), "STRING"),
    (re.compile(r"^DATE$", re.I), "DATE"),
    (re.compile(r"^DATETIME$", re.I), "TIMESTAMP_NTZ"),
    (
        re.compile(r"^TIMESTAMP\s*(?:\(\s*\d+\s*\))?\s+WITH(?:\s+LOCAL)?\s+TIME\s+ZONE$", re.I),
        "TIMESTAMP",
    ),
    (re.compile(r"^TIMESTAMP\s*(?:\(\s*\d+\s*\))?$", re.I), "TIMESTAMP_NTZ"),
    (re.compile(r"^TIME\s*(?:\(\s*\d+\s*\))?$", re.I), "STRING"),
    (re.compile(r"^JSON\s*(?:\(\s*\d+\s*\))?$", re.I), "STRING"),
    (re.compile(r"^(?:VARBYTE|BYTE|BLOB|BINARY)\s*(?:\(\s*\d+\s*\))?$", re.I), "BINARY"),
    (re.compile(r"^BOOLEAN$", re.I), "BOOLEAN"),
]


def map_type(source_type: str, type_overrides: dict[str, str] | None = None) -> str | None:
    st = re.sub(r"\s+", " ", source_type.strip())
    if type_overrides:
        ov = type_overrides.get(st.lower())
        if ov:
            return ov
    for pat, out in _TYPE_RULES:
        m = pat.match(st)
        if m:
            return out(m) if callable(out) else out
    return None


# --- column attribute stripping ---------------------------------------------

_COL_ATTR_PATTERNS = [
    r"CHARACTER\s+SET\s+\w+",
    r"NOT\s+CASESPECIFIC",
    r"CASESPECIFIC",
    r"UPPERCASE",
    r"FORMAT\s+'[^']*'",
    r"TITLE\s+'[^']*'",
    r"COMPRESS(?:\s+\([^)]*\)|\s+'[^']*'|\s+\d+)?",
    r"WITH\s+DEFAULT",
    r"DEFAULT\s+(?:NULL|'[^']*'|[\w.]+)",
    r"ENCODE\s+\w+",
    r"DISTKEY",
    r"SORTKEY",
    r"IDENTITY\s*\(\s*\d+\s*,\s*\d+\s*\)",
    r"GENERATED\s+(?:ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY(?:\s*\([^)]*\))?",
    r"PRIMARY\s+KEY",
    r"UNIQUE",
    r"REFERENCES\s+[\w.]+\s*(?:\([^)]*\))?",
    r"CHECK\s*\([^)]*\)",
]
_COL_ATTR_RE = re.compile("|".join(_COL_ATTR_PATTERNS), re.I)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts, buf, depth, instr = [], [], 0, None
    for ch in s:
        if instr:
            buf.append(ch)
            if ch == instr:
                instr = None
            continue
        if ch in ("'", '"'):
            instr = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        parts.append("".join(buf))
    return parts


_HEADER_RE = re.compile(
    r"CREATE\s+(?:(?:SET|MULTISET|GLOBAL\s+TEMPORARY|VOLATILE)\s+)*TABLE\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?:`?([\w$#-]+)`?\s*\.\s*)?`?([\w$#-]+)`?",
    re.I,
)

_PRIMARY_INDEX_RE = re.compile(
    r"(?:UNIQUE\s+)?PRIMARY\s+INDEX\s*(?:\w+\s*)?\(\s*([^)]*)\)", re.I
)
_SORTKEY_RE = re.compile(r"(?:COMPOUND\s+|INTERLEAVED\s+)?SORTKEY\s*\(\s*([^)]*)\)", re.I)
_PARTITION_RE = re.compile(r"PARTITIONED?\s+BY\s*\(\s*([^)]*)\)", re.I)


def transpile_ddl(
    sql: str,
    dialect: str = "teradata",
    name_mapping: dict[str, str] | None = None,
    type_overrides: dict[str, str] | None = None,
) -> TranspiledTable:
    """Transpile one CREATE TABLE statement to Spark.

    ``name_mapping``: source database → target database (the config's
    nameMappingList). ``type_overrides``: lowercase source type →
    spark type (the global_typeconvert contract).
    """
    from data_migration_tool_spark.translate.statements import strip_comments

    text = strip_comments(sql).strip().rstrip(";")
    m = _HEADER_RE.search(text)
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    src_db, src_tbl = m.group(1), m.group(2)
    warnings: list[str] = []

    # column list = first top-level (...) group after the header
    start = text.index("(", m.end())
    depth = 0
    end = -1
    instr = None
    for i in range(start, len(text)):
        ch = text[i]
        if instr:
            if ch == instr:
                instr = None
            continue
        if ch in ("'", '"'):
            instr = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end < 0:
        raise ValueError("unbalanced parentheses in column list")
    head_opts = text[m.end():start]
    body = text[start + 1 : end]
    tail = text[end + 1 :]

    for opt in ("FALLBACK", "JOURNAL", "CHECKSUM", "MERGEBLOCKRATIO", "MAP", "FREESPACE"):
        if re.search(rf"\b{opt}\b", head_opts, re.I):
            warnings.append(f"dropped table option: {opt}")

    columns: list[ColumnDef] = []
    for raw in _split_top_level(body):
        col = re.sub(r"\s+", " ", raw.strip())
        if not col:
            continue
        if re.match(
            r"(?:CONSTRAINT|PRIMARY\s+KEY|FOREIGN\s+KEY|UNIQUE\s*\(|CHECK\s*\()",
            col,
            re.I,
        ):
            warnings.append(f"dropped table constraint: {col[:60]}")
            continue
        cm = re.match(r'(?:`?([\w$#]+)`?|"([^"]+)")\s+(.*)', col)
        if not cm:
            warnings.append(f"unparsed column definition: {col[:60]}")
            continue
        name = cm.group(1) or cm.group(2)
        rest = cm.group(3)
        nullable = not re.search(r"\bNOT\s+NULL\b", rest, re.I)
        # inline named constraints: Oracle's "col NUMBER CONSTRAINT
        # col_nn NOT NULL" (input/ddl/oracle/*.sql) — drop the
        # CONSTRAINT <name> token so the type parser sees the type; the
        # NOT NULL that follows was already captured above
        rest = re.sub(r"\bCONSTRAINT\s+[\w$#]+\s*", " ", rest, flags=re.I)
        # attr strip first: "DEFAULT NULL" must be consumed as one token
        # before the bare NULL/NOT NULL removal (ppl_data_types.sql:13)
        rest = _COL_ATTR_RE.sub(" ", rest)
        rest = re.sub(r"\bNOT\s+NULL\b|\bNULL\b", " ", rest, flags=re.I)
        src_type = re.sub(r"\s+", " ", rest).strip().rstrip(",")
        spark_type = map_type(src_type, type_overrides)
        if spark_type is None:
            warnings.append(f"unmapped type {src_type!r} on column {name}; using STRING")
            spark_type = "STRING"
        columns.append(ColumnDef(name, src_type, spark_type, nullable))

    cluster_by: list[str] = []
    partition_by: list[str] = []
    pm = _PRIMARY_INDEX_RE.search(tail)
    if pm:
        cluster_by = [c.strip() for c in pm.group(1).split(",") if c.strip()]
    sm = _SORTKEY_RE.search(tail)
    if sm:
        cluster_by = [c.strip() for c in sm.group(1).split(",") if c.strip()]
    pp = _PARTITION_RE.search(tail)
    if pp and dialect.lower() == "hive":
        partition_by = [
            p.strip().split()[0] for p in pp.group(1).split(",") if p.strip()
        ]
    for opt in ("DISTSTYLE", "DISTKEY", "STORED AS", "ROW FORMAT", "LOCATION", "TBLPROPERTIES"):
        if re.search(opt.replace(" ", r"\s+"), tail, re.I):
            warnings.append(f"dropped table suffix option: {opt}")

    tgt_db = (name_mapping or {}).get(src_db, src_db)
    return TranspiledTable(
        source_database=src_db,
        source_table=src_tbl,
        database=tgt_db,
        table=src_tbl,
        columns=columns,
        cluster_by=cluster_by,
        partition_by=partition_by,
        warnings=warnings,
    )
