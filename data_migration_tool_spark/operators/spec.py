"""Validation-spec CSV parsing (SURVEY S2; reference
``src/common_utils/storage_utils.py:84-121`` + the 24-column contract
at ``storage_utils.py:12-38``).

The reference downloads a CSV/XLSX, skips 2 header rows, filters rows by
(translation-type, validation-type) and keys them by source table /
query file. Here the file is read driver-side (it is config, not data)
and each row becomes a ``ValidationSpec``.
"""

from __future__ import annotations

import csv
import io

from data_migration_tool_spark.operators.validation import ValidationSpec

SPEC_FIELDS = [
    "translation-type",
    "validation-type",
    "source-table",
    "target-table",
    "source-query-file",
    "target-query-file",
    "filter-status",
    "primary-keys",
    "filters",
    "exclusion-columns",
    "allow-list",
    "count",
    "sum",
    "min",
    "max",
    "avg",
    "grouped-columns",
    "wildcard-include-string-len",
    "cast-to-bigint",
    "threshold",
    "hash",
    "concat",
    "comparison-fields",
    "use-random-row",
    "random-row-batch-size",
]


def _split(v: str | None) -> list[str]:
    return [p.strip() for p in (v or "").split(",") if p.strip()]


def _flag(v: str | None) -> bool:
    return (v or "").strip().upper() in ("Y", "YES", "TRUE", "1")


def _cell_col(ref: str) -> int:
    """'BC12' → 0-based column index (54)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def xlsx_to_csv_text(data: bytes) -> str:
    """First worksheet of an .xlsx → CSV text, stdlib-only.

    Mirrors the reference's XLSX hand-off (storage_utils.py:84-121:
    ``pd.read_excel`` → ``to_csv`` → the CSV parser); this container has
    no excel engine, and the spec file is driver-side config (KB-scale),
    so a direct zip+XML read replaces the pandas round-trip. Handles
    shared strings, inline strings, and numeric cells; absent cells
    become empty fields; trailing numeric ``.0`` is dropped the way
    pandas' int64 inference drops it."""
    import csv as _csv
    import io as _io
    import re
    import zipfile
    from xml.etree import ElementTree

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    zf = zipfile.ZipFile(_io.BytesIO(data))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))

    # resolve the FIRST sheet in workbook tab order (workbook.xml →
    # rels → worksheet part); part numbering reflects creation order,
    # not tab order, so a lexicographic pick can grab the wrong sheet —
    # it remains only as the fallback for rels-less writers
    sheet_name = None
    try:
        wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
        first = wb.find(f"{NS}sheets/{NS}sheet")
        rid = first.get(f"{REL}id") if first is not None else None
        rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels:
            if rid is not None and rel.get("Id") == rid:
                target = rel.get("Target", "").lstrip("/")
                sheet_name = target if target.startswith("xl/") else f"xl/{target}"
                break
    except (KeyError, ElementTree.ParseError):
        pass
    if sheet_name is None or sheet_name not in zf.namelist():
        sheet_name = sorted(
            n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )[0]
    root = ElementTree.fromstring(zf.read(sheet_name))

    rows: list[list[str]] = []
    for row in root.iter(f"{NS}row"):
        out: list[str] = []
        for cell in row.findall(f"{NS}c"):
            ref = cell.get("r", "")
            # c/@r is optional (ECMA-376): a cell without it occupies
            # the next column after the previous cell
            idx = _cell_col(ref) if ref else len(out)
            while len(out) <= idx:
                out.append("")
            ctype = cell.get("t", "n")
            if ctype == "inlineStr":
                is_el = cell.find(f"{NS}is")
                val = "".join(
                    t.text or "" for t in is_el.iter(f"{NS}t")
                ) if is_el is not None else ""
            else:
                v = cell.find(f"{NS}v")
                val = v.text or "" if v is not None else ""
                if ctype == "s":
                    val = shared[int(val)]
                elif ctype == "n" or ctype not in ("str", "b"):
                    if val.endswith(".0"):
                        val = val[:-2]
            out[idx] = val
        rows.append(out)

    buf = _io.StringIO()
    _csv.writer(buf, lineterminator="\n").writerows(rows)
    return buf.getvalue()


def parse_spec_file(
    path: str,
    translation_type: str | None = None,
    validation_type: str | None = None,
    skip_header_rows: int = 2,
) -> dict[str, "ValidationSpec"]:
    """Parse a validation-params file by extension — .xlsx converts to
    CSV first (the reference's chain), anything else reads as CSV."""
    if path.lower().endswith(".xlsx"):
        with open(path, "rb") as fh:
            text = xlsx_to_csv_text(fh.read())
    else:
        with open(path, encoding="utf-8") as fh:
            text = fh.read()
    return parse_spec_rows(text, translation_type, validation_type, skip_header_rows)


def parse_spec_rows(
    text: str,
    translation_type: str | None = None,
    validation_type: str | None = None,
    skip_header_rows: int = 2,
) -> dict[str, ValidationSpec]:
    """Parse the spec CSV text → {source_table_or_query_file: spec}.

    Mirrors the reference's header-skip + type-filter + keying behavior.
    """
    lines = text.splitlines()[skip_header_rows:]
    out: dict[str, ValidationSpec] = {}
    for raw in csv.reader(io.StringIO("\n".join(lines))):
        if not raw or not any(f.strip() for f in raw):
            continue
        row = dict(zip(SPEC_FIELDS, raw + [""] * (len(SPEC_FIELDS) - len(raw))))
        if translation_type and row["translation-type"].strip().lower() != translation_type.lower():
            continue
        if validation_type and row["validation-type"].strip().lower() != validation_type.lower():
            continue
        vtype = row["validation-type"].strip().lower() or "column"
        hash_v = row["hash"].strip()
        concat_v = row["concat"].strip()
        spec = ValidationSpec(
            validation_type=vtype,
            source_table=row["source-table"].strip(),
            target_table=row["target-table"].strip(),
            filters=row["filters"].strip() or None,
            primary_keys=_split(row["primary-keys"]),
            exclusion_columns=_split(row["exclusion-columns"]),
            allow_list=row["allow-list"].strip() or None,
            count_cols=_split(row["count"]),
            sum_cols=_split(row["sum"]),
            min_cols=_split(row["min"]),
            max_cols=_split(row["max"]),
            avg_cols=_split(row["avg"]),
            grouped_columns=_split(row["grouped-columns"]),
            cast_to_bigint=_flag(row["cast-to-bigint"]),
            wildcard_include_string_len=_flag(row["wildcard-include-string-len"]),
            threshold=float(row["threshold"].strip() or 0.0),
            hash_cols=(["*"] if hash_v == "*" else _split(hash_v)) if hash_v else None,
            concat_cols=(["*"] if concat_v == "*" else _split(concat_v)) if concat_v else None,
            comparison_fields=_split(row["comparison-fields"]),
            use_random_row=_flag(row["use-random-row"]),
            random_row_batch_size=int(row["random-row-batch-size"].strip() or 100),
        )
        key = row["source-table"].strip() or row["source-query-file"].strip()
        out[key] = spec
    return out
