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
