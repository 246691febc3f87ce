"""Catalog/DDL extraction (SURVEY §2.1 S8-S11, §7.2 step 5)."""

from data_migration_tool_spark.extract.catalog import (
    columns_info,
    extract_catalog_ddls,
    reconstruct_create_table,
    table_metadata,
)

__all__ = [
    "columns_info",
    "extract_catalog_ddls",
    "reconstruct_create_table",
    "table_metadata",
]
