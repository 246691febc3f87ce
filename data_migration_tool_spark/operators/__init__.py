from data_migration_tool_spark.operators.validation import (  # noqa: F401
    ValidationSpec,
    column_validation,
    custom_query_validation,
    row_validation,
    schema_validation,
)
