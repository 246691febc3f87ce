from data_migration_tool_spark.audit.log import AuditLog  # noqa: F401
