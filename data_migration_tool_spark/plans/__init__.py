from data_migration_tool_spark.plans.registry import QUERIES, QueryDef  # noqa: F401
