from data_migration_tool_spark.sources.readers import read_table  # noqa: F401
from data_migration_tool_spark.sources.writers import write_table  # noqa: F401
