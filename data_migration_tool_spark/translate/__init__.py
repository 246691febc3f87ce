from data_migration_tool_spark.translate.statements import (  # noqa: F401
    classify_statement,
    split_statements,
)
from data_migration_tool_spark.translate.transpiler import (  # noqa: F401
    TranspiledTable,
    transpile_ddl,
)
