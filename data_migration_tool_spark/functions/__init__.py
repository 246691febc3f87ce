from data_migration_tool_spark.functions.scalars import (  # noqa: F401
    dsum,
    davg,
    ordered_string_agg,
    safe_element_at,
)
from data_migration_tool_spark.functions.hashing import (  # noqa: F401
    null_safe_concat,
    row_md5,
)
from data_migration_tool_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
