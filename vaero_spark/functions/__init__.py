from vaero_spark.functions.paths import col_delete, col_get, col_set, has_column  # noqa: F401
from vaero_spark.functions.regex_utils import named_groups, to_java_regex  # noqa: F401
