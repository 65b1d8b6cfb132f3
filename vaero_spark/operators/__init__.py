from vaero_spark.operators.transforms import (  # noqa: F401
    add,
    delete,
    filter_regexp,
    hash_sample,
    mask,
    parse_regexp,
    rename,
    select,
)
