from etl_warehouse_agnostic_spark.functions.scalars import (  # noqa: F401
    bucket_of,
    salt_of,
    parse_microsoft_json_date,
    parse_timestamp_best_effort,
    multi_if,
    to_bool_lenient,
    null_if_dirty,
    sanitize_column_names,
    try_decimal,
    position_ci,
)
