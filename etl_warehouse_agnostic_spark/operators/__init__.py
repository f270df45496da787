from etl_warehouse_agnostic_spark.operators.dedup import (  # noqa: F401
    lww_dedup,
    lww_dedup_window,
    lww_dedup_salted,
    split_ops,
)
