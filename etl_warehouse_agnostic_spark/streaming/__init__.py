from etl_warehouse_agnostic_spark.streaming.stream_apply import StreamingCdcApply  # noqa: F401
