from etl_warehouse_agnostic_spark.sources.generator import (  # noqa: F401
    generate_changes,
    generate_base_transcripts,
)
from etl_warehouse_agnostic_spark.sources.changes import ChangeStreamSource  # noqa: F401
