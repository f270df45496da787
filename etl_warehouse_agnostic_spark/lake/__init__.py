from etl_warehouse_agnostic_spark.lake.table import LakeTable, CommitConflict  # noqa: F401
from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore  # noqa: F401
