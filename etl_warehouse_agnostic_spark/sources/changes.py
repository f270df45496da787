"""Change-stream source: bounded, cursor-ordered scans over a
binlog/WAL-shaped change table.

The Spark rebuild of the reference's monotone-cursor pagination loops
(SURVEY.md §2.1 S1/S2: Repsly ``LastTimeStamp`` / ``Last<Entity>ID``
cursors, extractors/repsly/extractor.py:1071-1296) — re-expressed as a
predicate-pushed scan ``WHERE lsn > lo AND lsn <= hi`` against parquet
(or any Spark source). Catalyst pushes the lsn range into the scan, so
an epoch reads only its slice.

Supports a lookback overlap (re-reading a window below the cursor,
reference: lookback_minutes, config/sources/repsly.yml:48); overlap
rows are eliminated by LWW dedup + idempotent MERGE, which is what
makes replay safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ChangeStreamSource:
    def __init__(
        self,
        spark: SparkSession,
        path: str | None = None,
        df: DataFrame | None = None,
        lsn_col: str = "lsn",
    ):
        if (path is None) == (df is None):
            raise ValueError("provide exactly one of path / df")
        self.spark = spark
        self.path = path
        self._df = df
        self.lsn_col = lsn_col

    def frame(self) -> DataFrame:
        if self._df is not None:
            return self._df
        return self.spark.read.parquet(self.path)

    def max_lsn(self) -> int:
        row = self.frame().agg(F.max(self.lsn_col)).first()
        return int(row[0]) if row and row[0] is not None else 0

    def read_slice(self, lo_exclusive: int, hi_inclusive: int, lookback: int = 0) -> DataFrame:
        """Events with lo-lookback < lsn <= hi (filter pushed to scan)."""
        c = F.col(self.lsn_col)
        return self.frame().where(
            (c > F.lit(lo_exclusive - lookback)) & (c <= F.lit(hi_inclusive))
        )
