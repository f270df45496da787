"""File sinks beyond the lake table (SURVEY.md §2.1 S13).

The reference appends endpoint CSVs by reading the existing file and
``pd.concat``-ing in memory (extractors/acumatica/extractor.py:397-419)
— O(file) per append. Spark's directory-of-parts CSV layout makes
append O(delta): new part files land next to the old ones and readers
union them, so the sink stays cheap at any accumulated size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """Write a CSV dataset (directory of part files)."""
    df.write.option("header", str(header).lower()).mode(mode).csv(path)


def append_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Append a delta — new part files only, existing data untouched."""
    write_csv(df, path, mode="append", header=header)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, header: bool = True) -> DataFrame:
    """Read back with an explicit schema (no inference job, no type
    drift between writes)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)
