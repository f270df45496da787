"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``etl_warehouse_agnostic_spark.harness``: one
(Spark query, DuckDB oracle) pair per implemented operator from
SURVEY.md §2 plus the training-data ops. ``simhash_pairs`` and
``ivf_topk`` intentionally have no oracle (bit-twiddling / approximate
paths not portably SQL-expressible) → rows-only check; their QUALITY is
oracle-gated by ``simhash_recall`` / ``ivf_recall`` instead (measured
recall vs the exact baseline, hashed against a stated floor).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_warehouse_agnostic_spark.harness import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC final-state (LWW replay collapse) at sf0.001."""
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
