"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``etl_warehouse_agnostic_spark.harness``: one
(Spark query, DuckDB oracle) pair per implemented operator from
SURVEY.md §2 plus the training-data ops. Every registry entry has a
full value-hash oracle; the approximate operators (IVF top-k, SimHash
near-pairs, IVF-cell-blocked near-dups) are exercised inside
``recall_gates``, whose oracle re-derives each gate's exact-baseline
count and asserts the measured recall floor as a literal — the hash
fails iff an approximate index loses recall.
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
