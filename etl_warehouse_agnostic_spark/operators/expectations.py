"""Declarative data-quality expectations (SURVEY.md §2.11) — the
reference's post-load validation battery (validate_extraction_integrity,
airflow/dags/repsly_dag.py:85-214: rowcount, duplicate keys, null
ratios, accepted values, freshness) as ONE operator.

Scale shape: every expectation compiles to an aggregate expression and
ALL of them run in a single ``agg`` pass over the table — one job, one
shuffle-free partial/final aggregation — then the one-row result is
exploded into a (check, passed, observed, threshold) row per
expectation. A battery of 20 checks costs the same scan as one.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    metric: Column  # aggregate expression producing a double
    passed: "callable"  # metric Column -> boolean Column


def unique(cols: list[str]) -> Expectation:
    """Duplicate-key count must be 0 (repsly_dag.py:124-148)."""
    key = F.concat_ws("", *[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in cols])
    m = (F.count(F.lit(1)) - F.countDistinct(key)).cast("double")
    return Expectation(f"unique:{','.join(cols)}", m, lambda c: c == 0)


def not_null_ratio(col: str, max_ratio: float) -> Expectation:
    """Null fraction of a critical field ≤ max_ratio (repsly_dag.py:114-121)."""
    m = F.round(
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        / F.greatest(F.count(F.lit(1)), F.lit(1)),
        6,
    ).cast("double")
    return Expectation(f"not_null:{col}", m, lambda c, r=max_ratio: c <= r)


def accepted_values(col: str, values: list) -> Expectation:
    """Rows outside the accepted set must be 0 (dbt accepted_values)."""
    m = F.sum(
        F.when(F.col(col).isin(values) | F.col(col).isNull(), 0).otherwise(1)
    ).cast("double")
    return Expectation(f"accepted_values:{col}", m, lambda c: c == 0)


def min_rows(n: int) -> Expectation:
    """Expected-vs-actual rowcount floor (repsly_dag.py:85-108)."""
    m = F.count(F.lit(1)).cast("double")
    return Expectation("min_rows", m, lambda c, n=n: c >= n)


def freshness(ts_col: str, not_before: str) -> Expectation:
    """max(ts) must reach the freshness bound (repsly_dag.py:1393-1398).
    ``not_before`` is an ISO timestamp literal; metric = max(ts) as
    epoch MICROseconds (sub-second precision survives — exact in a
    double up to year ~2255)."""
    m = F.unix_micros(F.max(F.col(ts_col).cast("timestamp"))).cast("double")
    bound = F.unix_micros(F.lit(not_before).cast("timestamp"))
    return Expectation(f"freshness:{ts_col}", m, lambda c, b=bound: c >= b)


def run_expectations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in one aggregation pass.

    Returns (check, observed double, passed boolean) — one row per
    expectation, deterministic order by check name.
    """
    if not checks:
        return df.sparkSession.createDataFrame(
            [], "check string, observed double, passed boolean"
        )
    aggs = [e.metric.alias(f"_m{i}") for i, e in enumerate(checks)]
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(e.name).alias("check"),
            F.col(f"_m{i}").alias("observed"),
            e.passed(F.col(f"_m{i}")).alias("passed"),
        )
        for i, e in enumerate(checks)
    ]
    return (
        one.select(F.explode(F.array(*structs)).alias("_e"))
        .select("_e.check", "_e.observed", "_e.passed")
    )
