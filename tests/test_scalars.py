"""Scalar-function ports — reference-shaped micro-fixtures (FIXTURES.md F6)."""

import datetime

from pyspark.sql import functions as F

from etl_warehouse_agnostic_spark.functions.scalars import (
    multi_if,
    null_if_dirty,
    parse_microsoft_json_date,
    parse_timestamp_best_effort,
    position_ci,
    sanitize_column_names,
    to_bool_lenient,
    try_decimal,
)


def _one_col(spark, values, fn, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {dtype}")
    return [r[0] for r in df.select(fn(F.col("v")).alias("out")).collect()]


def test_microsoft_json_date_shapes(spark):
    # port of extractors/repsly/extractor.py:512-548 edge cases
    vals = [
        "/Date(1665059530000+0000)/",
        "/Date(1665059530000)/",
        "/Date(-86400000)/",  # pre-epoch
        " /Date(1665059530000+0000)/ ",  # padded
        "not a date",
        "",
        None,
    ]
    out = _one_col(spark, vals, parse_microsoft_json_date)
    expect = datetime.datetime(2022, 10, 6, 12, 32, 10)
    assert out[0] == expect and out[1] == expect
    assert out[2] == datetime.datetime(1969, 12, 31, 0, 0)
    assert out[3] == expect
    assert out[4] is None and out[5] is None and out[6] is None


def test_best_effort_timestamp(spark):
    vals = [
        "2022-10-06T12:32:10Z",
        "2022-10-06T12:32:10+00:00",
        "2022-10-06 12:32:10",
        "2022/10/06 12:32:10",
        "/Date(1665059530000+0000)/",
        "2022-10-06",
        "garbage",
    ]
    out = _one_col(spark, vals, parse_timestamp_best_effort)
    expect = datetime.datetime(2022, 10, 6, 12, 32, 10)
    assert out[:5] == [expect] * 5
    assert out[5] == datetime.datetime(2022, 10, 6)
    assert out[6] is None


def test_null_if_dirty(spark):
    vals = ["", "NULL", "null", "nan", "<NA>", "N/A", "  none ", "keep", "0"]
    out = _one_col(spark, vals, null_if_dirty)
    assert out == [None] * 7 + ["keep", "0"]


def test_to_bool_lenient(spark):
    vals = ["true", "1", "T", "YES", "y", "false", "0", "f", "No", "n", "maybe", None]
    out = _one_col(spark, vals, to_bool_lenient)
    assert out == [True] * 5 + [False] * 5 + [None, None]


def test_try_decimal(spark):
    from decimal import Decimal

    vals = ["12.34", "-5", "1e3", "abc", "", None]
    out = _one_col(spark, vals, try_decimal)
    assert out[0] == Decimal("12.34") and out[1] == Decimal("-5.00")
    assert out[2] is None and out[3] is None and out[4] is None and out[5] is None


def test_multi_if_and_position_ci(spark):
    df = spark.createDataFrame([(5, "Hello World"), (25, "bye"), (99, "HELLO")],
                               "n int, s string")
    out = df.select(
        multi_if(
            (F.col("n") < 10, F.lit("low")),
            (F.col("n") < 50, F.lit("mid")),
            default=F.lit("high"),
        ).alias("band"),
        position_ci("s", "hello").alias("has_hello"),
    ).collect()
    assert [(r.band, r.has_hello) for r in out] == [
        ("low", True), ("mid", False), ("high", True)
    ]


def test_sanitize_column_names(spark):
    df = spark.createDataFrame(
        [(1, 2, 3, 4)], ["First Name", "first-name", "2nd col", "weird.dot"]
    )
    out = sanitize_column_names(df)
    assert out.columns == ["first_name", "first_name_1", "c_2nd_col", "weird_dot"]
