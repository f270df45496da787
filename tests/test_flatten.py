"""Flatten operators — reference edge shapes (FIXTURES.md F6):
money struct, arrays→json+count, value-unwrap, JSON items explode."""

from pyspark.sql import Row

from etl_warehouse_agnostic_spark.operators.flatten import (
    explode_json_items,
    flatten_structs,
    promote_first_element,
    unwrap_value_fields,
)


def test_flatten_structs_money_and_arrays(spark):
    df = spark.createDataFrame(
        [
            Row(
                id=1,
                total=Row(amount="12.50", currency="USD"),
                tags=["a", "b", "c"],
            )
        ]
    )
    out = flatten_structs(df)
    row = out.first()
    assert out.columns == ["id", "total_amount", "total_currency", "tags_json", "tags_count"]
    assert row.total_amount == "12.50" and row.total_currency == "USD"
    assert row.tags_json == '["a","b","c"]' and row.tags_count == 3


def test_flatten_nested_two_levels(spark):
    df = spark.createDataFrame([Row(a=Row(b=Row(c=7)))])
    out = flatten_structs(df)
    assert out.columns == ["a_b_c"] and out.first().a_b_c == 7


def test_unwrap_value_fields(spark):
    df = spark.createDataFrame(
        [(1, ("Acme",), (None,))],
        "id long, name struct<value:string>, other struct<value:string>",
    )
    out = unwrap_value_fields(df)
    assert out.columns == ["id", "name", "other"]
    assert out.first().name == "Acme"


def test_promote_first_element(spark):
    df = spark.createDataFrame(
        [(1, [("a@x.com", "A"), ("b@x.com", "B")]), (2, [])],
        "id long, contacts array<struct<email:string,name:string>>",
    )
    out = promote_first_element(df, "contacts", ["email", "name"], "primary")
    rows = {r.id: r for r in out.collect()}
    assert rows[1].primary_email == "a@x.com" and rows[1].primary_name == "A"
    assert rows[2].primary_email is None


def test_explode_json_items(spark):
    df = spark.createDataFrame(
        [(10, '[{"field":"q1","value":"yes"},{"field":"q2","value":"no"}]'),
         (11, "not json"),
         (12, None)],
        "form_id long, items string",
    )
    out = explode_json_items(df, "form_id", "items").collect()
    assert [(r.form_id, r.item_ordinal, r.field, r.value) for r in out] == [
        (10, 1, "q1", "yes"), (10, 2, "q2", "no")
    ]
