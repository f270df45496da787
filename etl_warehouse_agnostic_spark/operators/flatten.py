"""Flatten / projection operators (SURVEY.md §2.2 P1–P4).

The reference flattens nested API JSON row-at-a-time in Python
(flatten_repsly_record, extractors/repsly/extractor.py:338-356;
flatten_leaflink_record, extractors/leaflink/extractor.py:592-740;
flatten_acumatica_record, extractors/acumatica/extractor.py:85-98).
Here the same shapes are Column expressions over typed structs/arrays —
executed inside whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_", max_depth: int = 10) -> DataFrame:
    """Recursively flatten struct columns to ``parent_child`` scalars;
    arrays/maps are serialized to JSON strings with a sibling ``_count``
    (reference: lists → JSON string + count,
    extractors/leaflink/extractor.py:642-734)."""
    for _ in range(max_depth):
        cols: list[Column] = []
        changed = False
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                changed = True
                for sub in f.dataType.fields:
                    cols.append(F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}"))
            elif isinstance(f.dataType, (T.ArrayType, T.MapType)):
                changed = True
                cols.append(F.to_json(f.name).alias(f"{f.name}{sep}json"))
                cols.append(F.size(f.name).alias(f"{f.name}{sep}count"))
            else:
                cols.append(F.col(f"`{f.name}`"))
        if not changed:
            return df
        df = df.select(*cols)
    return df


def unwrap_value_fields(df: DataFrame) -> DataFrame:
    """Acumatica-style ``{'value': x}`` unwrap: any struct with a single
    ``value`` field becomes the scalar (extractors/acumatica/extractor.py:85-98)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType) and [x.name for x in f.dataType.fields] == ["value"]:
            cols.append(F.col(f"`{f.name}`.value").alias(f.name))
        else:
            cols.append(F.col(f"`{f.name}`"))
    return df.select(*cols)


def promote_first_element(df: DataFrame, array_col: str, fields: list[str], prefix: str) -> DataFrame:
    """LeafLink 'primary contact/manager' promotion: first array element's
    fields become top-level columns (extractors/leaflink/extractor.py:655-700)."""
    first = F.try_element_at(F.col(array_col), F.lit(1))  # NULL on empty array
    out = df
    for fld in fields:
        out = out.withColumn(f"{prefix}_{fld}", first.getField(fld))
    return out


def explode_json_items(
    df: DataFrame,
    id_col: str,
    json_col: str,
    item_schema: str = "array<struct<field:string,value:string>>",
) -> DataFrame:
    """dbt forms_items pattern (dbt/models/staging/repsly/forms_items.sql:13-54):
    parse a JSON array column, explode to one row per item with a
    stable per-parent ordinal."""
    parsed = df.select(
        F.col(id_col),
        F.posexplode(F.from_json(F.col(json_col), item_schema)).alias("item_ordinal", "item"),
    )
    return parsed.select(
        id_col,
        (F.col("item_ordinal") + 1).alias("item_ordinal"),
        F.col("item.field").alias("field"),
        F.col("item.value").alias("value"),
    )
