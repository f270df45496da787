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


def clean_tabular(df: DataFrame, add_row_number: bool = True) -> DataFrame:
    """Sheet-range cleaner (P4): drop all-null rows, drop all-null
    columns, sanitize+dedupe headers, add a stable ``_row_number``.
    Port of clean_sheet_data, extractors/google_sheets/extractor.py:193-248.

    The all-null column scan is one aggregate pass; the row filter and
    numbering are narrow/window ops.
    """
    from pyspark.sql import Window

    from etl_warehouse_agnostic_spark.functions.scalars import (
        null_if_dirty,
        sanitize_column_names,
    )

    df = sanitize_column_names(df)
    cleaned = df.select(
        *[null_if_dirty(F.col(c)).alias(c) if isinstance(df.schema[c].dataType, T.StringType)
          else F.col(c) for c in df.columns]
    )
    non_null_counts = cleaned.agg(
        *[F.count(F.col(c)).alias(c) for c in cleaned.columns]
    ).first()
    keep_cols = [c for c in cleaned.columns if non_null_counts[c] > 0]
    out = cleaned.select(*keep_cols).where(
        F.greatest(*[F.col(c).isNotNull().cast("int") for c in keep_cols]) == 1
    )
    if add_row_number:
        w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in keep_cols])
        out = out.withColumn("_row_number", F.row_number().over(w))
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
