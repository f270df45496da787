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


def flatten_with_rules(df: DataFrame, sep: str = "_") -> DataFrame:
    """Rule-based flatten (P2) — the reference's special-cased record
    shapes (flatten_leaflink_record, extractors/leaflink/extractor.py:592-740),
    detected from the schema and applied before the generic flatten:

    - **money rule**: a struct whose fields are exactly
      ``{amount, currency}`` becomes ``<col>_amount`` + ``<col>_currency``
      (reference :592-740's ``{'amount': .., 'currency': ..}`` handling);
    - **named-list rule**: an ``array<struct<...name...>>`` becomes
      ``<col>_names`` = pipe-joined ``name`` fields plus ``<col>_count``
      (reference tags handling, :675-677:
      ``'|'.join(t['name'] for t in tags)``);
    - everything else falls through to :func:`flatten_structs`.
    """
    cols: list[Column] = []
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, T.StructType) and sorted(x.name for x in dt.fields) == ["amount", "currency"]:
            cols.append(F.col(f"`{f.name}`.amount").alias(f"{f.name}{sep}amount"))
            cols.append(F.col(f"`{f.name}`.currency").alias(f"{f.name}{sep}currency"))
        elif (
            isinstance(dt, T.ArrayType)
            and isinstance(dt.elementType, T.StructType)
            and "name" in [x.name for x in dt.elementType.fields]
        ):
            names = F.transform(F.col(f"`{f.name}`"), lambda t: t.getField("name"))
            cols.append(F.array_join(names, "|").alias(f"{f.name}{sep}names"))
            cols.append(F.size(f"`{f.name}`").alias(f"{f.name}{sep}count"))
        else:
            cols.append(F.col(f"`{f.name}`"))
    return flatten_structs(df.select(*cols), sep=sep)


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


def global_row_number(
    df: DataFrame,
    sort_cols: list[Column],
    out_col: str = "_row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered 1-based row numbers WITHOUT a single-partition
    window (``Window.orderBy`` with no partitionBy collapses the whole
    input into one task — a scale-killer).

    Scheme: range-repartition on the sort key (the same distributed
    sort a global orderBy plans), sort within partitions, then number
    as ``monotonically_increasing_id`` offsets + per-partition base
    offsets from a tiny (≤ num_partitions rows) census. Two reads of
    ONE materialization: the ranged frame is localCheckpoint()ed so the
    census collect and the final projection observe the SAME partitions
    even when the upstream plan is nondeterministic (fresh uuid/rand
    columns, source files changed between executions). Without the
    checkpoint the range exchange would replay twice and the two reads
    could disagree, yielding colliding row numbers.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id().alias("_mid"),
        )
        .localCheckpoint(eager=True)
    )
    # census: rows + first mono-id per physical partition (mono-ids are
    # consecutive within a partition, so rank = _mid - min_mid)
    stats = sorted(
        ranged.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("_n"), F.min("_mid").alias("_mn")
        ).collect(),
        key=lambda r: r["_pid"],
    )
    base = 0
    entries: list[Column] = []
    for r in stats:
        entries.append(F.lit(int(r["_pid"])))
        entries.append(F.struct(F.lit(base).alias("off"), F.lit(int(r["_mn"])).alias("mn")))
        base += int(r["_n"])
    if not entries:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    m = F.create_map(*entries)
    rn = (F.col("_mid") - m[F.col("_pid")]["mn"] + m[F.col("_pid")]["off"] + 1).cast("int")
    return ranged.withColumn(out_col, rn).drop("_pid", "_mid")


def clean_tabular(df: DataFrame, add_row_number: bool = True) -> DataFrame:
    """Sheet-range cleaner (P4): drop all-null rows, drop all-null
    columns, sanitize+dedupe headers, add a stable ``_row_number``.
    Port of clean_sheet_data, extractors/google_sheets/extractor.py:193-248.

    The all-null column scan is one aggregate pass; the row filter is a
    narrow op; numbering uses ``global_row_number`` (range-partitioned,
    no single-partition exchange).
    """
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
    if not keep_cols:  # every column all-null → empty sheet
        out = cleaned.where(F.lit(False))
        if add_row_number:
            out = out.withColumn("_row_number", F.lit(None).cast("int"))
        return out
    any_non_null = F.lit(False)
    for c in keep_cols:  # OR-chain works for a single surviving column
        any_non_null = any_non_null | F.col(c).isNotNull()
    out = cleaned.select(*keep_cols).where(any_non_null)
    if add_row_number:
        out = global_row_number(out, [F.col(c).asc_nulls_last() for c in keep_cols])
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
