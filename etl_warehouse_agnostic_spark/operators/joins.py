"""Temporal joins Spark lacks as built-ins (SURVEY.md §2.3 extension).

``asof_join``: for every left row, the single most recent right row
with ``right.ts <= left.ts`` per key — the temporal-lookup shape a CDC
stack needs constantly (enrich an event with the dimension version
that was current WHEN the event happened, not now).

Physical strategy: the classic scalable formulation — union the two
sides with a side tag, one window pass per key ordered by (ts, side)
carrying the last-seen right payload forward (``last(..., ignorenulls)``
over UNBOUNDED PRECEDING), then keep left rows. ONE shuffle on the key,
no range-explode, no per-row Python; skew on hot keys is the same
window-salting problem the LWW dedup already solves (keys here are the
join keys, typically well-spread dimensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: all left columns + the latest right payload at
    or before the left timestamp (NULL when no right row precedes).

    Right payload columns are emitted as ``<right_prefix><col>``.
    Ties (right.ts == left.ts) take the right row (<= semantics, same
    as DuckDB/QuestDB ASOF JOIN).
    """
    l_payload = [c for c in left.columns if c not in on and c != left_ts]
    r_payload = [c for c in right.columns if c not in on and c != right_ts]

    # The whole right payload travels as ONE nullable struct: carrying
    # columns independently with last(ignorenulls) would stitch fields
    # from DIFFERENT right versions whenever a field is individually
    # null. The struct is atomically non-null for right rows.
    rp_struct = F.struct(*[F.col(c).alias(c) for c in r_payload])
    rp_type = right.select(rp_struct.alias("_rp")).schema["_rp"].dataType

    lt = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts (<=)
        *[F.col(c) for c in l_payload],
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        rp_struct.alias("_rp"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "_ts",
        "_side",
        *[F.col(c) for c in l_payload],
        F.last("_rp", ignorenulls=True).over(w).alias("_rp"),
    )
    return carried.where(F.col("_side") == 1).select(
        *on, F.col("_ts").alias(left_ts), *l_payload,
        *[F.col(f"_rp.{c}").alias(f"{right_prefix}{c}") for c in r_payload],
    )
