"""Temporal joins Spark lacks as built-ins (SURVEY.md §2.3 extension).

``asof_join``: for every left row, the single most recent right row
with ``right.ts <= left.ts`` per key — the temporal-lookup shape a CDC
stack needs constantly (enrich an event with the dimension version
that was current WHEN the event happened, not now).

Physical strategy: the classic scalable formulation — union the two
sides with a side tag, one window pass per key ordered by (ts, side)
carrying the last-seen right payload forward (``last(..., ignorenulls)``
over UNBOUNDED PRECEDING), then keep left rows. ONE shuffle on the key,
no range-explode, no per-row Python.

Hot keys: a running window cannot be salted like LWW top-1 (state
flows along the whole key timeline), so by default one pathologically
hot key serializes its rows into one window task — bound O(rows of
the hottest key). ``split_seconds`` removes that bound with a
time-bucketed pre-split: rows window per (key, time bucket), a tiny
per-(key, bucket) summary carries the boundary state across buckets,
and the final payload coalesces within-bucket carry with the carried-in
state. The hottest task then holds O(rows per key per bucket) and the
per-key serial part shrinks to O(buckets per key) summary rows.
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
    split_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + the latest right payload at
    or before the left timestamp (NULL when no right row precedes).

    Right payload columns are emitted as ``<right_prefix><col>``.
    Ties (right.ts == left.ts) take the right row (<= semantics, same
    as DuckDB/QuestDB ASOF JOIN). ``split_seconds`` enables the hot-key
    time-bucket pre-split (identical results, proven by property test).
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
    if split_seconds is None:
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
    else:
        # Hot-key pre-split: window per (key, time bucket), then carry
        # boundary state across buckets via a per-(key, bucket) summary
        # (O(buckets per key) rows — the only per-key serial part).
        bucket = F.floor(
            F.unix_micros(F.col("_ts")) / F.lit(int(split_seconds * 1_000_000))
        ).alias("_tb")
        bucketed = unioned.select("*", bucket)
        wb = (
            Window.partitionBy(*on, "_tb")
            .orderBy(F.asc("_ts"), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        within = bucketed.select(
            *on, "_ts", "_side", "_tb",
            *[F.col(c) for c in l_payload],
            F.last("_rp", ignorenulls=True).over(wb).alias("_rp_in"),
        )
        # last right payload per (key, bucket): max_by over right rows;
        # prefix-carried over ALL buckets the key appears in (a bucket
        # holding only left rows still needs the carried-in state)
        summary = (
            bucketed.where(F.col("_side") == 0)
            .groupBy(*on, "_tb")
            .agg(F.max_by("_rp", F.struct("_ts")).alias("_rp_last"))
        )
        buckets_all = bucketed.select(*on, "_tb").distinct()
        state = buckets_all.join(summary, [*on, "_tb"], "left")
        ws = (
            Window.partitionBy(*on)
            .orderBy(F.asc("_tb"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carried_in = state.select(
            *on, "_tb",
            F.last("_rp_last", ignorenulls=True).over(ws).alias("_rp_prev"),
        )
        carried = within.join(carried_in, [*on, "_tb"], "left").select(
            *on, "_ts", "_side",
            *[F.col(c) for c in l_payload],
            F.coalesce("_rp_in", "_rp_prev").alias("_rp"),
        )
    return carried.where(F.col("_side") == 1).select(
        *on, F.col("_ts").alias(left_ts), *l_payload,
        *[F.col(f"_rp.{c}").alias(f"{right_prefix}{c}") for c in r_payload],
    )
