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


def _auto_split_seconds(
    unioned: DataFrame,
    on: list[str],
    threshold_rows: int,
    sample_fraction: float,
) -> float | None:
    """Hot-key census on a seeded sample of the union: estimate the
    hottest key's row count; if it would overflow one window task
    (> ``threshold_rows``), derive a bucket width that caps each
    (key, bucket) at ~``threshold_rows`` rows across the observed time
    span. The sample keeps the census shuffle tiny (the scan itself is
    one pass either way); callers who know their key distribution pass
    an explicit ``split_seconds`` (or ``None``) to skip the census."""
    stats = (
        unioned.sample(fraction=sample_fraction, seed=7)
        .groupBy(*on)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_ts").alias("lo"),
            F.max("_ts").alias("hi"),
        )
        .agg(
            F.max("n").alias("max_n"),
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
        .first()
    )
    if stats is None or stats["max_n"] is None:
        return None
    est_hottest = int(stats["max_n"] / sample_fraction)
    if est_hottest <= threshold_rows:
        return None
    try:
        span = (stats["hi"] - stats["lo"]).total_seconds()
    except (AttributeError, TypeError):
        # non-timestamp ts column (numeric ordering key): the bucketed
        # pre-split path needs unix_micros anyway, so fall back to the
        # plain-window path rather than crash the census
        return None
    if span <= 0:
        return None  # all rows share one instant — bucketing cannot help
    n_buckets = max(2, -(-est_hottest // threshold_rows))  # ceil div
    return max(span / n_buckets, 1e-6)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
    split_seconds: float | None | str = "auto",
    auto_split_threshold: int = 4_000_000,
    auto_sample_fraction: float = 0.01,
) -> DataFrame:
    """Left as-of join: all left columns + the latest right payload at
    or before the left timestamp (NULL when no right row precedes).

    Right payload columns are emitted as ``<right_prefix><col>``.
    Ties (right.ts == left.ts) take the right row (<= semantics, same
    as DuckDB/QuestDB ASOF JOIN). ``split_seconds`` enables the hot-key
    time-bucket pre-split (identical results, proven by property test).

    Default ``"auto"`` is hot-key-safe without caller opt-in: a cheap
    sampled census estimates the hottest key and enables the pre-split
    only when that key would exceed ``auto_split_threshold`` rows in a
    single window task. Pass ``None`` (plain window) or an explicit
    width to skip the census pass.
    """
    if split_seconds is not None and not isinstance(split_seconds, (int, float, str)):
        raise TypeError("split_seconds must be 'auto', None, or seconds")
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
    if split_seconds == "auto":
        split_seconds = _auto_split_seconds(
            unioned, on, auto_split_threshold, auto_sample_fraction
        )
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
