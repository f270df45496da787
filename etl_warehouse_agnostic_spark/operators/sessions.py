"""Gap-based sessionization — assign events to sessions that close
after ``gap`` of inactivity per key.

The classic two-window formulation, fully scalable: both windows
partition BY KEY (never global), so the shuffle is one hash exchange on
the key and hot keys are bounded by per-conversation event counts:

1. ``lag(ts)`` per key → a row starts a new session when the gap from
   the previous event exceeds the threshold;
2. a running SUM of those start-flags per key numbers the sessions.

Output adds ``session_seq`` (1-based per key) and ``session_id``
(key#seq). Deterministic for unique (key, ts[, tiebreak]) orderings.

Hot-key bound: like any running-state window, one key's timeline is
one task — O(events of the hottest key). For conversation/user keys
that bound is the per-entity event count (thousands, not billions),
which is why this op does not carry the time-bucket pre-split that
``asof_join(split_seconds=...)`` has; if a deployment sessionizes a
key class with unbounded per-key volume, apply the same two-level
scheme there (per-(key, bucket) numbering + boundary stitch carrying
last-ts and cumulative count across buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    order = [F.asc(ts_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(prev_ts.cast("timestamp"))
           > gap_seconds * 1_000_000)
    ).cast("int")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = F.sum(is_new).over(w_run).cast("int")
    return df.withColumn("session_seq", seq).withColumn(
        "session_id",
        F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols],
                    F.col("session_seq").cast("string")),
    )
