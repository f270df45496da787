"""Event-time windowed aggregation with watermarking.

The reference has no event-time windows (its batch DAGs aggregate by
wall-clock load date), but a CDC engine tailing a transcript change
stream needs them for freshness/rate telemetry: events/sec per window,
per-op counts, late-data tolerance. Spark-native: ``withWatermark`` +
``window()`` — state is bounded by the watermark, and the SAME column
expressions run in batch mode (where the watermark is a no-op), which
is how the batch-equivalence test verifies semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_op_counts(
    changes: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
    op_col: str = "op",
) -> DataFrame:
    """Per-event-time-window op census: (window_start, window_end, op,
    n, max_lsn). On a stream, ``watermark_delay`` bounds state and
    admits late events up to the delay; on a batch frame the watermark
    is inert and results equal a plain groupBy — tested equivalence.
    """
    src = changes
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    w = F.window(F.col(ts_col), window_duration)
    return (
        src.groupBy(w.alias("_w"), F.col(op_col))
        .agg(F.count(F.lit(1)).alias("n"), F.max("lsn").alias("max_lsn"))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            op_col,
            "n",
            "max_lsn",
        )
    )
