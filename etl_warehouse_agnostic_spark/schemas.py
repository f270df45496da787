"""Canonical schemas (FIXTURES.md F1/F2; BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import types as T

# F1: target table — (conv_id, turn_idx) is the primary key.
TRANSCRIPTS_SCHEMA_V1 = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Post-evolution schema: adds nullable `tool` (FIXTURES.md F3).
TRANSCRIPTS_SCHEMA_V2 = T.StructType(
    TRANSCRIPTS_SCHEMA_V1.fields[:4]
    + [T.StructField("tool", T.StringType(), True)]
    + TRANSCRIPTS_SCHEMA_V1.fields[4:]
)

# F2: binlog/WAL-shaped change event.
CHANGES_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("schema_ver", T.IntegerType(), False),
    ]
)

KEY_COLS = ["conv_id", "turn_idx"]
ORDER_COLS = ["lsn", "ts"]  # LWW order: max (lsn, ts) wins
