"""Deterministic, fully-distributed synthetic transcript change stream.

Everything is a pure Column expression over ``spark.range`` — no data is
ever materialized on the driver, so the same generator streams 10^10
events on a cluster (SURVEY.md §7.4 "generator must stream").

Dials per FIXTURES.md F2: event count, conversation/turn cardinality,
I/U/D mix, hot-key skew (Zipf-ish head), duplicate/overlap rate (the
reference's lookback overlap, config/sources/repsly.yml:48), and the
schema-evolution LSN (events after it carry schema_ver=2 + `tool`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser", "sql", "calculator"]

BASE_TS = "2025-01-01 00:00:00"


def _h(seed: int, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash stream keyed by seed."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 1000,
    turns_per_conv: int = 50,
    seed: int = 42,
    insert_pct: int = 60,
    update_pct: int = 30,  # remainder is deletes
    hot_conv_frac: float = 0.01,
    hot_event_frac: float = 0.30,
    evolution_lsn: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Ordered change-event table (FIXTURES.md F2), lsn = 1..n_events.

    Hot-key skew: the first ``hot_conv_frac`` of conv ids receive
    ``hot_event_frac`` of all events (default top 1% → 30%), exercising
    the salting path (SURVEY.md T8).
    """
    if evolution_lsn is None:
        evolution_lsn = n_events // 2
    n_hot = max(1, int(n_convs * hot_conv_frac))

    df = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    u = (_h(seed, i) % 1000) / 1000.0
    conv_n = F.when(
        u < F.lit(hot_event_frac), _h(seed + 1, i) % n_hot
    ).otherwise(n_hot + (_h(seed + 2, i) % F.lit(max(1, n_convs - n_hot))))
    lsn = i + 1
    op_draw = _h(seed + 3, i) % 100
    op = (
        F.when(op_draw < insert_pct, F.lit("I"))
        .when(op_draw < insert_pct + update_pct, F.lit("U"))
        .otherwise(F.lit("D"))
    )
    schema_ver = F.when(lsn > evolution_lsn, F.lit(2)).otherwise(F.lit(1))
    conv_id = F.format_string("conv_%08d", conv_n.cast("int"))
    turn_idx = (_h(seed + 4, i) % turns_per_conv).cast("int")
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (_h(seed + 5, i) % len(ROLES) + 1).cast("int"))
    # text is a deterministic function of (seed, conv, turn, lsn) so
    # per-turn text equality is independently checkable (FIXTURES.md F1).
    text = F.format_string(
        "t-%s-%d-v%d-%s",
        conv_id,
        turn_idx,
        lsn,
        F.sha2(F.concat_ws("|", F.lit(seed), conv_id, turn_idx.cast("string"), lsn.cast("string")), 256).substr(1, 12),
    )
    tool = F.when(
        (schema_ver >= 2) & (role == "tool"),
        F.element_at(F.array(*[F.lit(t) for t in TOOLS]), (_h(seed + 6, i) % len(TOOLS) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))
    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_dt_interval(secs=(lsn + (_h(seed + 7, i) % 30)).cast("double"))

    is_delete = op == "D"
    return df.select(
        lsn.alias("lsn"),
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(role).alias("role"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(text).alias("text"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(tool).alias("tool"),
        ts.alias("ts"),
        schema_ver.alias("schema_ver"),
    )


def generate_base_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    turns_per_conv: int = 20,
    seed: int = 7,
) -> DataFrame:
    """Dense base snapshot (FIXTURES.md F1) for bootstrapping the target
    table: every (conv, turn) in range, schema v1 (no tool)."""
    df = spark.range(0, n_convs * turns_per_conv, 1)
    i = F.col("id")
    conv_n = (i / turns_per_conv).cast("long")
    turn_idx = (i % turns_per_conv).cast("int")
    conv_id = F.format_string("conv_%08d", conv_n.cast("int"))
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), (_h(seed, i) % len(ROLES) + 1).cast("int"))
    text = F.format_string(
        "base-%s-%d-%s",
        conv_id,
        turn_idx,
        F.sha2(F.concat_ws("|", F.lit(seed), conv_id, turn_idx.cast("string")), 256).substr(1, 12),
    )
    ts = F.to_timestamp(F.lit(BASE_TS)) - F.make_dt_interval(secs=F.lit(86400.0))
    return df.select(
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        ts.alias("ts"),
    )
