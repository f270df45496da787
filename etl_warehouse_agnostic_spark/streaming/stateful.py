"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-conversation running state across micro-batches — the
Arrow-batched (never per-row Python) escape hatch for stateful logic
Spark's built-in streaming aggregations can't express. The operator
keeps the CDC tail's per-conversation ledger: cumulative events seen,
the EXACT number of live turns under last-writer-wins (per-turn
winning lsn/op is part of the state), and the high-water LSN —
emitted once per conversation per micro-batch it appears in.

Scale shape: state is keyed by ``conv_id`` (the same key the lake
table buckets on), so a 10^10-event stream shards its state across
executors exactly like the table shards its data. Per-group state is
O(turns per conversation) — bounded and small for transcripts — not
O(events). The per-turn map makes the ledger exactly consistent with
the table's LWW semantics (verified against the batch oracle in
tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("live_turns", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType())),
        T.StructField("turn_lsns", T.ArrayType(T.LongType())),
        T.StructField("turn_alive", T.ArrayType(T.BooleanType())),
    ]
)


def _update_conv_state(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
):
    if state.exists:
        events_seen, max_lsn, turn_idxs, turn_lsns, turn_alive = state.get
        per_turn = {
            int(t): (int(l), bool(a))
            for t, l, a in zip(turn_idxs, turn_lsns, turn_alive)
        }
    else:
        events_seen, max_lsn, per_turn = 0, 0, {}
    for pdf in pdfs:  # Arrow batches for this conv in this micro-batch
        events_seen += len(pdf)
        max_lsn = max(max_lsn, int(pdf["lsn"].max()))
        # vectorized per-turn LWW within the batch: winner = max lsn
        winners = pdf.loc[pdf.groupby("turn_idx")["lsn"].idxmax()]
        for turn, lsn, op in zip(winners["turn_idx"], winners["lsn"], winners["op"]):
            turn, lsn = int(turn), int(lsn)
            if turn not in per_turn or lsn > per_turn[turn][0]:
                per_turn[turn] = (lsn, op != "D")
    live = sum(1 for _, a in per_turn.values() if a)
    state.update(
        (
            events_seen,
            max_lsn,
            list(per_turn.keys()),
            [l for l, _ in per_turn.values()],
            [a for _, a in per_turn.values()],
        )
    )
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "events_seen": [events_seen],
            "live_turns": [live],
            "max_lsn": [max_lsn],
        }
    )


def conversation_ledger(stream: DataFrame) -> DataFrame:
    """Streaming per-conversation ledger (see module docstring).

    ``stream`` must carry (conv_id, turn_idx, op, lsn). Emits one row
    per conversation per micro-batch (update mode); the latest row per
    conversation equals the batch LWW truth.
    """
    return (
        stream.select("conv_id", "turn_idx", "op", "lsn")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
