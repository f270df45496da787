"""Property-based: random I/U/D interleavings with random epoch
boundaries converge to the same state as a single-batch apply and as a
pure-Python oracle (SURVEY.md §5 'Property-based (new)')."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_warehouse_agnostic_spark.engine import CdcEngine
from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
from etl_warehouse_agnostic_spark.lake.table import LakeTable
from etl_warehouse_agnostic_spark.schemas import KEY_COLS, TRANSCRIPTS_SCHEMA_V1
from etl_warehouse_agnostic_spark.sources.changes import ChangeStreamSource

event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 3),  # conv
    st.integers(0, 2),  # turn
)


def python_oracle(events):
    state = {}
    for lsn, (op, conv, turn) in enumerate(events, start=1):
        key = (f"c{conv}", turn)
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = f"t{lsn}"
    return dict(sorted(state.items()))


def spark_apply(spark, root, events, boundaries):
    rows = [
        (lsn, op, f"c{conv}", turn, "user", f"t{lsn}" if op != "D" else None, None)
        for lsn, (op, conv, turn) in enumerate(events, start=1)
    ]
    df = spark.createDataFrame(
        rows, "lsn long, op string, conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    table = LakeTable.create(spark, os.path.join(root, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=4)
    eng = CdcEngine(spark, table, ManifestStore(os.path.join(root, "ck")))
    src = ChangeStreamSource(spark, df=df)
    lo = 0
    for i, hi in enumerate(sorted(set(boundaries)) + [len(rows)], start=1):
        hi = min(hi, len(rows))
        if hi <= lo:
            continue
        eng.apply_epoch(src.read_slice(lo, hi), epoch=i, lsn_range=(lo, hi))
        lo = hi
    return {
        (r.conv_id, r.turn_idx): r.text
        for r in table.read().select("conv_id", "turn_idx", "text").collect()
    }


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(
    events=st.lists(event, min_size=1, max_size=30),
    boundaries=st.lists(st.integers(1, 29), max_size=3),
)
def test_random_interleavings_converge(spark, tmp_path_factory, events, boundaries):
    root = str(tmp_path_factory.mktemp("prop"))
    got = spark_apply(spark, root, events, boundaries)
    want = python_oracle(events)
    assert dict(sorted(got.items())) == want
