"""Structured-Streaming apply: backlog drain equals batch replay;
restart resumes from the streaming checkpoint without re-applying."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_warehouse_agnostic_spark.engine import CdcEngine
from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
from etl_warehouse_agnostic_spark.lake.table import LakeTable
from etl_warehouse_agnostic_spark.schemas import KEY_COLS, TRANSCRIPTS_SCHEMA_V1
from etl_warehouse_agnostic_spark.sources.generator import generate_changes
from etl_warehouse_agnostic_spark.streaming.stream_apply import StreamingCdcApply


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream"))
    # several files so maxFilesPerTrigger yields multiple micro-batches
    path = os.path.join(d, "changes.parquet")
    generate_changes(spark, 3000, n_convs=50, turns_per_conv=8, seed=9, num_partitions=6) \
        .write.parquet(path)
    # A real appended change log has monotonically increasing file
    # mtimes; Spark's file stream orders discovery by mtime. Writing
    # all files at once gives them one mtime → arbitrary batch order,
    # which violates the engine's in-order contract. Simulate the
    # appended log: stamp mtimes in lsn order (spark.range partitions
    # are lsn-contiguous, part files sort by partition index).
    import duckdb as _dd
    import time as _time

    parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    ranked = []
    for f in parts:
        lo = _dd.sql(f"select min(lsn) from read_parquet('{path}/{f}')").fetchone()[0]
        ranked.append((lo, f))
    base = _time.time() - 3600
    for i, (_, f) in enumerate(sorted(ranked)):
        os.utime(os.path.join(path, f), (base + i * 10, base + i * 10))
    return path


def oracle(path):
    return duckdb.sql(
        f"""
        SELECT conv_id, turn_idx, text FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                   ORDER BY lsn DESC, ts DESC) rn
          FROM read_parquet('{path}/*.parquet'))
        WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx
        """
    ).fetchall()


def test_streaming_backlog_drain_matches_oracle(spark, tmpdir_path, stream_dir):
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=8
    )
    eng = CdcEngine(spark, table, ManifestStore(os.path.join(tmpdir_path, "ck")))
    s = StreamingCdcApply(
        eng, stream_dir, os.path.join(tmpdir_path, "stream_ckpt"), max_files_per_trigger=2
    )
    s.run_available()
    got = [
        (r.conv_id, r.turn_idx, r.text)
        for r in table.read().select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx").collect()
    ]
    assert got == oracle(stream_dir)
    # multiple micro-batches became multiple committed epochs
    assert len(eng.checkpoints.epochs()) >= 2


def test_streaming_restart_is_noop(spark, tmpdir_path, stream_dir):
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=8
    )
    eng = CdcEngine(spark, table, ManifestStore(os.path.join(tmpdir_path, "ck")))
    ckpt = os.path.join(tmpdir_path, "stream_ckpt")
    s1 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=3)
    s1.run_available()
    v1 = table.latest_version()
    # "restart": new wrapper, same streaming checkpoint → nothing new.
    # No explicit epoch_base: the pinned base file must prevent
    # re-derivation from last_epoch() (which has advanced).
    s2 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=3)
    assert s2.epoch_base == s1.epoch_base
    s2.run_available()
    assert table.latest_version() == v1


def test_epoch_base_pinned_not_rederived(spark, tmpdir_path, stream_dir):
    """Regression: a restarted wrapper must keep the first-start
    epoch_base even though last_epoch() has grown — otherwise a
    replayed batch_id maps to a FRESH epoch id and bypasses the
    epoch-id exactly-once check."""
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=8
    )
    store = ManifestStore(os.path.join(tmpdir_path, "ck"))
    eng = CdcEngine(spark, table, ManifestStore(os.path.join(tmpdir_path, "ck")))
    ckpt = os.path.join(tmpdir_path, "stream_ckpt")
    s1 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=2)
    assert s1.epoch_base == 0
    s1.run_available()
    assert (store.last_epoch() or 0) > 0  # streaming advanced the manifests
    s2 = StreamingCdcApply(eng, stream_dir, ckpt)
    assert s2.epoch_base == 0  # pinned, NOT last_epoch()


def test_windowed_op_counts_stream_equals_batch(spark, tmpdir_path, stream_dir):
    """Event-time windowed agg: streaming (watermarked, availableNow)
    must produce exactly the batch groupBy result."""
    from etl_warehouse_agnostic_spark.streaming.windows import windowed_op_counts

    batch_df = spark.read.parquet(stream_dir)
    want = sorted(
        tuple(r) for r in windowed_op_counts(batch_df, window_duration="30 minutes").collect()
    )
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(stream_dir)
    )
    out_dir = os.path.join(tmpdir_path, "win_out")
    q = (
        windowed_op_counts(stream, window_duration="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(tmpdir_path, "win_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits a window only once its watermark passes; run a
    # final empty trigger to flush, then one more batch read.
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    # Watermark semantics: windows still open at end-of-stream are not
    # emitted in append mode. Every emitted row must match the batch
    # truth, and the emitted set must cover all CLOSED windows.
    want_by_key = {(r[0], r[1], r[2]): r for r in want}
    assert got, "stream should emit at least the closed windows"
    for r in got:
        assert want_by_key[(r[0], r[1], r[2])] == r
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    for r in want:
        window_end = r[1]
        # closed = end + delay (10 min default) <= max event time seen
        import datetime
        if window_end + datetime.timedelta(minutes=10) <= max_ts:
            assert (r[0], r[1], r[2]) in {(g[0], g[1], g[2]) for g in got}, r


def test_conversation_ledger_matches_batch_lww(spark, tmpdir_path, stream_dir):
    """applyInPandasWithState ledger: after draining the backlog, the
    latest row per conversation equals the batch LWW truth (live turn
    count, events seen, high-water lsn)."""
    from etl_warehouse_agnostic_spark.streaming.stateful import conversation_ledger

    batch_df = spark.read.parquet(stream_dir)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 2)  # several micro-batches → state crosses batches
        .parquet(stream_dir)
    )
    out_dir = os.path.join(tmpdir_path, "ledger_out")

    def sink(batch_df, _bid):  # file sinks are append-only; route update-mode
        batch_df.write.mode("append").parquet(out_dir)  # emissions via foreachBatch

    q = (
        conversation_ledger(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ledger_ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out_dir)
    # latest emission per conversation = the one with max events_seen
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy(F.desc("events_seen"), F.desc("max_lsn"))
    final = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .select("conv_id", "events_seen", "live_turns", "max_lsn")
    )
    got = {r["conv_id"]: (r["events_seen"], r["live_turns"], r["max_lsn"]) for r in final.collect()}
    want = {}
    for r in duckdb.sql(
        f"""
        WITH lww AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                     ORDER BY lsn DESC) rn
            FROM read_parquet('{stream_dir}/*.parquet')) WHERE rn = 1)
        SELECT s.conv_id, s.n_events, coalesce(l.n_live, 0), s.hi
        FROM (SELECT conv_id, count(*) n_events, max(lsn) hi
              FROM read_parquet('{stream_dir}/*.parquet') GROUP BY conv_id) s
        LEFT JOIN (SELECT conv_id, count(*) n_live FROM lww
                   WHERE op <> 'D' GROUP BY conv_id) l USING (conv_id)
        """
    ).fetchall():
        want[r[0]] = (r[1], r[2], r[3])
    assert got == want


def test_streaming_drains_into_warehouse_backend(spark, tmpdir_path, stream_dir):
    """Streaming × warehouse matrix cell: readStream → foreachBatch →
    warehouse MERGE must equal batch LWW, and a restart with no new
    files must be a no-op (epoch ids pinned across restarts)."""
    from etl_warehouse_agnostic_spark.lake.backends import DuckBackend

    duck = DuckBackend.create(
        spark, os.path.join(tmpdir_path, "wh.duckdb"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS
    )
    ck = ManifestStore(os.path.join(tmpdir_path, "ck"))
    eng = CdcEngine(spark, None, ck, num_salts=4)
    app = StreamingCdcApply(
        eng, stream_dir, os.path.join(tmpdir_path, "stream-ck"),
        max_files_per_trigger=2, warehouse=duck,
    )
    app.run_available()

    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in duck.read().select("conv_id", "turn_idx", "text").collect()
    )
    want = sorted(tuple(r) for r in oracle(stream_dir))
    assert got == want
    epochs_before = duck.committed_epochs()
    assert len(epochs_before) >= 2  # several micro-batches

    # restart: same checkpoint, no new files → no new epochs, state fixed
    app2 = StreamingCdcApply(
        eng, stream_dir, os.path.join(tmpdir_path, "stream-ck"),
        max_files_per_trigger=2, warehouse=duck,
    )
    app2.run_available()
    assert duck.committed_epochs() == epochs_before
    got2 = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in duck.read().select("conv_id", "turn_idx", "text").collect()
    )
    assert got2 == want


def _wait_epochs(store, q, want, timeout=600):
    """Wait for `want` epochs, surfacing the query's own error
    immediately if it dies (the r4 fixed 120/180 s deadlines flaked in
    the host's slow mode)."""
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if len(store.epochs()) >= want:
            return
        if q.exception() is not None:
            raise q.exception()
        time.sleep(0.5)
    raise AssertionError(
        f"only {len(store.epochs())}/{want} epochs after {timeout}s; "
        f"status={q.status}"
    )


def _wait_drained(store, q, want, timeout=600):
    """Wait until `want` epochs landed OR the stream reports itself
    drained (no data available AND trigger idle) for ~10 s straight.
    Returns the epoch list at that point.

    The epoch COUNT is deliberately not the contract: on restart Spark
    may legally pack the killed run's remainder into fewer micro-batches
    than maxFilesPerTrigger suggests (observed: 6 files → 5 batches,
    stream idle — the r4 'flake' was real batching, not slowness). A
    multi-file batch is still ONE epoch with LWW dedup inside, so the
    callers assert the actual contract instead: contiguous chain,
    exactly-once, and convergence to the batch oracle."""
    import time

    deadline = time.time() + timeout
    idle = 0
    while time.time() < deadline:
        if len(store.epochs()) >= want:
            return store.epochs()
        if q.exception() is not None:
            raise q.exception()
        st = q.status
        if not st.get("isDataAvailable") and not st.get("isTriggerActive"):
            idle += 1
            if idle >= 20:
                return store.epochs()
        else:
            idle = 0
        time.sleep(0.5)
    raise AssertionError(
        f"stream neither drained nor reached {want} epochs after {timeout}s; "
        f"epochs={store.epochs()} status={q.status}"
    )


def test_continuous_trigger_kill_and_restart_converges(spark, tmpdir_path, stream_dir):
    """The reference runs forever on a schedule
    (airflow/dags/repsly_dag.py:309-343); the streaming analog is a
    processingTime trigger. Kill the query mid-backlog, restart, and
    the engine must converge to the batch LWW truth with a contiguous,
    duplicate-free epoch chain — a replayed micro-batch maps to its
    original epoch id and is skipped by the ledger."""
    import time

    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=8
    )
    store = ManifestStore(os.path.join(tmpdir_path, "ck"))
    eng = CdcEngine(spark, table, store)
    ckpt = os.path.join(tmpdir_path, "stream_ckpt")
    s1 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=1)
    q = s1.run_continuous(processing_time="1 second")
    try:
        # let it chew PART of the backlog (6 files, 1 per batch), then
        # kill it mid-stream
        _wait_epochs(store, q, 2)
    finally:
        q.stop()
    mid_epochs = store.epochs()
    assert len(mid_epochs) < 6, "kill was supposed to land mid-backlog"

    # restart on the same checkpoint, continuous again, until drained
    s2 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=1)
    assert s2.epoch_base == s1.epoch_base  # pinned across restarts
    q2 = s2.run_continuous(processing_time="1 second")
    try:
        _wait_drained(store, q2, 6)
    finally:
        q2.stop()

    # contiguous, duplicate-free epoch chain; the restart made real
    # progress (count may legally be < 6 if Spark packed the remainder
    # into fewer batches — see _wait_drained); convergence to the batch
    # oracle is the exactly-once contract
    epochs = store.epochs()
    assert epochs == list(range(1, len(epochs) + 1))
    assert len(epochs) > len(mid_epochs)
    got = [
        (r.conv_id, r.turn_idx, r.text)
        for r in table.read().select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx").collect()
    ]
    assert got == oracle(stream_dir)


def test_continuous_trigger_warehouse_kill_restart(spark, tmpdir_path, stream_dir):
    """Same kill-restart contract on the streaming × warehouse cell:
    continuous trigger into the SQL backend, killed mid-backlog, must
    restart exactly-once (ledger-skipped replays) and converge."""
    import time

    from etl_warehouse_agnostic_spark.lake.backends import DuckBackend

    duck = DuckBackend.create(
        spark, os.path.join(tmpdir_path, "wh.duckdb"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS
    )
    store = ManifestStore(os.path.join(tmpdir_path, "ck"))
    eng = CdcEngine(spark, None, store, num_salts=4)
    ckpt = os.path.join(tmpdir_path, "stream_ckpt")
    s1 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=1, warehouse=duck)
    q = s1.run_continuous(processing_time="1 second")
    try:
        _wait_epochs(store, q, 2)
    finally:
        q.stop()
    mid_epochs = store.epochs()
    assert len(mid_epochs) < 6

    s2 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=1, warehouse=duck)
    q2 = s2.run_continuous(processing_time="1 second")
    try:
        _wait_drained(store, q2, 6)
    finally:
        q2.stop()

    epochs = store.epochs()
    assert epochs == list(range(1, len(epochs) + 1))
    assert len(epochs) > len(mid_epochs)
    assert duck.committed_epochs() == epochs  # ledger mirrors manifests 1:1
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in duck.read().select("conv_id", "turn_idx", "text").collect()
    )
    assert got == sorted(tuple(r) for r in oracle(stream_dir))


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SOAK"),
    reason="soak is opt-in (SPARK_GRAFT_SOAK=1); BENCH/ carries the 10-min artifact",
)
def test_continuous_soak_two_minutes(spark, tmpdir_path):
    """Marker-gated soak (r4 verdict #7): live feeder + continuous
    trigger + concurrent pipeline_health sampling for 2 minutes; the
    epoch chain must stay contiguous and gap-free and the final state
    must equal batch LWW over everything fed. Drain-aware (no fixed
    wall-clock deadline on the apply side)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from soak_continuous import run_soak

    out = run_soak(
        spark, tmpdir_path, minutes=2.0, events_per_file=5_000,
        feed_interval=4.0, sample_every=20.0,
    )
    assert out["epoch_chain_contiguous"]
    assert out["lsn_ranges_gap_free"]
    assert out["final_state_matches_batch_lww"]
    assert out["health_all_counts_consistent"]
    assert out["epochs"] >= 5
